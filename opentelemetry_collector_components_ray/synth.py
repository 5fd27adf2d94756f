"""Deterministic transcript synthesis.

The engine's primary input is a Parquet table of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` (north-rule input_hint).
The sandbox test data has no such table, so we derive one
DETERMINISTICALLY from the driver-generated ``events`` table with a
single SQL expression, :data:`TRANSCRIPTS_SQL`.

That SQL is the single source of truth shared by BOTH sides of the
correctness gate:

- :func:`materialize_transcripts` runs it in DuckDB over
  ``{sf_dir}/events.parquet`` and caches the result as Parquet (the Ray
  pipelines read this file);
- ``__ray_entry__.oracle_sql`` prefixes the exact same text as a
  ``WITH transcripts AS (...)`` CTE over the driver's ``events`` view.

So Ray results and oracle results are computed over byte-identical
input at any scale factor, with zero float/seed drift.

The generated text embeds parseable tokens (status=, latency_ms=,
GET/POST url, tool=, error:) so the parse stage has real regex work —
the analogue of intake NDJSON type-sniff + field decode (reference
receiver/elasticapmintakereceiver/internal/ndjsondecoder/
stream.go:146-258, 907); ``signup`` rows match no template and exercise
the parse-miss path (stream.go:236-243).
"""

from __future__ import annotations

import os
import tempfile

TOOLS = (
    "search",
    "calculator",
    "browser",
    "python",
    "sql",
    "shell",
    "email",
    "calendar",
    "weather",
    "maps",
    "translate",
    "files",
)

_TOOL_ARRAY_SQL = "[" + ", ".join(f"'{t}'" for t in TOOLS) + "]"

# Derivation of the transcript table from `events`.  `{events}` is the
# relation to read from: the literal view name `events` for the oracle, a
# read_parquet(...) call for local materialization.
#
# - conversation = user; turn order = (ts, event_id) within user (total,
#   deterministic — event_id is unique)
# - role: event_type -> {system,user,assistant,tool}
# - tool: 12-entry vocabulary keyed on event_id for tool turns, '' else
# - text: templated bodies embedding parseable tokens; signup rows are
#   deliberate parse misses
TRANSCRIPTS_SQL_TEMPLATE = """
SELECT
  conv_id,
  turn_idx,
  role,
  CASE etype
    WHEN 'view' THEN 'GET /api/item/' || CAST(eid % 97 AS VARCHAR)
         || ' status=' || CAST(status AS VARCHAR)
         || ' latency_ms=' || CAST(lat AS VARCHAR)
    WHEN 'click' THEN 'POST /api/cart/' || CAST(eid % 31 AS VARCHAR)
         || ' status=' || CAST(status AS VARCHAR)
         || ' latency_ms=' || CAST(lat AS VARCHAR)
    WHEN 'purchase' THEN 'tool=' || tool
         || ' status=' || CAST(status AS VARCHAR)
         || ' latency_ms=' || CAST(lat AS VARCHAR) || ' result=ok'
    WHEN 'error' THEN 'tool=' || tool
         || ' status=' || CAST(status AS VARCHAR)
         || ' latency_ms=' || CAST(lat AS VARCHAR)
         || ' error: code_' || CAST(eid % 7 AS VARCHAR)
    ELSE 'signup welcome user ' || CAST(uid AS VARCHAR)
  END AS text,
  tool,
  ts
FROM (
  SELECT
    'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS INTEGER) AS turn_idx,
    CASE event_type
      WHEN 'signup' THEN 'system'
      WHEN 'view' THEN 'user'
      WHEN 'click' THEN 'assistant'
      ELSE 'tool'
    END AS role,
    CASE WHEN event_type IN ('purchase', 'error')
         THEN ({tool_array})[(event_id % 12) + 1]
         ELSE ''
    END AS tool,
    CASE WHEN event_type = 'error' THEN 500 + (event_id % 12)
         WHEN event_id % 10 = 0 THEN 404
         ELSE 200
    END AS status,
    CAST((event_id * 37) % 5000 AS INTEGER) AS lat,
    event_id AS eid,
    user_id AS uid,
    event_type AS etype,
    ts
  FROM {events}
) base
""".replace("{tool_array}", _TOOL_ARRAY_SQL)

# Exact text used by the oracle, reading from the pre-registered view.
TRANSCRIPTS_SQL = TRANSCRIPTS_SQL_TEMPLATE.replace("{events}", "events")


def cache_dir() -> str:
    d = os.environ.get("GRAFT_CACHE_DIR", "/tmp/occr_cache")
    os.makedirs(d, exist_ok=True)
    return d


def transcripts_path(sf_dir: str) -> str:
    """Path of the cached transcript parquet derived from ``sf_dir``."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(cache_dir(), f"transcripts_{tag}.parquet")


def materialize_transcripts(sf_dir: str, force: bool = False) -> str:
    """Derive + cache the transcripts parquet for an sf dir (idempotent).

    Runs :data:`TRANSCRIPTS_SQL_TEMPLATE` in DuckDB over
    ``{sf_dir}/events.parquet``, sorted by (conv_id, turn_idx) so the file
    has the stable ordering the per-turn invariant assumes.  Atomic
    write-temp-then-rename so concurrent callers are safe.
    """
    import duckdb

    out = transcripts_path(sf_dir)
    events = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(out) and not force:
        if os.path.getmtime(out) >= os.path.getmtime(events):
            return out
    sql = TRANSCRIPTS_SQL_TEMPLATE.replace(
        "{events}", f"read_parquet('{events}')"
    )
    con = duckdb.connect()
    try:
        fd, tmp = tempfile.mkstemp(
            suffix=".parquet", dir=os.path.dirname(out)
        )
        os.close(fd)
        con.execute(
            f"COPY (SELECT * FROM ({sql}) ORDER BY conv_id, turn_idx) "
            f"TO '{tmp}' (FORMAT PARQUET)"
        )
        os.replace(tmp, out)
    finally:
        con.close()
    return out


def scaled_transcripts_path(sf_dir: str, repeat: int) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(cache_dir(), f"transcripts_{tag}_x{repeat}")


def materialize_scaled_transcripts(
    sf_dir: str, repeat: int, force: bool = False, chunks: int = 2
) -> str:
    """Bench-scale variant: replicate every conversation ``repeat`` times
    (``conv_id || '-r<k>'``), deterministic, written as ``repeat × chunks``
    parquet files so reads parallelize well past the core count (a
    20-file input caps a 32-CPU run at 20 fused read→transform tasks).
    Used only for throughput runs — correctness uses the 1x table."""
    import duckdb

    import shutil

    out_dir = scaled_transcripts_path(sf_dir, repeat)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done) and not force:
        with open(done) as f:
            if f.read().strip() == f"{repeat}x{chunks}":
                return out_dir
    base = materialize_transcripts(sf_dir)
    # regenerating (new layout or force): never leave stale part files
    # from a previous layout behind
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE TEMP TABLE base AS SELECT * FROM read_parquet('{base}')"
        )
        for k in range(repeat):
            for c in range(chunks):
                part = os.path.join(
                    out_dir, f"part-{k:05d}-{c:03d}.parquet"
                )
                tmp = part + ".tmp"
                con.execute(
                    f"COPY (SELECT conv_id || '-r{k}' AS conv_id, turn_idx, "
                    f"role, text, tool, ts FROM base "
                    f"WHERE hash(conv_id) % {chunks} = {c}) "
                    f"TO '{tmp}' (FORMAT PARQUET)"
                )
                os.replace(tmp, part)
        with open(done, "w") as f:
            f.write(f"{repeat}x{chunks}")
    finally:
        con.close()
    return out_dir


def materialize_skewed_transcripts(
    sf_dir: str, repeat: int, hot_every: int = 10, force: bool = False,
    chunks: int = 2,
) -> str:
    """Skew-stress variant of :func:`materialize_scaled_transcripts`:
    a deterministic 1/``hot_every`` of ALL rows are relabeled to the
    single conversation ``conv-hot`` (the reference's cardinality
    overflow concern, merger/limits/tracker.go:68-84) — at the default
    this makes one conv_id hold 10% of the corpus.  Row count, text,
    ts and every other column are identical to the scaled input, so a
    skewed-vs-unskewed bench pair isolates the key-distribution
    effect."""
    import duckdb
    import shutil

    out_dir = scaled_transcripts_path(sf_dir, repeat) + f"_hot{hot_every}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done) and not force:
        with open(done) as f:
            if f.read().strip() == f"{repeat}x{chunks}":
                return out_dir
    base = materialize_transcripts(sf_dir)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE TEMP TABLE base AS SELECT * FROM read_parquet('{base}')"
        )
        for k in range(repeat):
            for c in range(chunks):
                part = os.path.join(
                    out_dir, f"part-{k:05d}-{c:03d}.parquet"
                )
                tmp = part + ".tmp"
                con.execute(
                    f"COPY (SELECT CASE WHEN "
                    f"hash(conv_id || '#' || turn_idx || '#' || {k}) "
                    f"% {hot_every} = 0 THEN 'conv-hot' "
                    f"ELSE conv_id || '-r{k}' END AS conv_id, turn_idx, "
                    f"role, text, tool, ts FROM base "
                    f"WHERE hash(conv_id) % {chunks} = {c}) "
                    f"TO '{tmp}' (FORMAT PARQUET)"
                )
                os.replace(tmp, part)
        with open(done, "w") as f:
            f.write(f"{repeat}x{chunks}")
    finally:
        con.close()
    return out_dir


# ---------------------------------------------------------------------------
# Multi-event-type intake NDJSON synthesis (round-3 ndjson parity item).
# Deterministic event → intake-v2-style line mapping so the decoded
# union table has an exact SQL twin over the events view:
#   click    → transaction   view  → span      error → error
#   signup   → log           purchase → metricset
# Streams are chunks of LINES_PER_STREAM events in event_id order, each
# with a metadata first line {"session": "s-<chunk>", "agent": "loadgen"}.
# ---------------------------------------------------------------------------

INTAKE_LINES_PER_STREAM = 2500
INTAKE_AGENT = "loadgen"


def _intake_line(event_id, ts_us, user_id, event_type, value, k) -> str:
    import json as _json

    eid = f"{event_id:08x}"
    tid = f"{user_id * 1000000 + event_id:016x}"
    fail = event_id % 10 == 0
    if event_type == "click":
        ev = {
            "id": eid, "trace_id": tid, "name": f"click-{k}",
            "type": "request", "duration": value,
            "result": "HTTP 5xx" if fail else "HTTP 2xx",
            "outcome": "failure" if fail else "success",
            "timestamp": ts_us,
        }
        return _json.dumps({"transaction": ev})
    if event_type == "view":
        ev = {
            "id": eid, "trace_id": tid, "parent_id": f"{user_id:08x}",
            "name": f"view-{k}", "type": "db", "duration": value,
            "outcome": "failure" if fail else "success",
            "timestamp": ts_us,
        }
        return _json.dumps({"span": ev})
    if event_type == "error":
        ev = {
            "id": eid, "trace_id": tid, "culprit": f"handler-{k}",
            "message": f"error user {user_id}", "timestamp": ts_us,
        }
        return _json.dumps({"error": ev})
    if event_type == "signup":
        ev = {
            "message": f"signup user {user_id}",
            "level": ("debug", "info", "warning", "error")[event_id % 4],
            "timestamp": ts_us,
        }
        return _json.dumps({"log": ev})
    # purchase → metricset
    ev = {
        "samples": {"purchase.value": {"value": value}},
        "timestamp": ts_us,
    }
    return _json.dumps({"metricset": ev})


def materialize_intake_ndjson(sf_dir: str, force: bool = False) -> str:
    """Write (once, cached) the multi-type intake NDJSON streams derived
    from ``sf_dir``/events.parquet; returns the stream directory."""
    import json as _json

    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(cache_dir(), f"intake_ndjson_{tag}")
    done = os.path.join(out_dir, "_DONE")
    # version-stamped marker: a format change invalidates old caches
    stamp = f"v1-{INTAKE_LINES_PER_STREAM}"
    if os.path.exists(done) and not force:
        with open(done) as f:
            if f.read().strip() == stamp:
                return out_dir
    t = pq.read_table(
        sf_dir + "/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).sort_by("event_id")
    os.makedirs(out_dir, exist_ok=True)
    eids = t["event_id"].to_pylist()
    ts_us = t["ts"].cast("int64").to_pylist()
    uids = t["user_id"].to_pylist()
    types = t["event_type"].to_pylist()
    vals = t["value"].to_pylist()
    ks = [_json.loads(p)["k"] for p in t["props"].to_pylist()]
    n = len(eids)
    per = INTAKE_LINES_PER_STREAM
    for chunk in range((n + per - 1) // per):
        lines = [
            _json.dumps(
                {"metadata": {"session": f"s-{chunk}",
                              "agent": INTAKE_AGENT}}
            )
        ]
        for i in range(chunk * per, min((chunk + 1) * per, n)):
            lines.append(
                _intake_line(
                    eids[i], ts_us[i], uids[i], types[i], vals[i], ks[i]
                )
            )
        tmp = os.path.join(out_dir, f".stream-{chunk:05d}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, os.path.join(out_dir, f"stream-{chunk:05d}.ndjson"))
    with open(done, "w") as f:
        f.write(stamp)
    return out_dir


INTAKE_MULTI_SQL = f"""
SELECT * FROM (
  SELECT 'transaction' AS event_type,
         printf('%08x', event_id) AS event_id,
         printf('%016x', user_id * 1000000 + event_id) AS trace_id,
         CAST(NULL AS VARCHAR) AS parent_id,
         'click-' || json_extract_string(props, '$.k') AS name,
         'request' AS subtype, value AS duration_ms,
         CASE WHEN event_id % 10 = 0 THEN 'HTTP 5xx'
              ELSE 'HTTP 2xx' END AS result,
         CASE WHEN event_id % 10 = 0 THEN 'failure'
              ELSE 'success' END AS outcome,
         CAST(NULL AS VARCHAR) AS message,
         CAST(NULL AS VARCHAR) AS severity,
         CAST(NULL AS VARCHAR) AS metric_name,
         CAST(NULL AS DOUBLE) AS metric_value, ts,
         's-' || CAST(event_id // {INTAKE_LINES_PER_STREAM} AS VARCHAR)
           AS session,
         '{INTAKE_AGENT}' AS agent
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'span', printf('%08x', event_id),
         printf('%016x', user_id * 1000000 + event_id),
         printf('%08x', user_id),
         'view-' || json_extract_string(props, '$.k'),
         'db', value, NULL,
         CASE WHEN event_id % 10 = 0 THEN 'failure' ELSE 'success' END,
         NULL, NULL, NULL, CAST(NULL AS DOUBLE), ts,
         's-' || CAST(event_id // {INTAKE_LINES_PER_STREAM} AS VARCHAR),
         '{INTAKE_AGENT}'
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT 'error', printf('%08x', event_id),
         printf('%016x', user_id * 1000000 + event_id),
         NULL, 'handler-' || json_extract_string(props, '$.k'),
         NULL, CAST(NULL AS DOUBLE), NULL, NULL,
         'error user ' || CAST(user_id AS VARCHAR),
         NULL, NULL, CAST(NULL AS DOUBLE), ts,
         's-' || CAST(event_id // {INTAKE_LINES_PER_STREAM} AS VARCHAR),
         '{INTAKE_AGENT}'
  FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT 'log', NULL, NULL, NULL, NULL, NULL, CAST(NULL AS DOUBLE),
         NULL, NULL,
         'signup user ' || CAST(user_id AS VARCHAR),
         CASE event_id % 4 WHEN 0 THEN 'debug' WHEN 1 THEN 'info'
              WHEN 2 THEN 'warning' ELSE 'error' END,
         NULL, CAST(NULL AS DOUBLE), ts,
         's-' || CAST(event_id // {INTAKE_LINES_PER_STREAM} AS VARCHAR),
         '{INTAKE_AGENT}'
  FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT 'metricset', NULL, NULL, NULL, NULL, NULL,
         CAST(NULL AS DOUBLE), NULL, NULL, NULL, NULL,
         'purchase.value', value, ts,
         's-' || CAST(event_id // {INTAKE_LINES_PER_STREAM} AS VARCHAR),
         '{INTAKE_AGENT}'
  FROM events WHERE event_type = 'purchase'
)
"""


# --------------------------------------------------------------------------
# deterministic random documents (substring-dedup bench corpus)

_DOC_VOCAB = (
    "key agg row scan slow fast table value part hash "
    "merge batch spark line sort window frame join group filter"
).split()


def synth_random_documents(n_docs: int, num_blocks: int = 64):
    """Deterministic hash-derived random documents — genuinely diverse
    texts (each word is ``splitmix64(doc_id << 20 ^ pos) % |vocab|``),
    so cross-doc k-gram duplication is birthday-rare and planted
    passages dominate the duplicated-gram set.  A linear-congruential
    formula is NOT enough here: ``(a + b*pos) % V`` collapses to ≤V²
    distinct texts and makes every window duplicated (measured — it
    turns the substring-dedup bench into its worst case)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .functions.sketches import _splitmix64

    vocab = np.array(_DOC_VOCAB)

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        n_words = 24 + (ids % 13)
        doc_of = np.repeat(np.arange(len(ids)), n_words)
        total = int(n_words.sum())
        pos = np.arange(total) - np.repeat(
            np.cumsum(n_words) - n_words, n_words
        )
        h = _splitmix64(
            (ids[doc_of].astype(np.uint64) << np.uint64(20))
            ^ pos.astype(np.uint64)
        )
        w = vocab[(h % np.uint64(len(vocab))).astype(np.int64)]
        offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(n_words, out=offs[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(w)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "text": pc.binary_join(lists, " "),
            }
        )

    return rd.range(n_docs, override_num_blocks=num_blocks).map_batches(
        make, batch_format="pyarrow", batch_size=None
    )
