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
