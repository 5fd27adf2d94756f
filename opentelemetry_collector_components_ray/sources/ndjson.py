"""NDJSON transcript source — the intake v2 stream decoder analogue.

The reference's flagship receiver decodes Elastic APM intake v2 NDJSON:
first line = stream metadata, every further line type-sniffed and
decoded; per-stream metadata is folded into every event; malformed
lines accumulate per-event errors instead of failing the stream
(receiver/elasticapmintakereceiver/internal/ndjsondecoder/
stream.go:97,117-119,146-258,236-243,907; metadata fold-in
metadata.go:36).

Ray-Data re-expression: one FILE = one stream (the batch boundary the
reference forms from 512 KiB flushes), read via
``read_binary_files(include_paths=True)``; each file is JSON-decoded in
one vectorized ``pyarrow.json.read_json`` call — the "type sniff" falls
out of which top-level key is non-null per line.  Metadata columns are
folded into every turn row; undecodable/unknown lines become DEDICATED
ERROR ROWS (``decode_error`` set, transcript fields blank/null) — so a
stream whose lines are ALL malformed still surfaces its errors, never
an exception and never a silent drop (the round-1 advice finding:
errors previously rode on valid rows and vanished with them).

File format (see tests/test_ndjson.py for a golden fixture):
  {"metadata": {"session": "s-1", "agent": "cli"}}
  {"turn": {"conv_id": "c1", "turn_idx": 0, "role": "user",
            "text": "...", "tool": "", "ts": "2024-01-01T00:00:00"}}
  ...
"""

from __future__ import annotations

import io
import json
from typing import List

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

TRANSCRIPT_COLS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "session", "agent", "shadow",
]
ERROR_COLS = ["decode_error", "error_line", "src_path"]


def decode_stream(data: bytes, path: str = "") -> pa.Table:
    """Decode one NDJSON stream (file) into transcript rows plus
    dedicated error rows (one per malformed line; transcript fields
    blank/null, ``decode_error``/``error_line`` set)."""
    import pyarrow.json as pajson

    lines = [ln for ln in data.split(b"\n") if ln.strip()]
    meta = {"session": "", "agent": ""}
    rows: List[dict] = []
    errors: List[tuple] = []  # (line_no, reason)

    if not lines:
        return _to_table([], meta, path)

    # line 1 must be metadata (stream.go:117-119)
    try:
        first = json.loads(lines[0])
        if "metadata" in first:
            m = first["metadata"] or {}
            meta["session"] = str(m.get("session", ""))
            meta["agent"] = str(m.get("agent", ""))
            body = lines[1:]
            offset = 2
        else:
            errors.append((1, "missing metadata line"))
            body = lines
            offset = 1
    except json.JSONDecodeError:
        errors.append((1, "invalid json in metadata line"))
        body = lines[1:]
        offset = 2

    if body:
        # vectorized decode of the event lines; fall back to per-line
        # when the whole block is unparseable
        try:
            tbl = pajson.read_json(io.BytesIO(b"\n".join(body)))
            turn_col = (
                tbl["turn"] if "turn" in tbl.column_names else None
            )
            for i in range(len(tbl)):
                turn = turn_col[i].as_py() if turn_col is not None else None
                if turn is None:
                    # type sniff failed: some other/unknown key
                    errors.append((offset + i, "unknown event type"))
                    continue
                rows.append(turn)
        except pa.ArrowInvalid:
            for i, ln in enumerate(body):
                try:
                    obj = json.loads(ln)
                except json.JSONDecodeError:
                    errors.append((offset + i, "invalid json"))
                    continue
                if "turn" in obj and obj["turn"] is not None:
                    rows.append(obj["turn"])
                else:
                    errors.append((offset + i, "unknown event type"))

    return _to_table(rows, meta, path, errors)


def _ts_array(values) -> pa.Array:
    """ISO strings or datetime objects (pyarrow.json infers timestamps)
    → timestamp[us]."""
    if not values:
        return pa.array([], pa.timestamp("us"))
    arr = pa.array(values)
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.timestamp("us"))
    return pa.compute.cast(
        arr.cast(pa.string()), pa.timestamp("us")
    )


def _to_table(rows, meta, path, errors=()) -> pa.Table:
    n = len(rows)
    ne = len(errors)
    conv = [r.get("conv_id", "") for r in rows]
    tidx = [r.get("turn_idx") for r in rows]
    role = [r.get("role", "") for r in rows]
    text = [r.get("text", "") for r in rows]
    tool = [r.get("tool", "") for r in rows]
    ts = [r.get("ts") for r in rows]
    # global-label shadow routing (ndjsondecoder routeTarget
    # stream.go:304, flushBatch :688): an event overriding a
    # stream-global key is flagged and carries its override, so the
    # router can split it into a per-override "shadow" sink
    session = [
        str(r["session"]) if r.get("session") not in (None, "")
        else meta["session"]
        for r in rows
    ]
    shadow = [
        r.get("session") not in (None, "")
        and str(r["session"]) != meta["session"]
        for r in rows
    ]
    return pa.table(
        {
            "conv_id": pa.array(conv + [""] * ne, pa.string()),
            "turn_idx": pa.array(tidx + [None] * ne, pa.int32()),
            "role": pa.array(role + [""] * ne, pa.string()),
            "text": pa.array(text + [""] * ne, pa.string()),
            "tool": pa.array(tool + [""] * ne, pa.string()),
            "ts": pa.concat_arrays(
                [_ts_array(ts), pa.nulls(ne, pa.timestamp("us"))]
            ),
            "session": pa.array(
                session + [meta["session"]] * ne, pa.string()
            ),
            "agent": pa.array([meta["agent"]] * (n + ne), pa.string()),
            "shadow": pa.array(shadow + [False] * ne, pa.bool_()),
            "decode_error": pa.array(
                [None] * n + [why for _, why in errors], pa.string()
            ),
            "error_line": pa.array(
                [None] * n + [ln for ln, _ in errors], pa.int32()
            ),
            "src_path": pa.array([path] * (n + ne), pa.string()),
        }
    )


def _empty_table() -> pa.Table:
    return _to_table([], {"session": "", "agent": ""}, "")


def read_ndjson_transcripts(paths, include_errors: bool = False) -> rd.Dataset:
    """Dataset of transcript rows (+ session/agent metadata columns)
    from NDJSON stream files.

    ``include_errors=False`` (default) yields only valid turn rows with
    the error columns dropped — the shape the parse stage consumes.
    ``include_errors=True`` keeps error rows and the
    ``decode_error``/``error_line`` columns so a pipeline can split
    them to an error sink (see :func:`read_ndjson_errors`)."""
    files = rd.read_binary_files(paths, include_paths=True)

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = [
            decode_stream(
                batch["bytes"][i].as_py(), batch["path"][i].as_py()
            )
            for i in range(batch.num_rows)
        ]
        if not tables:
            return _empty_table()
        # zero-row tables (empty files) concat fine — same schema; do
        # NOT filter them out (a fully-corrupt file's table is all
        # error rows and must survive)
        return pa.concat_tables(tables)

    decoded = files.map_batches(decode_batch, batch_format="pyarrow")
    if include_errors:
        return decoded

    def only_turns(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["decode_error"])).drop_columns(
            ERROR_COLS
        )

    return decoded.map_batches(only_turns, batch_format="pyarrow")


def read_ndjson_errors(paths) -> rd.Dataset:
    """Just the decode-error rows: (src_path, error_line, decode_error,
    session, agent) — the parallel error table the intake contract
    promises ('malformed lines become error rows, never an
    exception')."""
    decoded = read_ndjson_transcripts(paths, include_errors=True)

    def only_errors(t: pa.Table) -> pa.Table:
        err = t.filter(pc.is_valid(t["decode_error"]))
        return err.select(
            ["src_path", "error_line", "decode_error", "session", "agent"]
        )

    return decoded.map_batches(only_errors, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Multi-event-type intake decode (round-3 parity item).
#
# The reference type-sniffs each line by its FIRST json key and
# dispatches to five typed decoders — transaction / span / error / log
# / metricset (ndjsondecoder/stream.go:159-258; sniff :907-922 reads
# the first quoted string after '{').  Here each type decodes to typed
# columns folded into one UNION schema (a row per event, nulls where a
# field doesn't apply; metricset samples explode one row per sample,
# mirroring appendMetricEvent).  Unknown types and malformed lines
# become dedicated error rows — same contract as decode_stream.
# ---------------------------------------------------------------------------

INTAKE_TYPES = ("transaction", "span", "error", "log", "metricset")

MULTI_COLS = [
    "event_type", "event_id", "trace_id", "parent_id", "name",
    "subtype", "duration_ms", "result", "outcome", "message",
    "severity", "metric_name", "metric_value", "ts", "session", "agent",
]


def detect_event_type(line: bytes) -> str:
    """stream.go:907-922: the first '"'-delimited string after the
    first '{' — independent of json validity."""
    start = line.find(b"{")
    if start < 0:
        return ""
    i = line.find(b'"', start + 1)
    if i < 0:
        return ""
    end = line.find(b'"', i + 1)
    if end < 0:
        return ""
    return line[i + 1 : end].decode("utf-8", "replace")


def _multi_row(etype: str, ev: dict) -> List[dict]:
    """One typed event dict → union-schema row dicts (metricset may
    yield one per sample)."""
    base = dict.fromkeys(MULTI_COLS[:-2])  # session/agent added later
    base["event_type"] = etype
    ts = ev.get("timestamp")
    base["ts"] = int(ts) if ts is not None else None
    if etype == "transaction":
        base.update(
            event_id=ev.get("id"), trace_id=ev.get("trace_id"),
            name=ev.get("name"), subtype=ev.get("type"),
            duration_ms=ev.get("duration"), result=ev.get("result"),
            outcome=ev.get("outcome"),
        )
    elif etype == "span":
        base.update(
            event_id=ev.get("id"), trace_id=ev.get("trace_id"),
            parent_id=ev.get("parent_id"), name=ev.get("name"),
            subtype=ev.get("type"), duration_ms=ev.get("duration"),
            outcome=ev.get("outcome"),
        )
    elif etype == "error":
        base.update(
            event_id=ev.get("id"), trace_id=ev.get("trace_id"),
            name=ev.get("culprit"), message=ev.get("message"),
        )
    elif etype == "log":
        base.update(
            message=ev.get("message"), severity=ev.get("level"),
        )
    elif etype == "metricset":
        samples = ev.get("samples") or {}
        out = []
        for mname in sorted(samples):
            row = dict(base)
            sval = samples[mname] or {}
            row.update(metric_name=mname, metric_value=sval.get("value"))
            out.append(row)
        return out
    return [base]


def decode_stream_multi(data: bytes, path: str = "") -> pa.Table:
    """Decode one multi-type intake NDJSON stream into the union
    schema + dedicated error rows."""
    lines = [ln for ln in data.split(b"\n") if ln.strip()]
    meta = {"session": "", "agent": ""}
    rows: List[dict] = []
    errors: List[tuple] = []

    if lines:
        try:
            first = json.loads(lines[0])
            if "metadata" in first:
                m = first["metadata"] or {}
                meta["session"] = str(m.get("session", ""))
                meta["agent"] = str(m.get("agent", ""))
                body, offset = lines[1:], 2
            else:
                errors.append((1, "missing metadata line"))
                body, offset = lines, 1
        except json.JSONDecodeError:
            errors.append((1, "invalid json in metadata line"))
            body, offset = lines[1:], 2
    else:
        body, offset = [], 1

    for i, ln in enumerate(body):
        etype = detect_event_type(ln)
        if etype not in INTAKE_TYPES:
            errors.append((offset + i, f"unknown event type {etype!r}"))
            continue
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            errors.append((offset + i, "invalid json"))
            continue
        ev = obj.get(etype)
        if not isinstance(ev, dict):
            errors.append((offset + i, f"empty {etype} body"))
            continue
        rows.extend(_multi_row(etype, ev))

    return _multi_table(rows, meta, path, errors)


def _multi_table(rows, meta, path, errors=()) -> pa.Table:
    n, ne = len(rows), len(errors)

    def col(name, typ):
        vals = [r.get(name) for r in rows] + [None] * ne
        return pa.array(vals, typ)

    ts_vals = [r.get("ts") for r in rows] + [None] * ne
    cols = {
        "event_type": pa.array(
            [r["event_type"] for r in rows] + [""] * ne, pa.string()
        ),
        "event_id": col("event_id", pa.string()),
        "trace_id": col("trace_id", pa.string()),
        "parent_id": col("parent_id", pa.string()),
        "name": col("name", pa.string()),
        "subtype": col("subtype", pa.string()),
        "duration_ms": col("duration_ms", pa.float64()),
        "result": col("result", pa.string()),
        "outcome": col("outcome", pa.string()),
        "message": col("message", pa.string()),
        "severity": col("severity", pa.string()),
        "metric_name": col("metric_name", pa.string()),
        "metric_value": col("metric_value", pa.float64()),
        "ts": pa.array(ts_vals, pa.int64()).cast(pa.timestamp("us")),
        "session": pa.array([meta["session"]] * (n + ne), pa.string()),
        "agent": pa.array([meta["agent"]] * (n + ne), pa.string()),
        "decode_error": pa.array(
            [None] * n + [why for _, why in errors], pa.string()
        ),
        "error_line": pa.array(
            [None] * n + [ln for ln, _ in errors], pa.int32()
        ),
        "src_path": pa.array([path] * (n + ne), pa.string()),
    }
    return pa.table(cols)


def read_ndjson_multi(paths, include_errors: bool = False) -> rd.Dataset:
    """Dataset over multi-type intake NDJSON stream files — the
    five-decoder union analogue of :func:`read_ndjson_transcripts`."""
    files = rd.read_binary_files(paths, include_paths=True)

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = [
            decode_stream_multi(
                batch["bytes"][i].as_py(), batch["path"][i].as_py()
            )
            for i in range(batch.num_rows)
        ]
        if not tables:
            return _multi_table([], {"session": "", "agent": ""}, "")
        return pa.concat_tables(tables)

    decoded = files.map_batches(decode_batch, batch_format="pyarrow")
    if include_errors:
        return decoded

    def only_events(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["decode_error"])).drop_columns(
            ERROR_COLS
        )

    return decoded.map_batches(only_events, batch_format="pyarrow")
