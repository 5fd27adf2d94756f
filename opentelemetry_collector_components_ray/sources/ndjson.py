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
folded into every turn row; undecodable/unknown lines become error
rows with ``decode_error`` set (never an exception).

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
import ray.data as rd


def decode_stream(data: bytes, path: str = "") -> pa.Table:
    """Decode one NDJSON stream (file) into transcript rows +
    fold-in metadata columns + per-line error rows."""
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
    err_rows = [
        {"line": ln, "reason": why, "path": path} for ln, why in errors
    ]
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(tidx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": _ts_array(ts),
            "session": pa.array(session, pa.string()),
            "agent": pa.array([meta["agent"]] * n, pa.string()),
            "shadow": pa.array(shadow, pa.bool_()),
            "decode_errors": pa.array(
                [json.dumps(err_rows)] * n if n else [], pa.string()
            ),
        }
    )


def read_ndjson_transcripts(paths) -> rd.Dataset:
    """Dataset of transcript rows (+ session/agent metadata columns)
    from NDJSON stream files."""
    files = rd.read_binary_files(paths, include_paths=True)

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = []
        for i in range(batch.num_rows):
            data = batch["bytes"][i].as_py()
            path = batch["path"][i].as_py()
            tables.append(decode_stream(data, path))
        tables = [t for t in tables if t.num_rows] or tables[:1]
        return pa.concat_tables(tables)

    return files.map_batches(decode_batch, batch_format="pyarrow")
