"""Parse stage: vectorized field extraction from the ``text`` column.

Ray-Data analogue of the intake v2 NDJSON decoder — per-line type sniff
and typed field decode (reference receiver/elasticapmintakereceiver/
internal/ndjsondecoder/stream.go:146-258, type sniff :907).  Instead of
walking records, we run RE2 kernels (``pyarrow.compute.extract_regex``)
over the whole Arrow string column per batch — zero-copy in, columnar
out.  Rows matching no template get null derived columns and
``parse_ok=false`` rather than raising, mirroring per-event error
accumulation (stream.go:236-243).

Stateless → plain function tasks, no actor pool needed (the regex
objects live inside Arrow's kernel; nothing to amortize).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# RE2 syntax, named groups (required by pc.extract_regex).  These mirror
# the tokens the synthesizer embeds (synth.py) the way the intake decoder
# mirrors the APM intake format.
P_HTTP = r"^(?P<method>GET|POST) (?P<path>\S+)"
P_STATUS = r"status=(?P<status>\d+)"
P_LATENCY = r"latency_ms=(?P<latency_ms>\d+)"
P_TOOL = r"tool=(?P<tool_name>\w+)"
P_ERR = r"error: (?P<err_code>\S+)"
# sampling weight: 'p=<k>' ⇒ the turn represents 2^k original turns —
# the tracestate p-value → AdjustedCount parse (reference
# elasticapmprocessor span.go:1005-1033); absent ⇒ weight 1.0
P_PVALUE = r"\bp=(?P<p>\d+)\b"


def _field(struct_arr: pa.ChunkedArray | pa.Array, name: str) -> pa.Array:
    # extract_regex returns a struct array that is null on non-match;
    # struct_field propagates the null.
    return pc.struct_field(struct_arr, name)


# fused fast path: in practice status and latency_ms appear adjacent
# (every templated event line carries both); one combined scan covers
# them, with per-token fallback only for the rows the fused regex
# missed — semantics identical to two independent extracts
P_STATUS_LAT = (
    r"status=(?P<status>\d+) latency_ms=(?P<latency_ms>\d+)"
)


def _fallback(primary: pa.Array, text, pattern: str, group: str,
              typ) -> pa.Array:
    """Fill primary's nulls by re-extracting `pattern` on just the
    missing rows (cheap when the fast path covers most rows)."""
    miss = pc.is_null(primary)
    n_miss = pc.sum(pc.cast(miss, pa.int64())).as_py() or 0
    if n_miss == 0:
        return primary
    sub = pc.filter(text, miss)
    vals = pc.cast(pc.struct_field(pc.extract_regex(sub, pattern), group),
                   typ)
    # replace_with_mask wants contiguous arrays
    if isinstance(primary, pa.ChunkedArray):
        primary = primary.combine_chunks()
    if isinstance(miss, pa.ChunkedArray):
        miss = miss.combine_chunks()
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    return pc.replace_with_mask(primary, miss, vals)


def parse_batch(batch: pa.Table) -> pa.Table:
    """Append parsed columns (schema.PARSED_COLUMNS) to a transcript batch."""
    text = batch["text"]

    http = pc.extract_regex(text, P_HTTP)
    comb = pc.extract_regex(text, P_STATUS_LAT)
    tool = pc.extract_regex(text, P_TOOL)
    err = pc.extract_regex(text, P_ERR)

    method = _field(http, "method")
    path = _field(http, "path")
    status_i = pc.cast(_field(comb, "status"), pa.int32())
    lat_i = pc.cast(_field(comb, "latency_ms"), pa.int32())
    # rows with only one of the two tokens (or reversed order)
    status_i = _fallback(status_i, text, P_STATUS, "status", pa.int32())
    lat_i = _fallback(lat_i, text, P_LATENCY, "latency_ms", pa.int32())
    tool_name = _field(tool, "tool_name")
    err_code = _field(err, "err_code")

    # adaptive: scan for the rare 'p=' sampling token only when the
    # cheap substring probe says the batch contains one at all
    if pc.sum(
        pc.cast(pc.match_substring(text, "p="), pa.int64())
    ).as_py():
        pv = pc.extract_regex(text, P_PVALUE)
        p_exp = pc.cast(_field(pv, "p"), pa.float64())
        weight = pc.fill_null(pc.power(pa.scalar(2.0), p_exp), 1.0)
    else:
        weight = pa.nulls(batch.num_rows, pa.float64()).fill_null(1.0)

    parse_ok = pc.or_(
        pc.or_(pc.is_valid(method), pc.is_valid(status_i)),
        pc.or_(pc.is_valid(tool_name), pc.is_valid(err_code)),
    )

    return (
        batch.append_column("method", method)
        .append_column("path", path)
        .append_column("status", status_i)
        .append_column("latency_ms", lat_i)
        .append_column("tool_name", tool_name)
        .append_column("err_code", err_code)
        .append_column("weight", weight)
        .append_column("parse_ok", parse_ok)
    )


def parse_stage(ds: rd.Dataset, batch_size: int = 65536) -> rd.Dataset:
    return ds.map_batches(
        parse_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


# SQL fragments for the DuckDB oracle — the same extraction expressed in
# ANSI/DuckDB SQL (regexp_extract returns '' on no match → nullif).
PARSED_SQL_COLUMNS = """
  nullif(regexp_extract(text, '^(GET|POST) (\\S+)', 1), '') AS method,
  nullif(regexp_extract(text, '^(GET|POST) (\\S+)', 2), '') AS path,
  CAST(nullif(regexp_extract(text, 'status=(\\d+)', 1), '') AS INTEGER) AS status,
  CAST(nullif(regexp_extract(text, 'latency_ms=(\\d+)', 1), '') AS INTEGER) AS latency_ms,
  nullif(regexp_extract(text, 'tool=(\\w+)', 1), '') AS tool_name,
  nullif(regexp_extract(text, 'error: (\\S+)', 1), '') AS err_code,
  coalesce(power(2.0, CAST(nullif(
    regexp_extract(text, '\\bp=(\\d+)\\b', 1), '') AS DOUBLE)), 1.0)
    AS weight,
  (regexp_matches(text, '^(GET|POST) ')
   OR regexp_matches(text, 'status=\\d')
   OR regexp_matches(text, 'tool=\\w')
   OR regexp_matches(text, 'error: ')) AS parse_ok
"""

PARSED_SQL = (
    "SELECT conv_id, turn_idx, role, text, tool, ts, "
    + PARSED_SQL_COLUMNS
    + " FROM transcripts"
)
