"""Canonical Arrow schemas for every stage boundary.

The reference's data model is dynamic (``pcommon.Map`` attributes,
internal/elasticattr/attributes.go); ours is a fixed columnar schema per
stage — derived columns are declared, not open-ended (SURVEY.md §1.2).

Input shape is the north-rule ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input
# ---------------------------------------------------------------------------

TRANSCRIPT = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = ("user", "assistant", "system", "tool")

# ---------------------------------------------------------------------------
# Parse stage output (appended to TRANSCRIPT)
#
# Analogue of the intake NDJSON field extraction — per-line type sniff +
# typed field decode, unknown lines become per-event errors rather than
# failures (reference receiver/elasticapmintakereceiver/internal/
# ndjsondecoder/stream.go:146-258, 236-243, 907).
# ---------------------------------------------------------------------------

PARSED_COLUMNS = pa.schema(
    [
        ("method", pa.string()),       # GET/POST, null when absent
        ("path", pa.string()),         # /api/..., null when absent
        ("status", pa.int32()),        # null when absent
        ("latency_ms", pa.int32()),    # null when absent
        ("tool_name", pa.string()),    # tool=<w> token from text, null when absent
        ("err_code", pa.string()),     # 'error: <code>' token, null when absent
        ("weight", pa.float64()),      # sampling weight 2^p from 'p=<k>', 1.0 default
        ("parse_ok", pa.bool_()),      # any token matched (parse-miss flag)
    ]
)

# ---------------------------------------------------------------------------
# Enrich stage output (appended to PARSED)
#
# Analogue of elasticapmprocessor span/resource enrichment:
# outcome ladder span.go:521-547, transaction.result span.go:489-514,
# sanitize regex resource.go:297-307, lookup enrich
# processor/elasticmetadataprocessor/README.md:13-21.
# ---------------------------------------------------------------------------

ENRICHED_COLUMNS = pa.schema(
    [
        ("event_outcome", pa.string()),   # success | failure | unknown
        ("result_class", pa.string()),    # 'HTTP 2xx' … | 'unknown'
        ("duration_us", pa.int64()),      # latency_ms * 1000, null when absent
        ("service_name", pa.string()),    # sanitized role:tool composite
        ("error_id", pa.string()),        # md5(conv:turn) for failures, null else
        ("tool_category", pa.string()),   # lookup via tool catalog, '' when no tool
        ("is_external", pa.bool_()),
        ("role_group", pa.string()),      # lookup via role map
        ("agent_name", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Route stage output: one appended column
# (first-match-wins, mirroring connector/dynamicroutingconnector/
# router.go:334-356 with default sink router.go:299-306)
# ---------------------------------------------------------------------------

SINKS = ("errors", "tools", "http", "general")

# ---------------------------------------------------------------------------
# Aggregate stage output (signaltometrics/lsminterval-style)
# ---------------------------------------------------------------------------

AGG_SERVICE_SUMMARY = pa.schema(
    [
        ("interval", pa.string()),          # '1h' | '24h' (metricset.interval-style)
        ("window_start", pa.timestamp("us")),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("turn_count", pa.int64()),
        ("failure_count", pa.int64()),
        ("latency_sum", pa.int64()),
        ("latency_min", pa.int32()),
        ("latency_max", pa.int32()),
    ]
)


def append_columns(base: pa.Schema, extra: pa.Schema) -> pa.Schema:
    fields = list(base) + list(extra)
    return pa.schema(fields)


PARSED = append_columns(TRANSCRIPT, PARSED_COLUMNS)
ENRICHED = append_columns(PARSED, ENRICHED_COLUMNS)
