"""Golden tests for the multi-event-type intake NDJSON decoder
(reference ndjsondecoder/stream.go:159-258 type dispatch, :907-922
first-key sniff; error-row contract per the round-1 advice finding)."""

import pyarrow as pa

from opentelemetry_collector_components_ray.sources.ndjson import (
    decode_stream_multi,
    detect_event_type,
)

GOLDEN = b"""\
{"metadata": {"session": "s-7", "agent": "apm-agent"}}
{"transaction": {"id": "0000002a", "trace_id": "00000000000003e9", "name": "GET /api", "type": "request", "duration": 12.5, "result": "HTTP 2xx", "outcome": "success", "timestamp": 1700000000000000}}
{"span": {"id": "000000ff", "trace_id": "00000000000003e9", "parent_id": "0000002a", "name": "SELECT", "type": "db", "duration": 3.25, "outcome": "success", "timestamp": 1700000000100000}}
{"error": {"id": "deadbeef", "trace_id": "00000000000003e9", "culprit": "handler", "message": "boom", "timestamp": 1700000000200000}}
{"log": {"message": "hello world", "level": "warning", "timestamp": 1700000000300000}}
{"metricset": {"samples": {"a.count": {"value": 2.0}, "b.sum": {"value": 7.5}}, "timestamp": 1700000000400000}}
{"unknown_kind": {"x": 1}}
this is not json
{"transaction": null}
"""


def test_detect_event_type_first_key_sniff():
    assert detect_event_type(b'{"transaction": {...') == "transaction"
    assert detect_event_type(b'  {  "span": 1}') == "span"
    assert detect_event_type(b"no brace") == ""
    assert detect_event_type(b'{no quote}') == ""
    # sniff reads the first quoted string even from invalid json
    assert detect_event_type(b'{"error" oops') == "error"


def test_decode_stream_multi_golden():
    t = decode_stream_multi(GOLDEN, "golden.ndjson")
    df = t.to_pandas()
    ok = df[df["decode_error"].isna()]
    errs = df[df["decode_error"].notna()]

    # metricset explodes one row per sample (sorted by name)
    assert list(ok["event_type"]) == [
        "transaction", "span", "error", "log", "metricset", "metricset",
    ]
    # metadata folded into every row
    assert set(df["session"]) == {"s-7"} and set(df["agent"]) == {"apm-agent"}

    tx = ok.iloc[0]
    assert tx["event_id"] == "0000002a" and tx["result"] == "HTTP 2xx"
    assert tx["duration_ms"] == 12.5 and tx["outcome"] == "success"
    assert tx["ts"] == pa.scalar(
        1700000000000000, pa.timestamp("us")
    ).as_py()

    sp = ok.iloc[1]
    assert sp["parent_id"] == "0000002a" and sp["subtype"] == "db"

    er = ok.iloc[2]
    assert er["name"] == "handler" and er["message"] == "boom"

    lg = ok.iloc[3]
    assert lg["severity"] == "warning" and lg["message"] == "hello world"

    ms = ok.iloc[4:6]
    assert list(ms["metric_name"]) == ["a.count", "b.sum"]
    assert list(ms["metric_value"]) == [2.0, 7.5]

    # three malformed lines -> three dedicated error rows with line nos
    assert len(errs) == 3
    by_line = dict(zip(errs["error_line"], errs["decode_error"]))
    assert "unknown event type" in by_line[7]
    assert by_line[8].startswith("unknown event type")  # sniff fails -> ''
    assert by_line[9] == "empty transaction body"


def test_decode_stream_multi_missing_metadata():
    t = decode_stream_multi(
        b'{"log": {"message": "m", "timestamp": 1}}\n', "x"
    )
    df = t.to_pandas()
    errs = df[df["decode_error"].notna()]
    assert len(errs) == 1 and errs.iloc[0]["error_line"] == 1
    ok = df[df["decode_error"].isna()]
    assert len(ok) == 1 and ok.iloc[0]["session"] == ""
