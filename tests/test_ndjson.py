"""NDJSON stream source: golden decode, metadata fold-in, error rows."""

import json

import pytest

from opentelemetry_collector_components_ray.sources.ndjson import (
    decode_stream,
    read_ndjson_transcripts,
)

GOLDEN = b"""\
{"metadata": {"session": "s-1", "agent": "cli"}}
{"turn": {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "GET /x status=200 latency_ms=5", "tool": "", "ts": "2024-01-01T00:00:00"}}
{"turn": {"conv_id": "c1", "turn_idx": 1, "role": "tool", "text": "tool=sql status=504 latency_ms=9 error: code_1", "tool": "sql", "ts": "2024-01-01T00:00:01"}}
"""


def test_decode_golden():
    t = decode_stream(GOLDEN)
    assert t.num_rows == 2
    d = t.to_pydict()
    assert d["conv_id"] == ["c1", "c1"]
    assert d["turn_idx"] == [0, 1]
    assert d["role"] == ["user", "tool"]
    # metadata folded into every row (metadata.go:36 analogue)
    assert d["session"] == ["s-1", "s-1"]
    assert d["agent"] == ["cli", "cli"]
    assert d["decode_errors"] == ["[]", "[]"]
    assert str(t["ts"][0].as_py()) == "2024-01-01 00:00:00"


def test_unknown_event_type_becomes_error_not_exception():
    data = GOLDEN + b'{"bogus": {"x": 1}}\n'
    t = decode_stream(data, path="p1")
    assert t.num_rows == 2  # bogus line dropped, not raised
    errs = json.loads(t["decode_errors"][0].as_py())
    assert errs == [{"line": 4, "reason": "unknown event type", "path": "p1"}]


def test_invalid_json_line():
    data = GOLDEN + b"not json at all\n"
    t = decode_stream(data)
    errs = json.loads(t["decode_errors"][0].as_py())
    assert any("json" in e["reason"] or "unknown" in e["reason"] for e in errs)
    assert t.num_rows == 2


def test_missing_metadata_line():
    data = b'{"turn": {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "t", "tool": "", "ts": "2024-01-01T00:00:00"}}\n'
    t = decode_stream(data)
    assert t.num_rows == 1
    errs = json.loads(t["decode_errors"][0].as_py())
    assert errs[0]["reason"] == "missing metadata line"
    assert t["session"][0].as_py() == ""


def test_shadow_routing_on_metadata_override():
    """Per-event metadata overrides flag the row for shadow routing
    (ndjsondecoder routeTarget stream.go:304, flushBatch :688)."""
    data = GOLDEN + (
        b'{"turn": {"conv_id": "c1", "turn_idx": 2, "role": "user", '
        b'"text": "t", "tool": "", "ts": "2024-01-01T00:00:02", '
        b'"session": "s-override"}}\n'
    )
    t = decode_stream(data)
    d = t.to_pydict()
    assert d["shadow"] == [False, False, True]
    assert d["session"] == ["s-1", "s-1", "s-override"]


def test_read_ndjson_dataset_and_parse_compose(ray_session, tmp_path):
    """NDJSON source feeds the normal parse stage unchanged."""
    from opentelemetry_collector_components_ray.stages.parse import parse_stage

    for i in range(3):
        (tmp_path / f"stream-{i}.ndjson").write_bytes(
            GOLDEN.replace(b"c1", f"c{i}".encode())
        )
    ds = read_ndjson_transcripts(str(tmp_path))
    out = parse_stage(ds).to_pandas().sort_values(["conv_id", "turn_idx"])
    assert len(out) == 6
    assert out.status.tolist() == [200, 504] * 3
    assert set(out.session) == {"s-1"}
