"""NDJSON stream source: golden decode, metadata fold-in, error rows."""

import pytest

from opentelemetry_collector_components_ray.sources.ndjson import (
    decode_stream,
    read_ndjson_errors,
    read_ndjson_transcripts,
)

GOLDEN = b"""\
{"metadata": {"session": "s-1", "agent": "cli"}}
{"turn": {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "GET /x status=200 latency_ms=5", "tool": "", "ts": "2024-01-01T00:00:00"}}
{"turn": {"conv_id": "c1", "turn_idx": 1, "role": "tool", "text": "tool=sql status=504 latency_ms=9 error: code_1", "tool": "sql", "ts": "2024-01-01T00:00:01"}}
"""


def _turns(t):
    import pyarrow.compute as pc

    return t.filter(pc.is_null(t["decode_error"]))


def _errors(t):
    import pyarrow.compute as pc

    return t.filter(pc.is_valid(t["decode_error"]))


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
    assert d["decode_error"] == [None, None]
    assert str(t["ts"][0].as_py()) == "2024-01-01 00:00:00"


def test_unknown_event_type_becomes_error_row_not_exception():
    data = GOLDEN + b'{"bogus": {"x": 1}}\n'
    t = decode_stream(data, path="p1")
    assert _turns(t).num_rows == 2
    err = _errors(t).to_pydict()
    assert err["decode_error"] == ["unknown event type"]
    assert err["error_line"] == [4]
    assert err["src_path"] == ["p1"]
    # error rows still carry the stream metadata
    assert err["session"] == ["s-1"]


def test_invalid_json_line():
    data = GOLDEN + b"not json at all\n"
    t = decode_stream(data)
    err = _errors(t).to_pydict()
    assert len(err["decode_error"]) == 1
    assert (
        "json" in err["decode_error"][0]
        or "unknown" in err["decode_error"][0]
    )
    assert _turns(t).num_rows == 2


def test_missing_metadata_line():
    data = b'{"turn": {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "t", "tool": "", "ts": "2024-01-01T00:00:00"}}\n'
    t = decode_stream(data)
    assert _turns(t).num_rows == 1
    err = _errors(t).to_pydict()
    assert err["decode_error"] == ["missing metadata line"]
    assert t["session"][0].as_py() == ""


def test_fully_corrupt_stream_yields_error_rows():
    """A stream with NO valid turns still surfaces every line error —
    the round-1 advice finding (errors used to ride on valid rows and
    vanish when there were none)."""
    data = b'{"metadata": {"session": "s-9", "agent": "cli"}}\nnot json\n{"bogus": 1}\n'
    t = decode_stream(data, path="corrupt.ndjson")
    assert _turns(t).num_rows == 0
    err = _errors(t).to_pydict()
    assert len(err["decode_error"]) == 2
    assert err["error_line"] == [2, 3]
    assert err["session"] == ["s-9", "s-9"]


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
    """NDJSON source feeds the normal parse stage unchanged; a
    fully-corrupt file contributes zero turns but its errors appear in
    the parallel error table."""
    from opentelemetry_collector_components_ray.stages.parse import parse_stage

    for i in range(3):
        (tmp_path / f"stream-{i}.ndjson").write_bytes(
            GOLDEN.replace(b"c1", f"c{i}".encode())
        )
    (tmp_path / "stream-bad.ndjson").write_bytes(
        b'{"metadata": {"session": "sx", "agent": "cli"}}\ngarbage\n'
    )
    ds = read_ndjson_transcripts(str(tmp_path))
    out = parse_stage(ds).to_pandas().sort_values(["conv_id", "turn_idx"])
    assert len(out) == 6
    assert out.status.tolist() == [200, 504] * 3
    assert set(out.session) == {"s-1"}

    errs = read_ndjson_errors(str(tmp_path)).to_pandas()
    assert len(errs) == 1
    assert errs.src_path.iloc[0].endswith("stream-bad.ndjson")
    assert errs.session.iloc[0] == "sx"
