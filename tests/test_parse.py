"""Parse stage vs oracle + unit behavior on crafted rows."""

import pyarrow as pa

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages.parse import (
    PARSED_SQL,
    parse_batch,
    parse_stage,
)


def test_parse_matches_oracle(ray_session, sf_dir, oracle, cte_prefix):
    from opentelemetry_collector_components_ray.sources import read_transcripts

    got = parse_stage(read_transcripts(sf_dir)).to_pandas()
    want = oracle.execute(f"{cte_prefix} SELECT * FROM parsed").df()
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def _mini(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": ["c"] * n,
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": ["user"] * n,
            "text": texts,
            "tool": [""] * n,
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )


def test_parse_extracts_fields():
    t = parse_batch(
        _mini(
            [
                "GET /api/item/5 status=200 latency_ms=12",
                "tool=sql status=504 latency_ms=9 error: code_3",
                "free text no tokens at all",
            ]
        )
    )
    d = t.to_pydict()
    assert d["method"] == ["GET", None, None]
    assert d["path"] == ["/api/item/5", None, None]
    assert d["status"] == [200, 504, None]
    assert d["latency_ms"] == [12, 9, None]
    assert d["tool_name"] == [None, "sql", None]
    assert d["err_code"] == [None, "code_3", None]
    assert d["parse_ok"] == [True, True, False]


def test_weight_pvalue_parse():
    # tracestate p-value analogue (span.go:1005-1033): p=k ⇒ weight 2^k
    t = parse_batch(
        _mini(
            [
                "GET /x status=200 latency_ms=1 p=3",
                "GET /x status=200 latency_ms=1",
            ]
        )
    )
    assert t["weight"].to_pylist() == [8.0, 1.0]


def test_parse_miss_is_not_an_error():
    # parse-miss rows flow through with null derived cols (the analogue
    # of per-event error accumulation, stream.go:236-243)
    t = parse_batch(_mini(["???", ""]))
    assert t.num_rows == 2
    assert t["parse_ok"].to_pylist() == [False, False]
