"""Cardinality-based routing (dynamic routing connector decision rule)."""

import pandas as pd
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages.route import (
    CardinalityRouterConfig,
    cardinality_route,
    cardinality_route_sql,
)


def test_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = cardinality_route(enriched_ds).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {cardinality_route_sql()}"
    ).df()
    assert_frames_equal(got, want, ["conv_id"])


def test_first_threshold_wins(ray_session):
    import pyarrow as pa
    import ray.data as rd

    # conv a: 1 combo; conv b: 3 combos; conv c: 7 combos
    rows = []
    rows += [("a", "user", "")] * 3
    rows += [("b", "user", ""), ("b", "tool", "sql"), ("b", "tool", "maps")]
    rows += [("c", "tool", t) for t in "t1 t2 t3 t4 t5 t6 t7".split()]
    t = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "role": [r[1] for r in rows],
            "tool": [r[2] for r in rows],
        }
    )
    out = (
        cardinality_route(rd.from_arrow(t))
        .to_pandas()
        .set_index("conv_id")
    )
    assert out.loc["a", "sink"] == "low_card" and out.loc["a", "combo_card"] == 1
    assert out.loc["b", "sink"] == "mid_card" and out.loc["b", "combo_card"] == 3
    assert out.loc["c", "sink"] == "high_card" and out.loc["c", "combo_card"] == 7


def test_config_validation():
    with pytest.raises(ValueError):  # catch-all missing
        CardinalityRouterConfig(rules=((2, "a"), (6, "b")))
    with pytest.raises(ValueError):  # thresholds not ascending
        CardinalityRouterConfig(rules=((6, "a"), (2, "b"), (None, "c")))
    with pytest.raises(ValueError):  # duplicate sinks
        CardinalityRouterConfig(rules=((2, "a"), (None, "a")))


def test_distributed_finish_equals_coalesced(enriched_ds):
    dist = (
        cardinality_route(enriched_ds, distributed=True, num_buckets=7)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    coal = (
        cardinality_route(enriched_ds, distributed=False)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, coal)
