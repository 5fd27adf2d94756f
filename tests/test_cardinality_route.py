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


def test_hll_route_matches_exact_at_low_cardinality(enriched_ds):
    """At combo cardinalities ≪ 1/HLL-error the estimate is exact
    (linear counting), so decisions equal the exact path."""
    from opentelemetry_collector_components_ray.stages.route import (
        cardinality_route_hll,
    )

    exact = (
        cardinality_route(enriched_ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    hll = (
        cardinality_route_hll(enriched_ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # register collisions make the estimate ±1 even in the
    # linear-counting range; decisions may only differ for keys whose
    # exact count sits adjacent to a threshold
    diff = (exact.combo_card - hll.combo_card).abs()
    assert (diff <= 1).all()
    disagree = exact.sink != hll.sink
    thresholds = {2, 6}
    for _, row in exact[disagree].iterrows():
        assert any(abs(row.combo_card - t) <= 1 for t in thresholds)


def test_hll_route_estimate_accuracy_large_keyspace(ray_session):
    """A key with 50k distinct combos: estimate within ±2%."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.route import (
        CardinalityRouterConfig,
        cardinality_route_hll,
    )

    n = 50_000
    t = pa.table(
        {
            "conv_id": ["big"] * n,
            "role": [f"r{i}" for i in range(n)],  # all distinct combos
            "tool": ["t"] * n,
        }
    )
    cfg = CardinalityRouterConfig(
        rules=((40_000, "low_card"), (None, "high_card"))
    )
    out = cardinality_route_hll(
        rd.from_arrow(t).repartition(8), cfg
    ).to_pandas()
    assert len(out) == 1
    est = out.combo_card.iloc[0]
    assert abs(est - n) / n < 0.02
    assert out.sink.iloc[0] == "high_card"
