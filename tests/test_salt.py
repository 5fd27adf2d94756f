"""Salted two-phase aggregation equals unsalted on skewed data."""

import numpy as np
import pandas as pd

from opentelemetry_collector_components_ray.functions.salt import (
    salted_groupby_agg,
)


def test_salted_equals_unsalted_on_zipf_keys(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    rng = np.random.RandomState(0)
    # Zipf: one huge key, many tiny ones
    keys = ["hot"] * 50_000 + [f"k{i}" for i in rng.randint(0, 200, 5_000)]
    df = pd.DataFrame(
        {"k": keys, "v": rng.randint(0, 1000, len(keys)).astype("int64")}
    )
    ds = rd.from_pandas(df).repartition(8)

    salted = (
        salted_groupby_agg(ds, ["k"], [("v", "v", "sum")], salt=16)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    plain = (
        df.groupby("k", as_index=False)["v"].sum().sort_values("k")
        .reset_index(drop=True)
    )
    assert salted.k.tolist() == plain.k.tolist()
    assert salted.v.tolist() == plain.v.tolist()


def test_salted_min_max(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a"] * 1000 + ["b"], "v": list(range(1000)) + [7]})
    ds = rd.from_pandas(df).repartition(4)
    out = (
        salted_groupby_agg(
            ds, ["k"], [("v_min", "v", "min"), ("v_max", "v", "max")],
            salt=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.v_min.tolist() == [0, 7]
    assert out.v_max.tolist() == [999, 7]
