"""Join primitives vs a pandas/DuckDB reference."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.functions import join as J


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(1)
    left = pd.DataFrame(
        {
            "k": [f"k{i}" for i in rng.randint(0, 300, 2000)],
            "x": rng.randint(0, 100, 2000).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": [f"k{i}" for i in range(0, 400, 2)],
            "y": np.arange(0, 400, 2).astype("int64"),
        }
    )
    return left, right, rd.from_pandas(left).repartition(5), rd.from_pandas(
        right
    ).repartition(3)


def _norm(df):
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def test_broadcast_join(sides):
    left, right, lds, _ = sides
    got = _norm(J.broadcast_join(lds, right, on="k", how="left").to_pandas())
    want = _norm(left.merge(right, on="k", how="left"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_inner(sides):
    left, right, lds, rds = sides
    got = _norm(
        J.hash_join(lds, rds, on="k", how="inner", num_partitions=8)
        .to_pandas()[["k", "x", "y"]]
    )
    want = _norm(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_inner(sides):
    left, right, lds, rds = sides
    got = _norm(J.bucket_join(lds, rds, on="k").to_pandas()[["k", "x", "y"]])
    want = _norm(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_left(sides):
    left, right, lds, rds = sides
    got = _norm(
        J.bucket_join(lds, rds, on="k", how="left").to_pandas()[
            ["k", "x", "y"]
        ]
    )
    want = _norm(left.merge(right, on="k", how="left"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
