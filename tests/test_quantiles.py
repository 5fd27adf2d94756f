"""KLL/MRL quantile sketch: exact regime, rank-error bound under
compression, merge-shape robustness, serialization, and the windowed
Dataset op against exact percentiles."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.functions.quantiles import (
    KLLSketch,
)


def _exact_disc(vals, p):
    """smallest v with cumulative count >= p*n (the sketch's and the
    SQL twin's shared definition)."""
    v = np.sort(np.asarray(vals, dtype=np.float64))
    cum = np.arange(1, len(v) + 1)
    return v[np.searchsorted(cum, p * len(v), side="left")]


def test_exact_regime():
    rng = np.random.RandomState(0)
    vals = rng.exponential(100, size=3000)
    sk = KLLSketch(capacity=4096).update(vals)
    assert sk.exact
    got = sk.quantiles([0.5, 0.95, 0.99])
    for g, p in zip(got, [0.5, 0.95, 0.99]):
        assert g == _exact_disc(vals, p)
    assert sk.n == 3000
    assert sk.vmin == vals.min() and sk.vmax == vals.max()
    assert np.isclose(sk.vsum, vals.sum())


def test_rank_error_bound_under_compression():
    rng = np.random.RandomState(1)
    vals = rng.lognormal(3, 1, size=200_000)
    cap = 256
    sk = KLLSketch(capacity=cap)
    for chunk in np.array_split(vals, 40):
        sk.update(chunk)
    assert not sk.exact
    srt = np.sort(vals)
    for p in (0.1, 0.5, 0.9, 0.99):
        q = sk.quantiles([p])[0]
        true_rank = np.searchsorted(srt, q, side="right")
        # MRL-style deterministic bound ~ W*L/cap; assert a 4% margin
        assert abs(true_rank - p * len(vals)) < 0.04 * len(vals), p


def test_merge_shapes_agree_within_bound():
    rng = np.random.RandomState(2)
    vals = rng.normal(0, 1, size=50_000)
    chunks = np.array_split(vals, 16)

    def mk(ch):
        return KLLSketch(capacity=128).update(ch)

    fold = mk(chunks[0])
    for ch in chunks[1:]:
        fold.merge(mk(ch))
    level = [mk(ch) for ch in chunks]
    while len(level) > 1:
        level = [
            level[i].merge(level[i + 1]) for i in range(0, len(level), 2)
        ]
    bal = level[0]
    srt = np.sort(vals)
    for sk in (fold, bal):
        assert sk.n == len(vals)
        for p in (0.25, 0.5, 0.75):
            q = sk.quantiles([p])[0]
            rank = np.searchsorted(srt, q, side="right")
            assert abs(rank - p * len(vals)) < 0.06 * len(vals)


def test_serialization_roundtrip():
    sk = KLLSketch(capacity=64).update(np.arange(1000, dtype=float))
    rt = KLLSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n and rt.vsum == sk.vsum
    assert (rt.quantiles([0.5, 0.9]) == sk.quantiles([0.5, 0.9])).all()
    assert [len(a) for a in rt.levels] == [len(a) for a in sk.levels]


def test_nan_values_skipped():
    sk = KLLSketch(capacity=64).update(
        np.array([1.0, np.nan, 3.0, np.nan])
    )
    assert sk.n == 2 and sk.vmax == 3.0


def test_windowed_sketch_op_exact(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.aggregate import (
        latency_quantiles_sketch,
    )

    rng = np.random.RandomState(4)
    n = 4000
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                rng.randint(0, 3 * 86_400, n), unit="s"
            ).astype("datetime64[us]"),
            "role": rng.choice(["user", "assistant"], n),
            "latency_ms": np.where(
                rng.rand(n) < 0.1, np.nan, rng.exponential(200, n)
            ),
        }
    )
    out = (
        latency_quantiles_sketch(
            rd.from_pandas(df).repartition(5), "24h", capacity=65536
        )
        .to_pandas()
        .sort_values(["window_start", "role"])
        .reset_index(drop=True)
    )
    sub = df[df.latency_ms.notna()].copy()
    sub["window_start"] = sub.ts.dt.floor("24h")
    for _, row in out.iterrows():
        g = sub[
            (sub.window_start == row.window_start)
            & (sub.role == row.role)
        ].latency_ms.to_numpy()
        assert row["count"] == len(g)
        assert row.p50 == round(_exact_disc(g, 0.5), 6)
        assert row.p99 == round(_exact_disc(g, 0.99), 6)
        assert row.hmin == g.min() and row.hmax == g.max()
