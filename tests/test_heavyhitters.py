"""Misra-Gries heavy hitters: exactness at sufficient capacity, the
W/(capacity+1) guarantee under compression, merge-tree invariance, and
the Dataset op end to end."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.functions.sketches import (
    MisraGries,
)


def _counts_of(stream):
    vals, cnts = np.unique(np.asarray(stream, dtype=object),
                           return_counts=True)
    return dict(zip(vals, cnts))


def test_exact_when_capacity_sufficient():
    stream = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    mg = MisraGries(capacity=8)
    v, c = np.unique(np.array(stream, dtype=object), return_counts=True)
    mg.update(v, c)
    items, lo, hi = mg.result()
    assert list(items) == ["a", "b", "c"]
    assert lo.tolist() == [50, 30, 20]
    assert (lo == hi).all() and mg.dec == 0


def test_guarantee_under_compression():
    rng = np.random.RandomState(0)
    # zipf-ish stream, 500 distinct keys, capacity 20
    stream = [f"k{int(z)}" for z in rng.zipf(1.3, size=20000) % 500]
    true = _counts_of(stream)
    W = len(stream)
    cap = 20
    mg = MisraGries(cap)
    # feed in chunks like batches would
    for chunk in np.array_split(np.array(stream, dtype=object), 13):
        v, c = np.unique(chunk, return_counts=True)
        mg.update(v, c)
    items, lo, hi = mg.result()
    for it, l, h in zip(items, lo, hi):
        t = true[it]
        assert l <= t <= h
        assert t - l <= W / (cap + 1)
    # every key the summary dropped must be ignorable
    reported = set(items)
    for it, t in true.items():
        if it not in reported:
            assert t <= W / (cap + 1)


def test_merge_tree_invariance():
    rng = np.random.RandomState(1)
    stream = [f"k{int(z) % 60}" for z in rng.zipf(1.5, size=5000)]
    chunks = np.array_split(np.array(stream, dtype=object), 8)

    def summarize(chunk):
        mg = MisraGries(12)
        v, c = np.unique(chunk, return_counts=True)
        return mg.update(v, c)

    # left-fold merge
    fold = summarize(chunks[0])
    for ch in chunks[1:]:
        fold.merge(summarize(ch))
    # balanced binary merge
    level = [summarize(ch) for ch in chunks]
    while len(level) > 1:
        level = [
            level[i].merge(level[i + 1]) for i in range(0, len(level), 2)
        ]
    bal = level[0]
    true = _counts_of(stream)
    W = len(stream)
    for mg in (fold, bal):
        items, lo, hi = mg.result()
        for it, l, h in zip(items, lo, hi):
            assert l <= true[it] <= h
            assert true[it] - l <= W / 13


def test_heavy_hitters_dataset_exact(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.aggregate import (
        heavy_hitters,
    )

    rng = np.random.RandomState(2)
    tools = np.array(["alpha", "beta", "gamma", "delta"], dtype=object)
    vals = tools[rng.choice(4, p=[0.5, 0.3, 0.15, 0.05], size=9000)]
    ds = rd.from_pandas(pd.DataFrame({"tool": vals})).repartition(6)
    out = heavy_hitters(ds, "tool", capacity=16, k=3).to_pandas()
    true = pd.Series(vals).value_counts()
    assert out["tool"].tolist() == list(true.index[:3])
    assert out.count_min.tolist() == true.iloc[:3].tolist()
    assert (out.count_min == out.count_max).all()
    assert out["rank"].tolist() == [1, 2, 3]


def test_heavy_hitters_dataset_compressed_still_finds_top(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.aggregate import (
        heavy_hitters,
    )

    rng = np.random.RandomState(3)
    # one dominant key among 2000 rare ones; capacity far below distinct
    vals = np.array(
        ["hot"] * 5000 + [f"cold{i}" for i in rng.randint(0, 2000, 5000)],
        dtype=object,
    )
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"tool": vals})).repartition(8)
    out = heavy_hitters(ds, "tool", capacity=32, k=1).to_pandas()
    assert out["tool"].tolist() == ["hot"]
    assert out.count_min[0] <= 5000 <= out.count_max[0]
