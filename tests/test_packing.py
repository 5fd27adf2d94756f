"""Ordered prefix-scan and concat-and-chunk packing."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.stages.packing import (
    concat_chunk_packing,
    ordered_prefix_sum,
)


def _ds(ray_session, n=500, seed=0, shuffle=True):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    ids = np.arange(n)
    if shuffle:
        rng.shuffle(ids)
    return rd.from_pandas(
        pd.DataFrame(
            {"doc_id": ids, "n_tokens": rng.randint(0, 50, n)}
        )
    ).repartition(7)


def test_prefix_sum_matches_serial(ray_session):
    ds = _ds(ray_session)
    out = (
        ordered_prefix_sum(ds, "n_tokens", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = np.concatenate(
        [[0], np.cumsum(out.n_tokens.to_numpy())[:-1]]
    )
    assert (out.offset.to_numpy() == expect).all()


def test_prefix_sum_handles_zero_and_single_block(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [3, 1, 2], "n_tokens": [0, 5, 0]})
    )
    out = (
        ordered_prefix_sum(ds, "n_tokens", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.offset.tolist() == [0, 5, 5]


def test_concat_chunk_assignment(ray_session):
    import ray.data as rd

    # stream: doc0=30 tok [0,30), doc1=0 tok at 30, doc2=45 [30,75)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [0, 1, 2], "n_tokens": [30, 0, 45]}
        )
    )
    out = (
        concat_chunk_packing(ds, budget=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.pack_offset.tolist() == [0, 30, 30]
    assert out.pack_first_chunk.tolist() == [0, 0, 0]
    # doc2 spans [30, 74] → chunks 0..2
    assert out.pack_last_chunk.tolist() == [0, 0, 2]
    assert out.pack_n_chunks.tolist() == [1, 1, 3]


def test_chunk_budget_invariants(ray_session):
    ds = _ds(ray_session, n=1000, seed=3)
    budget = 64
    out = (
        concat_chunk_packing(ds, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    total = out.n_tokens.sum()
    # every chunk id in range; tokens per chunk == budget except the tail
    n_chunks = out.pack_last_chunk.max() + 1
    assert n_chunks == -(-total // budget)
    # reconstruct per-chunk token mass from the spans
    mass = np.zeros(n_chunks, dtype=np.int64)
    for _, r in out.iterrows():
        lo, n = int(r.pack_offset), int(r.n_tokens)
        for c in range(int(r.pack_first_chunk), int(r.pack_last_chunk) + 1):
            a = max(lo, c * budget)
            b = min(lo + n, (c + 1) * budget)
            mass[c] += max(0, b - a)
    assert mass[:-1].tolist() == [budget] * (n_chunks - 1)
    assert mass[-1] == total - budget * (n_chunks - 1)


def test_prefix_sum_row_order_invariant(ray_session):
    """The scan result is a function of (order_col, value_col) pairs
    only — input row order and block layout must not matter."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {"doc_id": np.arange(400), "n_tokens": rng.randint(0, 50, 400)}
    )
    perm = df.sample(frac=1, random_state=1).reset_index(drop=True)
    a = (
        ordered_prefix_sum(
            rd.from_pandas(df).repartition(3), "n_tokens", "doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .offset.tolist()
    )
    b = (
        ordered_prefix_sum(
            rd.from_pandas(perm).repartition(9), "n_tokens", "doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .offset.tolist()
    )
    assert a == b
