"""Bloom filter: no false negatives ever, bounded false positives at
the design point, OR-mergeability, and exactness of the prefiltered
filter-join even when false positives are forced."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.functions.bloom import (
    BloomFilter,
    _size_for,
    bloom_prefilter,
    build_bloom,
)
from opentelemetry_collector_components_ray.functions.sketches import hash64


def _fresh(n_keys, bits_per_key=10):
    m, k = _size_for(n_keys, bits_per_key)
    return BloomFilter(np.zeros(m // 8, dtype=np.uint8), m, k)


def test_no_false_negatives_and_low_fpr():
    keys = np.array([f"key-{i}" for i in range(5000)], dtype=object)
    bf = _fresh(len(keys))
    bf.add_hashes(hash64(keys))
    assert bf.contains(keys).all()  # never a false negative
    absent = np.array([f"other-{i}" for i in range(20000)], dtype=object)
    fpr = bf.contains(absent).mean()
    assert fpr < 0.03  # 10 bits/key designs for ~1%


def test_or_merge_equals_single_build():
    a = np.array([f"a{i}" for i in range(300)], dtype=object)
    b = np.array([f"b{i}" for i in range(300)], dtype=object)
    m, k = _size_for(600, 10)
    one = BloomFilter(np.zeros(m // 8, dtype=np.uint8), m, k)
    one.add_hashes(hash64(np.concatenate([a, b])))
    fa = BloomFilter(np.zeros(m // 8, dtype=np.uint8), m, k)
    fb = BloomFilter(np.zeros(m // 8, dtype=np.uint8), m, k)
    fa.add_hashes(hash64(a))
    fb.add_hashes(hash64(b))
    assert ((fa.bits | fb.bits) == one.bits).all()


def test_build_bloom_dataset_matches_local(ray_session):
    import ray.data as rd

    keys = pd.DataFrame({"k": [f"key-{i}" for i in range(2000)]})
    ds = rd.from_pandas(keys).repartition(7)
    bf = build_bloom(ds, "k")
    local = BloomFilter(
        np.zeros(bf.m_bits // 8, dtype=np.uint8), bf.m_bits, bf.k
    )
    local.add_hashes(hash64(keys["k"].to_numpy(dtype=object)))
    assert (bf.bits == local.bits).all()


def test_int_keys_supported(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"k": np.arange(1000, dtype=np.int64)}))
    bf = build_bloom(ds, "k")
    assert bf.contains(np.arange(1000, dtype=np.int64)).all()
    fpr = bf.contains(np.arange(10_000, 40_000, dtype=np.int64)).mean()
    assert fpr < 0.03


@pytest.mark.parametrize("mode", ["semi", "anti"])
@pytest.mark.parametrize("bits_per_key", [10, 1])  # 1 bit/key forces FPs
def test_bloom_filter_join_exact(ray_session, mode, bits_per_key):
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        filter_join,
    )

    rng = np.random.RandomState(3)
    left = rd.from_pandas(
        pd.DataFrame({"k": rng.randint(0, 500, 3000), "v": np.arange(3000)})
    ).repartition(5)
    right = rd.from_pandas(
        pd.DataFrame({"k": rng.randint(250, 750, 400)})
    ).repartition(3)
    exact = filter_join(left, right, on="k", mode=mode).to_pandas()
    bloomed = filter_join(
        left, right, on="k", mode=mode,
        prefilter="bloom", bloom_bits_per_key=bits_per_key,
    ).to_pandas()
    assert sorted(bloomed.v.tolist()) == sorted(exact.v.tolist())


def test_prefilter_actually_prunes(ray_session):
    """The definite-miss path must drop rows BEFORE the verify: with
    disjoint key ranges, the candidate set is (almost) empty."""
    import ray.data as rd

    left = rd.from_pandas(
        pd.DataFrame({"k": [f"l{i}" for i in range(4000)]})
    )
    right = rd.from_pandas(
        pd.DataFrame({"k": [f"r{i}" for i in range(200)]})
    )
    bf = build_bloom(right, "k")
    cand = bloom_prefilter(left, bf, "k", keep_hits=True).count()
    assert cand < 4000 * 0.05  # ~1% FPR design point, margin 5×
