"""HLL sketch: accuracy (~1% at precision 14), mergeability, determinism."""

import numpy as np

from opentelemetry_collector_components_ray.functions.sketches import (
    HyperLogLog,
    hash64,
)


def test_hash64_deterministic_strings():
    a = hash64(np.array(["a", "b", "a"]))
    b = hash64(np.array(["a", "b", "a"]))
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_hll_accuracy():
    n = 50_000
    h = HyperLogLog()
    h.add(np.arange(n))
    est = h.estimate()
    assert abs(est - n) / n < 0.03


def test_hll_merge_equals_union():
    a = HyperLogLog().add(np.arange(0, 30_000))
    b = HyperLogLog().add(np.arange(20_000, 50_000))
    a.merge(b)
    est = a.estimate()
    assert abs(est - 50_000) / 50_000 < 0.03


def test_hll_small_range_linear_counting():
    h = HyperLogLog().add(np.arange(100))
    assert abs(h.estimate() - 100) < 5


def test_hll_serialization_roundtrip():
    h = HyperLogLog().add(np.arange(1000))
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()
