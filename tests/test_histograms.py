"""Histogram merge kernels vs the reference's golden semantics
(lsminterval add.go:70-107 explicit, expo/merge.go + scale.go expo)."""

import numpy as np
import pytest

from opentelemetry_collector_components_ray.functions.histograms import (
    DEFAULT_MAX_EXPO_BUCKETS,
    ExpoHist,
    ExplicitHist,
    bucketize,
    expo_quantile,
)


def test_bucketize_le_semantics():
    # bucket i holds values <= bounds[i]; last bucket = overflow
    counts = bucketize(np.array([10.0, 50.0, 51.0, 5000.0]), [50.0, 250.0])
    assert counts.tolist() == [2, 1, 1]


def test_explicit_merge_same_bounds():
    a = ExplicitHist.from_values(np.array([10.0, 300.0]), [50.0, 250.0])
    b = ExplicitHist.from_values(np.array([40.0, 60.0]), [50.0, 250.0])
    a.merge(b)
    assert a.counts.tolist() == [2, 1, 1]
    assert a.count == 4
    assert a.sum == 410.0
    assert a.min == 10.0 and a.max == 300.0


def test_explicit_merge_bounds_mismatch_resets():
    """add.go:70-107: mismatched bounds ⇒ reset to incoming histogram."""
    a = ExplicitHist.from_values(np.array([10.0]), [50.0])
    b = ExplicitHist.from_values(np.array([1.0, 2.0]), [5.0, 10.0])
    a.merge(b)
    assert a.bounds == (5.0, 10.0)
    assert a.counts.tolist() == b.counts.tolist()
    assert a.count == 2


def test_expo_from_values_roundtrip():
    vals = np.array([1.0, 2.0, 4.0, 100.0])
    h = ExpoHist.from_values(vals, scale=2)
    assert h.count == 4
    assert h.sum == pytest.approx(107.0)
    assert h.counts.sum() == 4  # all positive values bucketed


def test_expo_downscale_preserves_total():
    vals = np.exp(np.linspace(0, 8, 100))
    h = ExpoHist.from_values(vals, scale=6)
    total = h.counts.sum()
    h.downscale(2)
    assert h.scale == 2
    assert h.counts.sum() == total


def test_expo_merge_aligns_scales_and_counts():
    a = ExpoHist.from_values(np.array([1.0, 2.0, 3.0]), scale=5)
    b = ExpoHist.from_values(np.array([10.0, 20.0]), scale=2)
    a.merge(b)
    assert a.scale == 2  # coarser of the two
    assert a.count == 5
    assert a.counts.sum() == 5


def test_expo_merge_caps_buckets():
    """merged run capped at 160 buckets by further downscaling
    (config/config.go:14-16)."""
    lo = ExpoHist.from_values(np.array([1e-30]), scale=7)
    hi = ExpoHist.from_values(np.array([1e30]), scale=7)
    lo.merge(hi)
    assert lo.counts.size <= DEFAULT_MAX_EXPO_BUCKETS
    assert lo.counts.sum() == 2


def test_expo_merge_commutative():
    rng = np.random.RandomState(0)
    x, y = rng.lognormal(size=50), rng.lognormal(size=70)
    a = ExpoHist.from_values(x, 4).merge(ExpoHist.from_values(y, 4))
    b = ExpoHist.from_values(y, 4).merge(ExpoHist.from_values(x, 4))
    assert a.scale == b.scale and a.offset == b.offset
    assert a.counts.tolist() == b.counts.tolist()
    assert a.count == b.count


def test_expo_negative_buckets_roundtrip():
    """Negative values land in the mirrored negative run; counts and
    sum include them; zero bucket counts only exact zeros
    (expo/merge.go:32 merges Positive() and Negative() alike)."""
    vals = np.array([-8.0, -2.0, -0.5, 0.0, 0.0, 1.0, 4.0])
    h = ExpoHist.from_values(vals, scale=0)
    assert h.count == 7
    assert h.zero_count == 2
    assert int(h.neg_counts.sum()) == 3
    assert int(h.counts.sum()) == 2
    assert h.sum == vals.sum()


def test_expo_negative_merge_and_downscale():
    a = ExpoHist.from_values(np.array([-1.5, -3.0, 2.0]), scale=2)
    b = ExpoHist.from_values(np.array([-64.0, -0.25, 8.0]), scale=4)
    n_before = int(a.neg_counts.sum()) + int(b.neg_counts.sum())
    a.merge(b)
    assert a.scale == 2  # coarser scale wins
    assert int(a.neg_counts.sum()) == n_before
    assert a.count == 6
    # downscaling preserves totals on both runs
    a.downscale(a.scale - 2)
    assert int(a.neg_counts.sum()) == n_before
    assert int(a.counts.sum()) == 2


def test_expo_negative_bucket_cap():
    rng = np.random.RandomState(0)
    vals = -np.exp(rng.uniform(0, 30, size=4000))  # wide negative range
    h = ExpoHist.from_values(vals, scale=4, max_buckets=16)
    assert h.neg_counts.size <= 16
    assert int(h.neg_counts.sum()) == 4000
    other = ExpoHist.from_values(-vals, scale=4, max_buckets=16)
    h.merge(other, max_buckets=16)
    assert h.neg_counts.size <= 16 and h.counts.size <= 16
    assert h.count == 8000


def test_expo_quantile_with_negatives():
    vals = np.concatenate(
        [-np.linspace(1, 100, 50), np.linspace(1, 100, 50)]
    )
    h = ExpoHist.from_values(vals, scale=4)
    p10 = expo_quantile(h, 0.10)
    p50 = expo_quantile(h, 0.50)
    p90 = expo_quantile(h, 0.90)
    assert p10 < 0 < p90
    assert p10 <= p50 <= p90
    # ~one-bucket relative error against exact percentiles
    assert abs(p90 - np.percentile(vals, 90)) / abs(np.percentile(vals, 90)) < 0.1


def test_expo_minmax_merge_parity():
    """add.go:94-97,152-155: min-of-mins / max-of-maxes; an unset side
    (empty histogram, NaN sentinel) defers to the other."""
    import numpy as np

    from opentelemetry_collector_components_ray.functions.histograms import (
        ExpoHist,
    )

    a = ExpoHist.from_values(np.array([4.0, 90.0, 17.0]), scale=4)
    b = ExpoHist.from_values(np.array([2.0, 300.0]), scale=4)
    assert (a.hmin, a.hmax) == (4.0, 90.0)
    a.merge(b)
    assert (a.hmin, a.hmax) == (2.0, 300.0)
    # empty side keeps the set side's min/max
    e = ExpoHist.empty(4)
    assert e.hmin != e.hmin  # NaN = unset
    e.merge(ExpoHist.from_values(np.array([7.0]), scale=4))
    assert (e.hmin, e.hmax) == (7.0, 7.0)


def test_expo_flat_scale_is_batching_independent():
    """The 160-cap's final scale must be a pure function of the merged
    span: merging many small batches equals one from_values over all."""
    import numpy as np

    from opentelemetry_collector_components_ray.functions.histograms import (
        ExpoHist,
    )

    rng = np.random.default_rng(7)
    vals = rng.integers(1, 200_000, 5000).astype(np.float64)
    whole = ExpoHist.from_values(vals, scale=4)
    merged = None
    for chunk in np.array_split(vals, 13):
        h = ExpoHist.from_values(chunk, scale=4)
        merged = h if merged is None else merged.merge(h)
    assert merged.scale == whole.scale
    assert merged.offset == whole.offset
    assert np.array_equal(merged.counts, whole.counts)
    assert (merged.hmin, merged.hmax) == (whole.hmin, whole.hmax)
