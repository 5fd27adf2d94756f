"""Histogram merge kernels (the lsminterval merge math, re-vectorized).

Reference semantics reproduced:

- **Explicit-bound histogram delta merge** (internal/data/add.go:70-107):
  element-wise bucket add when bounds are equal, RESET to the incoming
  histogram when bounds mismatch; count/sum add, min=min, max=max.
- **Base-2 exponential histogram merge** (internal/data/add.go:109+,
  internal/data/expo/merge.go:32, scale.go:65-141): align scales by
  downscaling the finer histogram, add overlapping bucket runs, cap the
  merged bucket count (default 160,
  lsmintervalprocessor/config/config.go:14-16) by further downscaling.

Everything here is numpy on dense arrays; per-group state is a plain
dict so these kernels drop into ``map_batches`` combiners and
``map_groups`` reducers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_MAX_EXPO_BUCKETS = 160  # config/config.go:14-16


def bucketize(values: np.ndarray, bounds: Sequence[float]) -> np.ndarray:
    """Counts per explicit-bound bucket: len(bounds)+1 buckets, bucket i
    holds values ≤ bounds[i] (last bucket = overflow), matching OTLP
    explicit-bounds semantics."""
    idx = np.searchsorted(np.asarray(bounds, dtype=np.float64), values,
                          side="left")
    return np.bincount(idx, minlength=len(bounds) + 1).astype(np.int64)


@dataclass
class ExplicitHist:
    """Mergeable explicit-bound histogram (delta temporality)."""

    bounds: Tuple[float, ...]
    counts: np.ndarray
    count: int = 0
    sum: float = 0.0
    min: Optional[float] = None
    max: Optional[float] = None

    @classmethod
    def from_values(
        cls, values: np.ndarray, bounds: Sequence[float]
    ) -> "ExplicitHist":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        h = cls(tuple(bounds), bucketize(values, bounds))
        h.count = int(values.size)
        h.sum = float(values.sum()) if values.size else 0.0
        h.min = float(values.min()) if values.size else None
        h.max = float(values.max()) if values.size else None
        return h

    def merge(self, other: "ExplicitHist") -> "ExplicitHist":
        """add.go:70-107: bounds mismatch ⇒ reset to incoming; else
        element-wise add; min/max/sum merge (dropped-if-absent semantics
        collapse to None-propagation here)."""
        if self.bounds != other.bounds:
            self.bounds = other.bounds
            self.counts = other.counts.copy()
            self.count = other.count
            self.sum = other.sum
            self.min = other.min
            self.max = other.max
            return self
        self.counts = self.counts + other.counts
        self.count += other.count
        self.sum += other.sum
        if other.min is not None:
            self.min = other.min if self.min is None else min(self.min, other.min)
        if other.max is not None:
            self.max = other.max if self.max is None else max(self.max, other.max)
        return self


# ---------------------------------------------------------------------------
# Exponential (base-2) histograms
# ---------------------------------------------------------------------------


def _bucket_indices(mags: np.ndarray, scale: int) -> np.ndarray:
    """index = ceil(log_base(|v|)) - 1 = ceil(log2(|v|) * 2^scale) - 1."""
    return np.ceil(np.log2(mags) * (1 << scale)).astype(np.int64) - 1


def _run_from_indices(idx: np.ndarray) -> Tuple[int, np.ndarray]:
    lo, hi = int(idx.min()), int(idx.max())
    return lo, np.bincount(idx - lo, minlength=hi - lo + 1).astype(np.int64)


def _downscale_run(
    offset: int, counts: np.ndarray, d: int
) -> Tuple[int, np.ndarray]:
    """scale.go:65-141: merge 2^d adjacent buckets; run boundaries
    re-aligned by flooring the offset into the coarser grid."""
    if d == 0 or counts.size == 0:
        return offset, counts
    idx = (offset + np.arange(counts.size)) >> d
    lo, hi = int(idx.min()), int(idx.max())
    out = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(out, idx - lo, counts)
    return lo, out


@dataclass
class ExpoHist:
    """Base-2 exponential histogram (scale + positive AND negative
    bucket runs + zero count), the shape pmetric uses for
    ExponentialHistogram datapoints.  Positive bucket i covers
    (base^(offset+i), base^(offset+i+1)] with base = 2^(2^-scale);
    negative bucket i covers the mirrored range for -|v| (the reference
    merges Positive() and Negative() runs identically,
    expo/merge.go:32, scale.go:65-141)."""

    scale: int
    offset: int
    counts: np.ndarray  # int64 run (positive range)
    count: int = 0
    sum: float = 0.0
    zero_count: int = 0
    neg_offset: int = 0
    neg_counts: np.ndarray = field(
        default_factory=lambda: np.zeros(0, dtype=np.int64)
    )
    # min/max merge parity (internal/data/add.go:94-97,152-155): the
    # reference tracks Min()/Max() on exponential-histogram datapoints
    # and merges them when both sides carry one.  NaN = "not set".
    hmin: float = float("nan")
    hmax: float = float("nan")

    @classmethod
    def empty(cls, scale: int = 0) -> "ExpoHist":
        return cls(scale, 0, np.zeros(0, dtype=np.int64))

    @classmethod
    def from_values(
        cls,
        values: np.ndarray,
        scale: int = 4,
        max_buckets: int = DEFAULT_MAX_EXPO_BUCKETS,
    ) -> "ExpoHist":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        pos = values[values > 0]
        neg = values[values < 0]
        h = cls.empty(scale)
        h.count = int(values.size)
        h.sum = float(values.sum()) if values.size else 0.0
        h.zero_count = int((values == 0).sum())
        if values.size:
            h.hmin = float(values.min())
            h.hmax = float(values.max())
        if pos.size:
            h.offset, h.counts = _run_from_indices(
                _bucket_indices(pos, scale)
            )
        if neg.size:
            h.neg_offset, h.neg_counts = _run_from_indices(
                _bucket_indices(-neg, scale)
            )
        # cap at construction too (the reference caps on merge,
        # merger Limit config.go:14-16); enforcing it here as well
        # makes results independent of how rows split into batches
        while max(h.counts.size, h.neg_counts.size) > max_buckets:
            h.downscale(h.scale - 1)
        return h

    def downscale(self, to_scale: int) -> "ExpoHist":
        """Downscale BOTH runs (merge.go:37-41 downscales hi.Positive()
        and hi.Negative() together)."""
        d = self.scale - to_scale
        if d < 0:
            raise ValueError("can only downscale")
        self.offset, self.counts = _downscale_run(
            self.offset, self.counts, d
        )
        self.neg_offset, self.neg_counts = _downscale_run(
            self.neg_offset, self.neg_counts, d
        )
        self.scale = to_scale
        return self

    def merge(
        self, other: "ExpoHist", max_buckets: int = DEFAULT_MAX_EXPO_BUCKETS
    ) -> "ExpoHist":
        """expo/merge.go:32: downscale both to the coarser scale, add
        overlapping runs (positive and negative), then keep downscaling
        until the larger merged run fits max_buckets (Limit,
        config.go:14-16 applied over both signs, add.go:123-127)."""
        target = min(self.scale, other.scale)
        a, b = self.downscale(target), _copy(other).downscale(target)
        off, cnt = _add_two_runs(
            a.offset, a.counts, b.offset, b.counts
        )
        noff, ncnt = _add_two_runs(
            a.neg_offset, a.neg_counts, b.neg_offset, b.neg_counts
        )
        merged = ExpoHist(target, off, cnt, neg_offset=noff,
                          neg_counts=ncnt)
        while max(merged.counts.size, merged.neg_counts.size) > max_buckets:
            merged.downscale(merged.scale - 1)
        self.scale = merged.scale
        self.offset = merged.offset
        self.counts = merged.counts
        self.neg_offset = merged.neg_offset
        self.neg_counts = merged.neg_counts
        self.count = self.count + other.count
        self.sum = self.sum + other.sum
        self.zero_count = self.zero_count + other.zero_count
        # add.go:94-97,152-155: keep min-of-mins / max-of-maxes; an
        # unset side (NaN) defers to the other
        self.hmin = _nan_combine(self.hmin, other.hmin, min)
        self.hmax = _nan_combine(self.hmax, other.hmax, max)
        return self


def expo_quantile(h: ExpoHist, q: float) -> float:
    """Quantile from the bucket CDF.  Order: negative buckets from the
    largest magnitude down, then zeros, then positive buckets up.  The
    crossing bucket's boundary nearer zero is reported (upper bound for
    positives, mirrored for negatives).  Relative error is bounded by
    one bucket width, base^1 - 1 = 2^(2^-scale) - 1 (~4.4% at scale 4)
    — the summary-metric analogue the reference exports as quantile
    values on summary datapoints."""
    n_neg = int(h.neg_counts.sum())
    total = n_neg + h.zero_count + int(h.counts.sum())
    if total == 0:
        return float("nan")
    target = q * total
    base_log2 = 2.0 ** (-h.scale)
    c = 0
    # negative range: most negative first = highest neg bucket first
    for i in range(len(h.neg_counts) - 1, -1, -1):
        n = int(h.neg_counts[i])
        if n == 0:
            continue
        c += n
        if c >= target:
            return float(-(2.0 ** ((h.neg_offset + i) * base_log2)))
    c += h.zero_count
    if c >= target:
        return 0.0
    for i, n in enumerate(h.counts):
        c += int(n)
        if c >= target:
            return float(2.0 ** ((h.offset + i + 1) * base_log2))
    return float(2.0 ** ((h.offset + len(h.counts)) * base_log2))


def _nan_combine(a: float, b: float, op) -> float:
    if a != a:  # NaN: unset
        return b
    if b != b:
        return a
    return float(op(a, b))


def _copy(h: ExpoHist) -> ExpoHist:
    return ExpoHist(h.scale, h.offset, h.counts.copy(), h.count, h.sum,
                    h.zero_count, h.neg_offset, h.neg_counts.copy(),
                    h.hmin, h.hmax)


def _add_two_runs(
    a_off: int, a_cnt: np.ndarray, b_off: int, b_cnt: np.ndarray
) -> Tuple[int, np.ndarray]:
    if a_cnt.size == 0:
        return b_off, b_cnt.copy()
    if b_cnt.size == 0:
        return a_off, a_cnt.copy()
    lo = min(a_off, b_off)
    hi = max(a_off + a_cnt.size, b_off + b_cnt.size)
    out = np.zeros(hi - lo, dtype=np.int64)
    out[a_off - lo : a_off - lo + a_cnt.size] += a_cnt
    out[b_off - lo : b_off - lo + b_cnt.size] += b_cnt
    return lo, out
