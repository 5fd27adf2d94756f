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


@dataclass
class ExpoHist:
    """Positive-range base-2 exponential histogram (scale + offset +
    bucket run), the shape pmetric uses for ExponentialHistogram
    datapoints.  Bucket i covers (base^(offset+i), base^(offset+i+1)]
    with base = 2^(2^-scale)."""

    scale: int
    offset: int
    counts: np.ndarray  # int64 run
    count: int = 0
    sum: float = 0.0
    zero_count: int = 0

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
        h = cls.empty(scale)
        h.count = int(values.size)
        h.sum = float(values.sum()) if values.size else 0.0
        h.zero_count = int((values <= 0).sum())
        if pos.size:
            # index = ceil(log_base(v)) - 1 = ceil(log2(v) * 2^scale) - 1
            idx = np.ceil(np.log2(pos) * (1 << scale)).astype(np.int64) - 1
            lo, hi = int(idx.min()), int(idx.max())
            h.offset = lo
            h.counts = np.bincount(idx - lo, minlength=hi - lo + 1).astype(
                np.int64
            )
            # cap at construction too (the reference caps on merge,
            # merger Limit config.go:14-16); enforcing it here as well
            # makes results independent of how rows split into batches
            while h.counts.size > max_buckets:
                h.downscale(h.scale - 1)
        return h

    def downscale(self, to_scale: int) -> "ExpoHist":
        """scale.go:65-141: merge 2^d adjacent buckets; run boundaries
        re-aligned by flooring the offset into the coarser grid."""
        d = self.scale - to_scale
        if d < 0:
            raise ValueError("can only downscale")
        if d == 0 or self.counts.size == 0:
            self.scale = to_scale
            return self
        # bucket i covers index (offset + i); coarser index = floor((offset+i)/2^d)
        idx = (self.offset + np.arange(self.counts.size)) >> d
        lo, hi = int(idx.min()), int(idx.max())
        out = np.zeros(hi - lo + 1, dtype=np.int64)
        np.add.at(out, idx - lo, self.counts)
        self.scale = to_scale
        self.offset = lo
        self.counts = out
        return self

    def merge(
        self, other: "ExpoHist", max_buckets: int = DEFAULT_MAX_EXPO_BUCKETS
    ) -> "ExpoHist":
        """expo/merge.go:32: downscale both to the coarser scale, add
        overlapping runs, then keep downscaling until the merged run
        fits max_buckets (Limit, config.go:14-16)."""
        target = min(self.scale, other.scale)
        a, b = self.downscale(target), _copy(other).downscale(target)
        merged = _add_runs(a, b)
        while merged.counts.size > max_buckets:
            merged = merged.downscale(merged.scale - 1)
        merged.count = self.count + other.count
        merged.sum = self.sum + other.sum
        merged.zero_count = self.zero_count + other.zero_count
        self.scale = merged.scale
        self.offset = merged.offset
        self.counts = merged.counts
        self.count = merged.count
        self.sum = merged.sum
        self.zero_count = merged.zero_count
        return self


def expo_quantile(h: ExpoHist, q: float) -> float:
    """Quantile from the bucket CDF (upper bound of the crossing
    bucket; zeros count below every positive bucket).  Relative error
    is bounded by one bucket width, base^1 - 1 = 2^(2^-scale) - 1
    (~4.4% at scale 4) — the summary-metric analogue the reference
    exports as quantile values on summary datapoints."""
    total = h.zero_count + int(h.counts.sum())
    if total == 0:
        return float("nan")
    target = q * total
    if target <= h.zero_count:
        return 0.0
    c = h.zero_count
    base_log2 = 2.0 ** (-h.scale)
    for i, n in enumerate(h.counts):
        c += int(n)
        if c >= target:
            return float(2.0 ** ((h.offset + i + 1) * base_log2))
    return float(2.0 ** ((h.offset + len(h.counts)) * base_log2))


def _copy(h: ExpoHist) -> ExpoHist:
    return ExpoHist(h.scale, h.offset, h.counts.copy(), h.count, h.sum,
                    h.zero_count)


def _add_runs(a: ExpoHist, b: ExpoHist) -> ExpoHist:
    if a.counts.size == 0:
        return _copy(b)
    if b.counts.size == 0:
        return _copy(a)
    lo = min(a.offset, b.offset)
    hi = max(a.offset + a.counts.size, b.offset + b.counts.size)
    out = np.zeros(hi - lo, dtype=np.int64)
    out[a.offset - lo : a.offset - lo + a.counts.size] += a.counts
    out[b.offset - lo : b.offset - lo + b.counts.size] += b.counts
    return ExpoHist(a.scale, lo, out)
