"""Mergeable quantile sketch (deterministic KLL/MRL-style compactor).

The bounded-memory path for per-group quantiles when a group's value
set outgrows worker memory: each summary holds at most ``capacity``
values per weight level (level i items carry weight 2^i); a full level
sorts, keeps alternate items (deterministic parity toggle — no RNG, so
runs reproduce), and promotes them with doubled weight.  Summaries
merge level-wise and re-compact, so partial sketches tree-merge like
every other partial in this engine.  Rank error is O(W·L/capacity)
with L = number of compacted levels (the classic MRL bound; the
randomized KLL improves constants, at the price of irreproducible
runs — the wrong trade for a value-gated batch engine).

Exactness gate: while n ≤ capacity nothing ever compacts, the sketch
IS the sorted sample, and quantiles are exact discrete quantiles —
``smallest v whose cumulative weight ≥ p·W`` with the p·W product
computed in float64, matching the SQL twin's ``rn >= CAST(p AS
DOUBLE) * n`` crossing exactly.  Exact count/sum/min/max/zero-count
scalars ride along at every capacity.

Citation: Manku-Rajagopalan-Lindsay (SIGMOD 1998) compactors;
Karnin-Lang-Liberty (FOCS 2016) for the randomized refinement.
"""

from __future__ import annotations

import pickle

import numpy as np


class KLLSketch:
    def __init__(self, capacity: int = 4096):
        if capacity < 8:
            raise ValueError("capacity must be >= 8")
        self.cap = int(capacity)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.flips: list[bool] = [False]
        self.n = 0
        self.vsum = 0.0
        self.vmin = np.inf
        self.vmax = -np.inf
        self.zero_count = 0

    # -- scalars ----------------------------------------------------------
    def _scalars_update(self, v: np.ndarray) -> None:
        self.n += len(v)
        self.vsum += float(v.sum())
        if len(v):
            self.vmin = min(self.vmin, float(v.min()))
            self.vmax = max(self.vmax, float(v.max()))
        self.zero_count += int((v == 0).sum())

    # -- compaction -------------------------------------------------------
    def _compact_level(self, i: int) -> None:
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.flips.append(False)
        lv = np.sort(self.levels[i], kind="stable")
        start = 1 if self.flips[i] else 0
        self.flips[i] = not self.flips[i]
        promoted = lv[start::2]
        self.levels[i] = np.empty(0, dtype=np.float64)
        self.levels[i + 1] = np.concatenate(
            [self.levels[i + 1], promoted]
        )

    def _compact_all(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.cap:
                self._compact_level(i)
            i += 1

    # -- API --------------------------------------------------------------
    def update(self, values) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self._scalars_update(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_all()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.cap != self.cap:
            raise ValueError("capacity mismatch")
        self.n += other.n
        self.vsum += other.vsum
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.zero_count += other.zero_count
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.flips.append(False)
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact_all()
        return self

    def quantiles(self, ps) -> np.ndarray:
        """Discrete quantiles: smallest stored value whose cumulative
        weight ≥ p·W (W = total weight = n)."""
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [
                np.full(len(lv), 1 << i, dtype=np.int64)
                for i, lv in enumerate(self.levels)
            ]
        )
        if not len(vals):
            return np.full(len(list(ps)), np.nan)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        targets = np.asarray(list(ps), dtype=np.float64) * self.n
        idx = np.searchsorted(cum, targets, side="left")
        return vals[np.minimum(idx, len(vals) - 1)]

    @property
    def exact(self) -> bool:
        """True while nothing has ever been compacted (all weight at
        level 0 and any promoted levels empty)."""
        return all(len(lv) == 0 for lv in self.levels[1:])

    # -- serialization (for object-store rows) ---------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "cap": self.cap,
                "levels": self.levels,
                "flips": self.flips,
                "n": self.n,
                "vsum": self.vsum,
                "vmin": self.vmin,
                "vmax": self.vmax,
                "zero_count": self.zero_count,
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLLSketch":
        d = pickle.loads(b)
        sk = cls(d["cap"])
        sk.levels = d["levels"]
        sk.flips = d["flips"]
        sk.n = d["n"]
        sk.vsum = d["vsum"]
        sk.vmin = d["vmin"]
        sk.vmax = d["vmax"]
        sk.zero_count = d["zero_count"]
        return sk
