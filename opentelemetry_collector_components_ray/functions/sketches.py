"""Mergeable sketches.

HyperLogLog mirrors the reference's precision-14 sketch used for
overflow-cardinality tracking and routing estimates (reference
processor/lsmintervalprocessor/internal/merger/limits/tracker.go:76,
connector/dynamicroutingconnector/README.md:272-278 — "~1%" error).

Sketches are designed to be mergeable: per-batch partial sketches are
emitted from ``map_batches`` and OR-merged in a tiny second stage — the
scale path for distinct counts where an exact ``n_unique`` would
shuffle every row.
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash64(values) -> np.ndarray:
    """Vectorized 64-bit splitmix-style hash of an array of strings/ints.

    Deterministic across runs/processes (no PYTHONHASHSEED dependence).
    """
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O"):
        # vectorized FNV-1a over utf-8 bytes, numpy loop-free per byte
        # position is overkill; use python hashlib per unique value via
        # np.unique to amortize (cardinality << rows in typical use).
        uniq, inv = np.unique(arr.astype("U"), return_inverse=True)
        import hashlib

        h = np.empty(len(uniq), dtype=np.uint64)
        for i, s in enumerate(uniq):
            h[i] = np.uint64(
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
                )
            )
        return h[inv]
    x = arr.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK64
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK64
    return x ^ (x >> np.uint64(31))


class HyperLogLog:
    """Dense HLL, precision p (default 14 ⇒ 16384 registers, ~0.8% err)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        p = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p)).astype(np.int64)
        rest = (h << p) & _MASK64
        # rank = leading zeros of rest + 1 (capped at 64 - p + 1)
        # leading zeros via bit_length: 64 - floor(log2(rest)) when rest>0
        rank = np.where(
            rest == 0,
            64 - self.p + 1,
            64 - np.floor(np.log2(rest.astype(np.float64) + 0.5)).astype(np.int64),
        ).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = (0.7213 / (1 + 1.079 / m)) * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting, small range
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 14) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())
