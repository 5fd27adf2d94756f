"""Distributed Bloom filter over a key column — the shuffle-avoidance
pre-filter for semi/anti joins at scale.

At 100 TB the bucketed ``filter_join`` pays one all-to-all exchange of
the FULL left side.  A Bloom filter over the right-side keys costs
``bits_per_key`` bits per key (10 bits → ~1% FPR), is mergeable by
bitwise OR, and is broadcast once (``ray.put``); left rows that miss
the filter are *definitely* not in the right side, so only the
candidates (true hits + false positives, typically a tiny fraction)
enter the exact bucketed verify.  Results are EXACT — the filter only
prunes, never decides — so the bloom path shares the plain semi/anti
SQL oracle.

Build is Dataset-native: one partial bit-array per input block
(vectorized double hashing over ``hash64`` — splitmix/polynomial, no
per-row Python), then a two-hop bitwise-OR tree merge; the driver only
ever holds the final ``m/8`` bytes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .sketches import _splitmix64, hash64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _positions(h: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; ``m_bits`` is a power
    of two so the modulo is a mask.  Both probe bases get a splitmix
    finalizer — the raw polynomial string hash carries low-bit
    structure that correlates the k probes (measured 7× the design
    FPR without it)."""
    mask = np.uint64(m_bits - 1)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h ^ _GOLDEN) | np.uint64(1)  # odd stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & mask).astype(np.int64)


@dataclass
class BloomFilter:
    bits: np.ndarray  # uint8, length m_bits // 8
    m_bits: int
    k: int

    def add_hashes(self, h: np.ndarray) -> None:
        pos = _positions(h.astype(np.uint64), self.k, self.m_bits)
        np.bitwise_or.at(
            self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
        )

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership for pre-hashed keys (definite-no /
        maybe-yes)."""
        pos = _positions(h.astype(np.uint64), self.k, self.m_bits)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=1)

    def contains(self, values) -> np.ndarray:
        return self.contains_hashes(hash64(values))


def _size_for(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    m_bits = 1 << max(6, int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    k = max(1, int(round(np.log(2) * m_bits / max(n_keys, 1))))
    return m_bits, min(k, 16)


def build_bloom(
    keys_ds: rd.Dataset,
    on: str,
    n_keys: int | None = None,
    bits_per_key: int = 10,
    m_bits: int | None = None,
) -> BloomFilter:
    """Build a Bloom filter over ``keys_ds[on]`` as a Dataset pipeline:
    per-block partial bit-arrays OR-merged in two hops.  ``n_keys``
    (or an explicit ``m_bits``) sizes the filter; when absent, one
    ``count()`` pass over the (small) right side measures it."""
    if m_bits is None:
        if n_keys is None:
            n_keys = keys_ds.count()
        m_bits, k = _size_for(n_keys, bits_per_key)
    else:
        if m_bits & (m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        k = max(
            1, int(round(np.log(2) * m_bits / max(n_keys or m_bits // 8, 1)))
        )
    nbytes = m_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(np.zeros(nbytes, dtype=np.uint8), m_bits, k)
        bf.add_hashes(hash64(t[on]))
        return pa.table({"bloom": pa.array([bf.bits.tobytes()], pa.binary())})

    def or_merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for blob in t["bloom"]:
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    parts = keys_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    merged = (
        parts.repartition(8)
        .map_batches(or_merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(or_merge, batch_format="pyarrow", batch_size=None)
    )
    rows = merged.take(1)
    if not rows:  # empty key set → all-miss filter (no bits set)
        return BloomFilter(np.zeros(nbytes, dtype=np.uint8), m_bits, k)
    blob = rows[0]["bloom"]
    return BloomFilter(
        np.frombuffer(blob, dtype=np.uint8).copy(), m_bits, k
    )


def bloom_prefilter(
    ds: rd.Dataset, bf: BloomFilter, on: str, keep_hits: bool
) -> rd.Dataset:
    """Keep rows whose key hits (``keep_hits``) or misses the broadcast
    filter.  Misses are definite non-members; hits may be false
    positives and still need exact verification."""
    ref = ray.put(bf)

    def fn(t: pa.Table) -> pa.Table:
        f: BloomFilter = ray.get(ref)
        hit = f.contains_hashes(hash64(t[on]))
        return t.filter(pa.array(hit if keep_hits else ~hit))

    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
