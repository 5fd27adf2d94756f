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


_POLY_P = np.uint64(1099511628211)  # FNV prime as word-chain base
_LEN_SEED = np.uint64(0x243F6A8885A308D3)  # pi fraction, seeds by length


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK64
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK64
    return x ^ (x >> np.uint64(31))


def _poly_hash_segments(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """Word-at-a-time polynomial hash of variable-length byte segments.

    Segments are grouped into power-of-two word-count classes (a word =
    8 little-endian bytes, zero-padded); each class is gathered into one
    contiguous ``(n, W*8)`` byte matrix viewed as ``uint64`` words, and
    the hash is the chain ``acc = acc*P + word`` across the W vectorized
    columns, seeded by the segment length (so zero padding cannot
    collide strings of different lengths) and finalized with splitmix64
    for avalanche.  ~10-20× the byte-expansion formulation: the inner
    loop runs W times over n-vectors instead of once per byte."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = (ends - starts).astype(np.int64)
    out = _splitmix64(lens.astype(np.uint64) ^ _LEN_SEED)
    nwords = (lens + 7) >> 3
    nz = np.flatnonzero(nwords)
    if len(nz) == 0:
        return _splitmix64(out)  # same finalization as the general path
    # class c holds segments needing (2^(c-1), 2^c] words, padded to 2^c
    nw_nz = nwords[nz]
    cls = np.ceil(np.log2(nw_nz)).astype(np.int64)
    order = np.argsort(cls, kind="stable")
    cls_sorted = cls[order]
    bounds = np.flatnonzero(np.diff(cls_sorted)) + 1
    for grp in np.split(nz[order], bounds):
        if len(grp) == 0:
            continue
        W = int(nwords[grp[0]] if len(grp) == 1 else nwords[grp].max())
        W = 1 << max(int(W - 1).bit_length(), 0)
        width = W * 8
        # int32 indices halve gather bandwidth; batch buffers are < 2 GiB
        it = np.int32 if len(data) < 2**31 - width else np.int64
        s, e = starts[grp].astype(it), ends[grp].astype(it)
        idx = s[:, None] + np.arange(width, dtype=it)[None, :]
        mask = idx < e[:, None]
        np.clip(idx, 0, len(data) - 1, out=idx)
        mat = data[idx]
        mat[~mask] = 0
        words = np.ascontiguousarray(mat).view(np.uint64)
        acc = out[grp].copy()
        for j in range(W):
            acc = acc * _POLY_P + words[:, j]
        out[grp] = acc
    return _splitmix64(out)


def hash64_arrow(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a pyarrow string/binary Array or
    ChunkedArray, reading the offsets+data buffers directly — no
    per-value Python objects.  Nulls hash like empty strings."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_integer(t):
        x = arr.to_numpy(zero_copy_only=False)
        x = np.where(np.isnan(x), 0, x) if x.dtype.kind == "f" else x
        return _splitmix64(x.astype(np.uint64))
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        off_dtype = np.int32
    else:  # dictionary / other: decode via cast
        import pyarrow.compute as pc

        return hash64_arrow(pc.cast(arr, pa.string()))
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    starts, ends = offsets[:-1].copy(), offsets[1:].copy()
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        ends = np.where(valid, ends, starts)  # nulls → empty segments
    return _poly_hash_segments(data, starts, ends)


def hash64(values) -> np.ndarray:
    """Vectorized 64-bit splitmix-style hash of an array of strings/ints
    (numpy array, list, or pyarrow Array/ChunkedArray).

    Deterministic across runs/processes (no PYTHONHASHSEED dependence);
    string hashing is a buffer-level polynomial hash (no per-row Python
    — the round-2 review's dedup-hot-path finding)."""
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        return hash64_arrow(values)
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "O"):
        try:  # plain conversion handles None; from_pandas (NaN scan)
            return hash64_arrow(pa.array(arr, pa.string()))
        except (pa.ArrowInvalid, pa.ArrowTypeError):  # NaN/mixed objects
            return hash64_arrow(pa.array(arr, pa.string(), from_pandas=True))
    if arr.dtype.kind == "S":
        return hash64_arrow(pa.array(arr, pa.binary()))
    x = arr.astype(np.uint64)
    return _splitmix64(x)


def duckdb_hash64(arr) -> np.ndarray:
    """64-bit string hash computed by DuckDB's vectorized ``hash()``
    kernel (in-process, one call per batch — no per-row Python).

    Exists so an operator's per-word hash can be made IDENTICAL to
    what a DuckDB oracle query computes, turning sketch-style outputs
    (e.g. simhash signatures) into value-level-checkable results.  The
    native :func:`hash64` stays the default scale path; this variant is
    for oracle-gated query configurations and tests.  Row order is
    preserved (DuckDB's default ``preserve_insertion_order=true``).
    """
    import duckdb
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), pa.string())
    _t = pa.table({"w": arr})
    con = duckdb.connect()
    try:
        out = con.execute("SELECT hash(w) AS h FROM _t").arrow()
    finally:
        con.close()
    return out["h"].combine_chunks().to_numpy(zero_copy_only=False).astype(
        np.uint64
    )


def _ertl_sigma(x: float) -> float:
    """σ(x) = x + Σ 2^(k-1)·x^(2^k); handles the all-zero-register mass."""
    if x == 1.0:
        return float("inf")
    y, z = 1.0, x
    while True:
        x = x * x
        z_prev = z
        z = z + x * y
        y = 2.0 * y
        if z == z_prev:
            return z


def _ertl_tau(x: float) -> float:
    """τ(x) for the saturated-register mass (Ertl 2017, Alg. 6)."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y, z = 1.0, 1.0 - x
    while True:
        x = np.sqrt(x)
        z_prev = z
        y = 0.5 * y
        z = z - (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


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
        """Ertl's improved raw estimator (arXiv:1702.01284 §2, Alg. 6).

        Bias-free across the full cardinality range — no linear-counting
        switchover and no empirical bias tables; the original raw
        estimator has a ~+1-2% bias hump just above the classic
        2.5·m switchover (n/m ≈ 3-5), observed directly in tests.
        """
        m = float(self.m)
        q = 64 - self.p  # register values range 0..q+1
        counts = np.bincount(self.registers, minlength=q + 2).astype(
            np.float64
        )
        z = m * _ertl_tau(1.0 - counts[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + counts[k])
        z += m * _ertl_sigma(counts[0] / m)
        if z == 0.0:
            return float("inf")
        return float(m * m / (2.0 * np.log(2.0)) / z)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 14) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitters summary (mergeable).
#
# The bounded-memory path for value top-k when the key cardinality
# explodes past what a sort shuffle or a tree merge of exact partials
# can hold: at most ``capacity`` counters survive per summary, and
# summaries merge by summing matched counters then decrementing all by
# the (capacity+1)-st largest and dropping non-positives — the
# mergeable-summaries result (Agarwal et al., PODS 2012): the merged
# summary obeys the same guarantee
#     true_count - W/(capacity+1)  <=  count  <=  true_count
# with W the TOTAL summarized weight, regardless of merge tree shape.
# ``dec`` carries the cumulative decrement, so every reported counter
# comes with a certificate: count is the lower bound, count+dec the
# upper.  When capacity >= distinct keys no decrement ever happens and
# the summary is EXACT (dec = 0) — the value-gate trick the driver's
# top-k query uses (same polarity as the HLL routing gate).
# ---------------------------------------------------------------------------


class MisraGries:
    """Vectorized MG summary: items ndarray + counts ndarray + dec."""

    def __init__(self, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = capacity
        self.items = np.array([], dtype=object)
        self.counts = np.array([], dtype=np.int64)
        self.dec = 0

    def _compress(self) -> None:
        if len(self.items) <= self.capacity:
            return
        # decrement by the (capacity+1)-st largest count
        t = np.partition(self.counts, -(self.capacity + 1))[
            -(self.capacity + 1)
        ]
        keep = self.counts > t
        self.items = self.items[keep]
        self.counts = self.counts[keep] - t
        self.dec += int(t)

    def update(self, items: np.ndarray, counts: np.ndarray) -> "MisraGries":
        """Bulk-add exact (item, count) pairs (a batch's value_counts)."""
        allv = np.concatenate([self.items, np.asarray(items, dtype=object)])
        allc = np.concatenate(
            [self.counts, np.asarray(counts, dtype=np.int64)]
        )
        uniq, inv = np.unique(allv, return_inverse=True)
        self.items = uniq.astype(object)
        self.counts = np.bincount(inv, weights=allc).astype(np.int64)
        self._compress()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.dec += other.dec
        return self.update(other.items, other.counts)

    def result(self):
        """(items, count_lower, count_upper) sorted by count desc,
        item asc — deterministic."""
        order = np.lexsort((self.items, -self.counts))
        items = self.items[order]
        lo = self.counts[order]
        return items, lo, lo + self.dec
