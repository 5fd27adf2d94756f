"""Deduplication stages over the ``documents`` table.

Large-scale-training-pipeline ops, built Ray-Data-first:

- **Exact dedup**: two-phase min-reduce keyed on content — per-batch
  combiner emits one (text, min doc_id) row, text-hash-bucketed
  distributed finish (coalesced finish for small corpora).  The
  reference's analogue is identity-hash dedup when merging resources
  (internal/merger/value.go:364-462) and intake event fingerprint dedup
  (ndjsondecoder/stream.go:513).
- **MinHash + LSH near-dup**: word-shingle → 64-perm minhash (vectorized
  via ``np.minimum.reduceat`` over a flattened shingle array) → banded
  bucket keys → coarse hash-bucket groupby (NOT one Python call per
  band bucket — buckets are packed into ~1k coarse groups and pairs are
  found vectorized inside each) → exact-Jaccard verification against
  id-hash-partitioned shingle state (default) or a broadcast index
  (small corpora).
- **SimHash near-dup**: 64-bit simhash, block-permutation bucketing for
  hamming distance ≤ k.
- **Embedding cosine near-dup**: blocked all-pairs cosine over a
  broadcast matrix (small side) — the scale path is IVF-style bucketing
  (stages/ann.py).

Partitioning assumptions are stated per function; everything before a
groupby is a per-batch combiner so shuffles only move pre-reduced rows.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.blocks import to_clean_arrow
from ..functions.broadcast import process_cached
from ..functions.sketches import hash64
from .ann import round_half_away

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 65536,
    distributed: bool | None = None,
    num_buckets: int = 256,
) -> rd.Dataset:
    """Keep the min-id row per distinct text (deterministic survivor).

    Combiner-first: each batch reduces to one row per distinct text, so
    the shuffle moves unique texts, never raw rows.  The default finish
    is hash-partitioned: partials bucket by ``hash64(text) %
    num_buckets`` and each bucket reduces independently (one vectorized
    pandas groupby per bucket) — no single worker ever holds the whole
    unique-text set.  Size ``num_buckets`` so |unique texts| × avg_len
    / num_buckets fits a worker (~256 buckets ≈ 40 GB of unique text at
    100 TB scale → raise it for bigger corpora).  ``distributed=False``
    coalesces to one worker instead — faster fixed cost when the unique
    set is known-small.

    Reference analogue: identity-hash dedup when merging resources
    (internal/merger/value.go:364-462).
    """
    from .aggregate import resolve_distributed

    distributed = resolve_distributed(ds, distributed)


    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(text_col, as_index=False)[id_col].min()
        return g[[id_col, text_col]]

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )
    if not distributed:
        return partials.repartition(1).map_batches(
            partial, batch_format="pandas", batch_size=None
        )

    def bucketize(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["_bucket"] = (
            hash64(df[text_col].to_numpy(dtype=object))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(df)

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return partial(df.drop(columns=["_bucket"]))

    return (
        partials.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


EXACT_DEDUP_SQL = (
    "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text "
    "FROM documents GROUP BY text"
)


def dedup_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    batch_size: int = 65536,
    distributed: bool | None = None,
    num_buckets: int = 256,
) -> pd.DataFrame:
    """(n_docs, n_unique) single-row summary.

    Default path is hash-partitioned: each batch reduces to (text,
    occurrences) partials, texts bucket by ``hash64(text)``, each
    bucket counts its distinct texts and row occurrences, and only the
    per-bucket 2-int rows reach the driver — no worker or driver holds
    the global unique-text set.  ``distributed=False`` coalesces the
    per-batch unique arrays to one worker (small corpora)."""
    from .aggregate import resolve_distributed

    distributed = resolve_distributed(ds, distributed)


    if not distributed:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "n_docs": [len(df)],
                    "texts": [df[text_col].unique()],
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pandas", batch_size=batch_size
        ).repartition(1)

        def final(df: pd.DataFrame) -> pd.DataFrame:
            uniq = len(np.unique(np.concatenate(df["texts"].to_numpy())))
            return pd.DataFrame(
                {
                    "n_docs": pd.array([int(df.n_docs.sum())], dtype="int64"),
                    "n_unique": pd.array([uniq], dtype="int64"),
                }
            )

        return final(parts.to_pandas())

    def partial(df: pd.DataFrame):
        g = df.groupby(text_col, as_index=False).size()
        g["_bucket"] = (
            hash64(g[text_col].to_numpy(dtype=object))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(g)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(text_col)["size"].sum()
        return pd.DataFrame(
            {"n_docs": [int(g.sum())], "n_unique": [len(g)]}
        )

    buckets = (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_docs": pd.array([int(buckets.n_docs.sum())], dtype="int64"),
            "n_unique": pd.array(
                [int(buckets.n_unique.sum())], dtype="int64"
            ),
        }
    )


DEDUP_STATS_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique FROM documents"
)

# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+")
_MERSENNE = np.uint64((1 << 61) - 1)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (hamming distance kernel):
    byte-view + unpackbits, no per-pair Python ``bin().count``."""
    if len(v) == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(np.ascontiguousarray(v).view(np.uint8))
    return bits.reshape(len(v), 64).sum(axis=1).astype(np.int64)


def _shingles(text: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles (distinct)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        joined = [" ".join(words)] if words else [""]
    else:
        joined = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(hash64(np.asarray(joined, dtype=object)))


def _sig_list_array(sigs: np.ndarray) -> "pa.ListArray":
    """(n, k) signature matrix → list<int64> column without building n
    per-row Python ndarray objects (one flat values buffer + arithmetic
    offsets)."""
    n, k = sigs.shape
    vals = pa.array(sigs.astype(np.int64).reshape(-1))
    offsets = pa.array(
        np.arange(0, (n + 1) * k, k, dtype=np.int32), pa.int32()
    )
    return pa.ListArray.from_arrays(offsets, vals)


def _sig_matrix(col) -> np.ndarray:
    """list<int64> signature column → (n, k) uint64 matrix via the flat
    values buffer (no per-row object materialization)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0), dtype=np.uint64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.uint64)


def _as_string_array(texts) -> "pa.Array":
    """Normalize a text batch (Python list, Arrow Array or ChunkedArray)
    to one contiguous Arrow string array WITHOUT a Python round-trip —
    callers pass ``batch[col]`` straight through so the hot dedup paths
    never materialize per-row Python strings (round-3 review finding)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        if texts.type != pa.string():
            texts = texts.cast(pa.string())
        return texts
    return pa.array(list(texts), pa.string())


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Per-batch minhash signatures (per-process cached via
    functions/broadcast.process_cached: params built once per worker
    process — see that module for why this beats an actor pool here;
    also usable directly as an actor-pool callable class)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 3,
        num_perm: int = 64,
        seed: int = 42,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.num_perm = num_perm
        self.a, self.b = _perm_params(num_perm, seed)

    def _flat_shingles(self, texts):
        """Vectorized word-k-shingle hashes for a batch.

        No per-document Python loop: one Arrow lowercase+split pass,
        one vocabulary-amortized word hash, then the k-shingle hash is
        a fixed-multiplier combination of adjacent word hashes computed
        on the flat array with document boundaries masked out.
        Returns (flat_shingle_hashes, doc_offsets, doc_lengths).
        """
        import pyarrow as _pa
        import pyarrow.compute as _pc

        arr = _as_string_array(texts)
        words_list = _pc.split_pattern_regex(
            _pc.utf8_lower(arr), r"\W+"
        )
        flat_arr = _pc.list_flatten(words_list)
        word_counts = np.asarray(
            _pc.list_value_length(words_list), dtype=np.int64
        )
        # split artifacts at string edges are empty strings
        keep = _pc.not_equal(flat_arr, "").to_numpy(zero_copy_only=False)
        # buffer-level vectorized word hash — the flat word array never
        # round-trips through Python objects (round-2 review finding)
        h = hash64(flat_arr)
        # recompute per-doc word counts after dropping empties
        doc_ids = np.repeat(np.arange(len(texts)), word_counts)
        doc_ids = doc_ids[keep]
        h = h[keep]
        word_counts = np.bincount(doc_ids, minlength=len(texts)).astype(
            np.int64
        )
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(word_counts[:-1], out=offsets[1:])

        k = self.k
        n = len(h)
        # shingle at position i combines words i..i+k-1 (valid when all
        # inside the same doc); docs shorter than k use their full run
        # position weights must be non-linear in j: the former
        # arithmetic-progression constants were palindromic
        # (m[j] + m[k-1-j] constant), making every shingle collide with
        # its word-reverse — caught by the substring-dedup
        # naive-reference property test, fixed here the same way
        from ..functions.sketches import _splitmix64

        mults = _splitmix64(
            np.uint64(0x9E3779B97F4A7C15)
            + np.arange(1, k + 1, dtype=np.uint64)
        )
        ncomb = max(n - k + 1, 0)
        comb = np.zeros(ncomb, dtype=np.uint64)
        for j in range(k):
            comb = comb + mults[j] * h[j : ncomb + j]
        ends = offsets + word_counts

        # valid shingle start positions: whole window inside one doc
        doc_of = np.repeat(np.arange(len(texts)), word_counts)[:ncomb]
        idx = np.arange(ncomb)
        valid = (
            (idx + k - 1 < ends[doc_of]) if ncomb else np.zeros(0, bool)
        )
        vd, vs = doc_of[valid], comb[valid]
        # distinct per doc, vectorized: lexsort then drop adjacent dups
        order = np.lexsort((vs, vd))
        vd, vs = vd[order], vs[order]
        if len(vd):
            keep2 = np.empty(len(vd), dtype=bool)
            keep2[0] = True
            keep2[1:] = (vd[1:] != vd[:-1]) | (vs[1:] != vs[:-1])
            vd, vs = vd[keep2], vs[keep2]

        lengths = np.bincount(vd, minlength=len(texts)).astype(np.int64)
        # docs shorter than k words (rare): one shingle over the full run
        short = np.nonzero(lengths == 0)[0]
        if len(short):
            extra_d, extra_s = [], []
            for d in short:
                s, e = offsets[d], ends[d]
                acc = np.uint64(0)
                for j, w in enumerate(range(s, e)):
                    acc = acc + mults[j] * h[w]
                extra_d.append(d)
                extra_s.append(acc)
            vd = np.concatenate([vd, np.array(extra_d, dtype=np.int64)])
            vs = np.concatenate([vs, np.array(extra_s, dtype=np.uint64)])
            order = np.lexsort((vs, vd))
            vd, vs = vd[order], vs[order]
            lengths = np.bincount(vd, minlength=len(texts)).astype(np.int64)

        off = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lengths[:-1], out=off[1:])
        return vs, off, lengths

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 via flattened reduceat — one numpy
        pass per permutation, no per-document Python regex loop."""
        flat, offsets, _ = self._flat_shingles(texts)
        flat = flat & _MERSENNE
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i in range(self.num_perm):
            vals = (self.a[i] * flat + self.b[i]) % _MERSENNE
            sigs[:, i] = np.minimum.reduceat(vals, offsets)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow column passed straight through — no to_pylist round-trip
        sigs = self.signatures(batch[self.text_col])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": _sig_list_array(sigs),
            }
        )


def distinct_pairs(
    pairs: rd.Dataset,
    cols: Tuple[str, str] = ("id_a", "id_b"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Cross-block distinct of (id_a, id_b) pair rows without a
    coalesce: bucket by a pair hash (both occurrences of a pair land in
    one bucket), drop duplicates per bucket."""
    a, b = cols

    def add_bucket(df: pd.DataFrame):
        df = df.copy()
        mixed = (
            df[a].to_numpy().astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + df[b].to_numpy().astype(np.uint64)
        )
        df["_g"] = (mixed % np.uint64(num_buckets)).astype(np.int64)
        return to_clean_arrow(df)

    return (
        pairs.map_batches(add_bucket, batch_format="pandas")
        .groupby("_g")
        .map_groups(
            lambda df: df.drop(columns=["_g"]).drop_duplicates([a, b]),
            batch_format="pandas",
        )
    )


def _minhash_fn(text_col: str, id_col: str, k: int, num_perm: int):
    """Stateless minhash stage: per-process cached MinHasher (see
    functions/broadcast.py for why this beats an actor pool here)."""
    key = ("minhash", text_col, id_col, k, num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        mh = process_cached(
            key, lambda: MinHasher(text_col, id_col, k, num_perm)
        )
        return mh(batch)

    return fn


def lsh_candidate_pairs(
    sig_ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    coarse_buckets: int = 1024,
    distributed: bool = True,
) -> rd.Dataset:
    """Banded LSH: explode signatures to (band, band_hash, id) rows,
    co-locate by ``band_hash % coarse_buckets`` (ONE groupby whose group
    count is bounded by coarse_buckets, not by #band-buckets), then find
    same-(band, band_hash) pairs vectorized inside each coarse group.
    Emits unique (id_a < id_b) candidate pairs (dedup across bands done
    by a final distinct merge).
    """
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:  # empty block: (0, 0) sig matrix has no band cols
            return pa.table(
                {"band": pa.array([], pa.int64()),
                 "bhash": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64())}
            )
        sigs = _sig_matrix(batch["sig"])
        out_band, out_hash, out_id = [], [], []
        for bnd in range(bands):
            chunk = sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            # order-dependent mix of the band's rows
            h = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                h = h * np.uint64(1099511628211) + chunk[:, j]
            out_band.append(np.full(n, bnd, dtype=np.int64))
            out_hash.append(h.astype(np.int64))
            out_id.append(ids)
        return pa.table(
            {
                "band": np.concatenate(out_band),
                "bhash": np.concatenate(out_hash),
                id_col: np.concatenate(out_id),
            }
        )

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(["band", "bhash"], keep=False)]
        if dup.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        m = dup.merge(dup, on=["band", "bhash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        out.columns = ["id_a", "id_b"]
        return out

    if distributed:
        # scale path: hash-shuffle bucket co-location; group count is
        # bounded by coarse_buckets so per-group Python overhead stays
        # fixed while bucket contents stay worker-sized
        def add_coarse(batch: pa.Table) -> pa.Table:
            b = batch["bhash"].to_numpy().astype(np.uint64)
            out = batch.append_column(
                "coarse", pa.array((b % coarse_buckets).astype(np.int64))
            )
            if out.schema.metadata:
                out = out.replace_schema_metadata(None)
            return out

        cand = (
            exploded.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse")
            .map_groups(
                lambda df: pairs_in_group(df.drop(columns=["coarse"])),
                batch_format="pandas",
            )
        )
        # a pair found in two bands can land in two coarse groups —
        # cross-group distinct, pair-hash bucketed (no coalesce)
        return distinct_pairs(cand, ("id_a", "id_b"))
    # small/medium path: exploded rows are tiny (bands × ndocs); one
    # coalesce + one vectorized pass beats the sort-shuffle's fixed cost
    return exploded.repartition(1).map_batches(
        pairs_in_group, batch_format="pandas", batch_size=None
    )


class JaccardVerifier:
    """Broadcast-path verifier (per-process cached): holds the
    (id → shingle-set) index resolved from a ``ray.put`` ref, verifies
    candidate pairs with exact Jaccard.  This is the SMALL-corpus fast
    path; the default at scale is :func:`_verify_pairs_partitioned`
    (id-hash-partitioned shingle state, no broadcast).
    """

    def __init__(self, docs_ref, text_col: str, id_col: str, k: int):
        docs = ray.get(docs_ref) if docs_ref is not None else None
        # shingle sets are built LAZILY: only docs that actually appear
        # in candidate pairs pay the shingling cost (candidates ≪ corpus)
        self._texts: Dict[int, str] = dict(
            zip((int(i) for i in docs[id_col]), docs[text_col])
        )
        self._k = k
        self.index: Dict[int, np.ndarray] = {}

    def _sh(self, i: int) -> np.ndarray:
        s = self.index.get(i)
        if s is None:
            s = self.index[i] = _shingles(self._texts[i], self._k)
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ida = batch["id_a"].to_pylist()
        idb = batch["id_b"].to_pylist()
        jac = np.empty(len(ida))
        for i, (x, y) in enumerate(zip(ida, idb)):
            sx, sy = self._sh(int(x)), self._sh(int(y))
            inter = np.intersect1d(sx, sy, assume_unique=True).size
            union = sx.size + sy.size - inter
            jac[i] = inter / union if union else 1.0
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "jaccard": pa.array(round_half_away(jac, 6)),
            }
        )


def _verify_pairs_partitioned(
    cand: rd.Dataset,
    docs: rd.Dataset,
    text_col: str,
    id_col: str,
    k: int,
    num_buckets: int,
) -> rd.Dataset:
    """Partitioned Jaccard verification, docs shuffled ONCE.

    Phase 1 (co-locate by owner-id hash): each candidate pair is split
    into two HALF rows — one keyed by id_a, one by id_b — and unioned
    with the docs table keyed by doc_id.  Inside each bucket, only the
    docs local pairs reference are shingled (lazy; candidates ≪
    corpus) and each half row picks up its side's shingle hashes as a
    binary payload (``np.uint64.tobytes`` — no nested Arrow types
    cross the shuffle).

    Phase 2 (co-locate by pair hash): the two halves of every pair
    meet; exact Jaccard from the two payloads.

    The corpus text crosses the wire exactly once (phase 1); phase 2
    moves only candidate halves — the round-1 whole-corpus broadcast
    (review finding #2) is gone and, unlike a two-pass
    attach-per-side design, so is the second docs shuffle.
    """

    def tag_half(owner_col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id_a": pc.cast(t["id_a"], pa.int64()),
                    "id_b": pc.cast(t["id_b"], pa.int64()),
                    text_col: pa.nulls(t.num_rows, pa.string()),
                    "_owner": pc.cast(t[owner_col], pa.int64()),
                    "_side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return fn

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.nulls(t.num_rows, pa.int64()),
                "id_b": pa.nulls(t.num_rows, pa.int64()),
                text_col: t[text_col],
                "_owner": pc.cast(t[id_col], pa.int64()),
                "_side": pa.array(np.full(t.num_rows, 2, dtype=np.int8)),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t["_owner"].to_numpy(zero_copy_only=False).astype(np.int64)
        mixed = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        g = (mixed % np.uint64(num_buckets)).astype(np.int64)
        out = t.append_column("_g", pa.array(g))
        if out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    both = (
        cand.map_batches(tag_half("id_a", 0), batch_format="pyarrow")
        .union(cand.map_batches(tag_half("id_b", 1), batch_format="pyarrow"))
        .union(
            docs.select_columns([id_col, text_col]).map_batches(
                tag_docs, batch_format="pyarrow"
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
    )

    def attach(df: pd.DataFrame) -> pa.Table:
        # typed Arrow output (int64 ids, binary shingles) — empty
        # object-dtype pandas columns trip Ray's block-size estimator
        side = df["_side"].to_numpy()
        halves = df[side != 2]
        if not len(halves):
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "_side": pa.array([], pa.int8()),
                    "_sh": pa.array([], pa.binary()),
                }
            )
        d = df[side == 2]
        texts = dict(zip(d["_owner"].astype(np.int64), d[text_col]))
        cache: Dict[int, bytes] = {}

        def sh_bytes(i: int) -> bytes:
            b = cache.get(i)
            if b is None:
                b = cache[i] = _shingles(texts[i], k).tobytes()
            return b

        return pa.table(
            {
                "id_a": pa.array(
                    halves["id_a"].to_numpy().astype(np.int64)
                ),
                "id_b": pa.array(
                    halves["id_b"].to_numpy().astype(np.int64)
                ),
                "_side": pa.array(
                    halves["_side"].to_numpy().astype(np.int8)
                ),
                "_sh": pa.array(
                    [
                        sh_bytes(int(i))
                        for i in halves["_owner"].to_numpy()
                    ],
                    pa.binary(),
                ),
            }
        )

    halves = both.groupby("_g").map_groups(attach, batch_format="pandas")

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = a * np.uint64(0x9E3779B97F4A7C15) + b
        g = (mixed % np.uint64(num_buckets)).astype(np.int64)
        out = t.append_column("_pg", pa.array(g))
        if out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        df = df.sort_values(["id_a", "id_b", "_side"], kind="mergesort")
        sh = df["_sh"].to_numpy()
        ida = df["id_a"].to_numpy()
        idb = df["id_b"].to_numpy()
        n_pairs = len(df) // 2
        out_a = np.empty(n_pairs, dtype=np.int64)
        out_b = np.empty(n_pairs, dtype=np.int64)
        jac = np.empty(n_pairs)
        for i in range(n_pairs):
            r = 2 * i
            assert ida[r] == ida[r + 1] and idb[r] == idb[r + 1]
            x = np.frombuffer(sh[r], dtype=np.uint64)
            y = np.frombuffer(sh[r + 1], dtype=np.uint64)
            inter = np.intersect1d(x, y, assume_unique=True).size
            union = x.size + y.size - inter
            out_a[i] = ida[r]
            out_b[i] = idb[r]
            jac[i] = inter / union if union else 1.0
        return pd.DataFrame(
            {
                "id_a": out_a,
                "id_b": out_b,
                "jaccard": round_half_away(jac, 6),
            }
        )

    return (
        halves.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pg")
        .map_groups(
            lambda df: score(df.drop(columns=["_pg"])),
            batch_format="pandas",
        )
    )


def minhash_near_dups(
    docs: rd.Dataset,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    verify: str = "partitioned",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Near-duplicate pairs with exact-verified word-shingle Jaccard ≥
    threshold; candidates from banded MinHash-LSH.

    Detection probability at j=0.8 with 16 bands × 4 rows is
    1-(1-0.8^4)^16 ≈ 0.9998 — effectively exhaustive at the threshold;
    tested against brute force in tests/test_dedup.py.

    ``verify="partitioned"`` (default) verifies candidates against
    id-hash-partitioned shingle state (docs shuffled once, pair halves
    re-joined by pair hash — :func:`_verify_pairs_partitioned`); no
    worker or driver ever holds the whole corpus.
    ``verify="broadcast"`` is the small-corpus fast path: one
    ``ray.put`` of the (id, text) table with a lazy per-process
    shingle cache.
    """
    sigs = docs.map_batches(
        _minhash_fn(text_col, id_col, k, num_perm),
        batch_format="pyarrow",
        batch_size=4096,
    )
    cand = lsh_candidate_pairs(sigs, num_perm, bands, id_col)

    if verify == "broadcast":
        small = docs.select_columns([id_col, text_col]).to_pandas()
        docs_ref = ray.put(small)
        vkey = ("jaccard_verify", docs_ref.hex(), k)

        def verify_fn(batch: pa.Table) -> pa.Table:
            v = process_cached(
                vkey,
                lambda: JaccardVerifier(docs_ref, text_col, id_col, k),
            )
            return v(batch)

        verified = cand.map_batches(
            verify_fn, batch_format="pyarrow", batch_size=8192
        )
        return verified.filter(expr=f"jaccard >= {threshold}")
    if verify != "partitioned":
        raise ValueError(f"unknown verify mode {verify!r}")

    verified = _verify_pairs_partitioned(
        cand, docs, text_col, id_col, k, num_buckets
    )
    return verified.filter(expr=f"jaccard >= {threshold}")


def brute_force_jaccard_pairs(
    df: pd.DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> pd.DataFrame:
    """Exhaustive oracle for tests (driver-side, small inputs only)."""
    ids = df[id_col].to_numpy()
    sh = [_shingles(t, k) for t in df[text_col]]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = np.intersect1d(sh[i], sh[j], assume_unique=True).size
            union = sh[i].size + sh[j].size - inter
            jac = inter / union if union else 1.0
            if jac >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                rows.append((a, b, float(round_half_away(np.float64(jac), 6))))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def minhash_clusters(
    docs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_rounds: int = 20,
    distributed: bool = True,
    coarse_buckets: int = 64,
) -> rd.Dataset:
    """Near-duplicate CLUSTERS via LSH-bucket label propagation.

    Pairwise enumeration is quadratic in cluster size — a corpus where
    one document has 10^4 near-copies produces 10^8 pairs from one
    cluster.  Dedup does not need the pairs: it needs connected
    components of the LSH-bucket graph.  Min-label propagation over
    (bucket → members) edges converges in O(cluster diameter) rounds,
    each a vectorized pass — total work linear in bands × docs
    (the guide's candidate-graph → connected-components pattern).

    Edges are shared-LSH-bucket (estimated-similarity) links; clusters
    are therefore approximate in the same way candidates are.  By
    default the propagation runs distributed
    (:func:`label_propagation_ds` — the edge table never leaves the
    cluster); ``distributed=False`` collects the (bucket_key, id)
    arrays to the driver instead (~16 int64s per doc — cheaper fixed
    cost below ~10^7 docs, a memory wall above ~10^8).

    Returns (id_col, cluster_id) — cluster_id is the min doc id of the
    component.
    """
    sigs = docs.map_batches(
        _minhash_fn(text_col, id_col, k, num_perm),
        batch_format="pyarrow",
        batch_size=4096,
    )
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:  # empty block: (0, 0) sig matrix has no band cols
            return pa.table(
                {"bkey": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64())}
            )
        s = _sig_matrix(batch["sig"])
        outb, outi = [], []
        for bnd in range(bands):
            chunk = s[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            h = np.full(n, np.uint64(bnd + 1), dtype=np.uint64)
            for j in range(rows_per_band):
                h = h * np.uint64(1099511628211) + chunk[:, j]
            outb.append(h.astype(np.int64))
            outi.append(ids)
        return pa.table(
            {"bkey": np.concatenate(outb), id_col: np.concatenate(outi)}
        )

    ex = sigs.map_batches(explode, batch_format="pyarrow")
    if distributed:
        return label_propagation_ds(
            ex, id_col=id_col, key_col="bkey",
            max_rounds=max_rounds, coarse_buckets=coarse_buckets,
        )
    exdf = ex.to_pandas()
    out = label_propagation(
        exdf["bkey"].to_numpy(), exdf[id_col].to_numpy().astype(np.int64),
        max_rounds,
    )
    out = out.rename(columns={"id": id_col})
    return rd.from_pandas(out)


def _propagate(
    b_idx: np.ndarray,
    d_idx: np.ndarray,
    n_buckets: int,
    label: np.ndarray,
    max_rounds: int = 20,
) -> np.ndarray:
    """Seeded min-label propagation over a bipartite (bucket ↔ member)
    edge list given as unique-index arrays; fully vectorized per round,
    converges in O(component diameter) rounds.  ``label`` is the
    per-unique-member seed (mutated-free; returns the fixed point)."""
    label = label.copy()
    for _ in range(max_rounds):
        bucket_min = np.full(n_buckets, np.iinfo(np.int64).max)
        np.minimum.at(bucket_min, b_idx, label[d_idx])
        new_label = label.copy()
        np.minimum.at(new_label, d_idx, bucket_min[b_idx])
        if np.array_equal(new_label, label):
            break
        label = new_label
    return label


def label_propagation(
    bucket_keys: np.ndarray, ids: np.ndarray, max_rounds: int = 20
) -> pd.DataFrame:
    """Connected components of the (bucket ↔ member) bipartite graph by
    min-label propagation (driver-side, for corpora whose edge table
    fits one worker).  Returns (id, cluster_id=min id of component)."""
    ukeys, b_idx = np.unique(bucket_keys, return_inverse=True)
    uids, d_idx = np.unique(ids, return_inverse=True)
    label = _propagate(b_idx, d_idx, len(ukeys), uids, max_rounds)
    return pd.DataFrame({"id": uids, "cluster_id": label})


def label_propagation_ds(
    edges: rd.Dataset,
    id_col: str = "doc_id",
    key_col: str = "bkey",
    max_rounds: int = 20,
    coarse_buckets: int = 64,
) -> rd.Dataset:
    """Distributed connected components of the (bucket ↔ member) edge
    Dataset — NOTHING materializes on the driver.

    Each round co-locates the edge rows three times by
    ``hash(x) % coarse_buckets`` and runs a SEEDED in-memory
    propagation (:func:`_propagate`) over each coarse group's subgraph
    — one vectorized call per group, group count bounded by
    ``coarse_buckets``, never by #buckets or #ids:

    1. **bucket phase** (route by LSH bucket key): every bucket's rows
       meet, labels cross bucket edges;
    2. **id phase** (route by member id): every id's rows meet, labels
       become per-id consistent;
    3. **pointer-doubling phase**: ``label[i] := label[label[i]]``,
       implemented as a bucket-join (state rows routed by
       ``hash(label)`` meet index rows ``(id, label)`` routed by
       ``hash(id)``); path-shaped label chains halve per round, so a
       100-link chain converges in ~7 rounds where plain hash-to-min
       needs ~50.

    Every step is sound: labels move only along real edges, and
    doubling rewrites ``i → label[L]`` where both facts (``i ~ L``,
    ``L ~ label[L]``) were edge-derived.  Labels are monotone
    non-increasing (``label[j] ≤ j`` invariantly), so the per-round
    edge-label sum is a convergence certificate: if a full round
    leaves the sum unchanged, phases 1+2 were at fixed point ⇒ labels
    are bucket-consistent and id-consistent ⇒ constant on connected
    components and equal to the component min — identical to the
    driver-side :func:`label_propagation` fixed point.

    The iterated state is the edge table (~3 int64s per band×doc),
    spread across the cluster and re-materialized per round — the
    distributed replacement for round 1's driver-side ``to_pandas()``
    label propagation (review finding #1).

    Returns (id_col, cluster_id).
    """
    assert coarse_buckets >= 1

    def init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: ids,
                "label": ids,
            }
        )

    def group_key_of(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            # fibonacci-mix before the modulo: band hashes are already
            # uniform, but sequential doc ids are not
            mixed = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            g = mixed % np.uint64(coarse_buckets)
            out = batch.append_column("_g", pa.array(g.astype(np.int64)))
            # feeding a shuffle: drop pandas metadata (functions/blocks.py)
            if out.schema.metadata:
                out = out.replace_schema_metadata(None)
            return out

        return fn

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        labels_in = df["label"].to_numpy()
        ukeys, b_idx = np.unique(df[key_col].to_numpy(), return_inverse=True)
        uids, d_idx = np.unique(df[id_col].to_numpy(), return_inverse=True)
        seed = np.full(len(uids), np.iinfo(np.int64).max)
        np.minimum.at(seed, d_idx, labels_in)
        label = _propagate(b_idx, d_idx, len(ukeys), seed)
        out = df.drop(columns=["_g"]).copy()
        out["label"] = label[d_idx]
        return out

    def tag_for_doubling(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        labels = batch["label"].to_numpy(zero_copy_only=False)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        # queries: real state rows, routed by their label
        # index: per-batch distinct (id, min label), routed by id; key
        # column is unused for index rows (side flag distinguishes)
        order = np.argsort(ids, kind="stable")
        sid, slab = ids[order], labels[order]
        first = np.ones(len(sid), dtype=bool)
        first[1:] = sid[1:] != sid[:-1]
        if len(sid):
            # per-id MIN label (labels are per-id consistent after the
            # id phase; the reduceat is belt-and-braces)
            starts = np.nonzero(first)[0]
            slab = slab.copy()
            slab[first] = np.minimum.reduceat(slab, starts)
        q = pa.table(
            {
                key_col: keys,
                id_col: pa.array(ids),
                "label": pa.array(labels),
                "_route": pa.array(labels),
                "_side": pa.array(
                    np.zeros(len(ids), dtype=np.int8)
                ),
            }
        )
        ix = pa.table(
            {
                key_col: pa.array(np.zeros(int(first.sum()), dtype=keys.dtype)),
                id_col: pa.array(sid[first]),
                "label": pa.array(slab[first]),
                "_route": pa.array(sid[first]),
                "_side": pa.array(
                    np.ones(int(first.sum()), dtype=np.int8)
                ),
            }
        )
        return pa.concat_tables([q, ix])

    def double_in_group(df: pd.DataFrame) -> pd.DataFrame:
        is_ix = df["_side"].to_numpy() == 1
        ix = df[is_ix]
        q = df[~is_ix]
        # label[label[i]]: map each query's label through the index;
        # min-combine duplicate index entries for safety
        lut = (
            ix.groupby(id_col)["label"].min()
            if len(ix)
            else pd.Series(dtype=np.int64)
        )
        new = lut.reindex(q["label"].to_numpy())
        out = q.drop(columns=["_g", "_route", "_side"]).copy()
        vals = new.to_numpy()
        keep = np.isnan(vals)
        out["label"] = np.where(
            keep, out["label"].to_numpy(), np.nan_to_num(vals)
        ).astype(np.int64)
        return out

    def route_doubling(batch: pa.Table) -> pa.Table:
        v = batch["_route"].to_numpy(zero_copy_only=False).astype(np.int64)
        mixed = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        g = mixed % np.uint64(coarse_buckets)
        out = batch.append_column("_g", pa.array(g.astype(np.int64)))
        if out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    state = edges.map_batches(init, batch_format="pyarrow").materialize()
    prev_sum = None
    for _ in range(max_rounds):
        for col in (key_col, id_col):
            state = (
                state.map_batches(group_key_of(col), batch_format="pyarrow")
                .groupby("_g")
                .map_groups(contract, batch_format="pandas")
            )
        state = (
            state.map_batches(tag_for_doubling, batch_format="pyarrow")
            .map_batches(route_doubling, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(double_in_group, batch_format="pandas")
        )
        state = state.materialize()
        cur_sum = state.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, "label"]].drop_duplicates(id_col)
        return out.rename(columns={"label": "cluster_id"})

    # rows of one id can span blocks — one id-keyed pass dedups exactly
    return (
        state.map_batches(group_key_of(id_col), batch_format="pyarrow")
        .groupby("_g")
        .map_groups(
            lambda df: finish(df.drop(columns=["_g"])),
            batch_format="pandas",
        )
    )


def minhash_dedup_keep(
    docs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> rd.Dataset:
    """Survivors after near-dup clustering: the min-id doc per cluster
    (deterministic, mirrors exact_dedup's survivor rule)."""
    clusters = minhash_clusters(docs, text_col, id_col, **kwargs)

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[id_col] == df["cluster_id"]][[id_col]]

    # survivor selection is a stateless per-row predicate — no coalesce
    return clusters.map_batches(survivors, batch_format="pandas")


def pair_edges_fn(id_col: str = "doc_id"):
    """(id_a, id_b) pair rows → bipartite (bkey, id) edge rows for
    :func:`label_propagation_ds`: each pair becomes a synthetic
    two-member bucket keyed by a mix of both ids (64-bit, collision
    probability ~n²/2^64 — a collision could only ever merge two
    components, never split one)."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bkey = (
            (a * np.uint64(0x9E3779B97F4A7C15) + b)
            ^ (b * np.uint64(0xC2B2AE3D27D4EB4F))
        ).astype(np.int64)
        return pa.table(
            {
                "bkey": np.concatenate([bkey, bkey]),
                id_col: np.concatenate(
                    [a.astype(np.int64), b.astype(np.int64)]
                ),
            }
        )

    return fn


def clusters_from_pairs(
    pairs: rd.Dataset,
    all_ids: rd.Dataset,
    id_col: str = "doc_id",
    coarse_buckets: int = 64,
) -> rd.Dataset:
    """Connected components over an exact-verified pair Dataset,
    extended to every id in ``all_ids`` (ids touching no pair stay
    singletons).  Returns (id_col, cluster_id = component min id).

    Distributed throughout: pair edges → :func:`label_propagation_ds`,
    then one id-bucketed min-merge folds the singleton base in."""
    edges = pairs.map_batches(pair_edges_fn(id_col), batch_format="pyarrow")
    labeled = label_propagation_ds(
        edges, id_col=id_col, key_col="bkey", coarse_buckets=coarse_buckets
    )

    def selfc(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: ids, "cluster_id": ids})

    base = all_ids.select_columns([id_col]).map_batches(
        selfc, batch_format="pyarrow"
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        g = ((v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(
            coarse_buckets
        )
        return batch.append_column("_g", pa.array(g.astype(np.int64)))

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(id_col, as_index=False)["cluster_id"].min()
        )
        return out

    return (
        base.union(labeled)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(
            lambda df: min_label(df.drop(columns=["_g"])),
            batch_format="pandas",
        )
    )


def minhash_dedup_keep_verified(
    docs: rd.Dataset,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    coarse_buckets: int = 64,
    **kwargs,
) -> rd.Dataset:
    """Survivors after VERIFIED near-dup clustering: components of the
    exact-Jaccard-verified pair graph (``minhash_near_dups``), min-id
    doc kept per component.

    Unlike :func:`minhash_dedup_keep` (bucket-graph components — linear
    even when one doc has 10^4 copies, but edges are estimated), every
    edge here passed an exact shingle-Jaccard ≥ threshold check, which
    makes the result SQL-expressible: the DuckDB oracle takes the
    recursive closure of the brute-force pair set
    (:func:`minhash_keep_verified_sql`).  Detection ≈ 1 at the
    threshold (1-(1-0.8^4)^16 ≈ 0.9998 per pair), so engine ≡ oracle."""
    pairs = minhash_near_dups(
        docs, threshold, text_col, id_col, **kwargs
    )
    clusters = clusters_from_pairs(
        pairs, docs, id_col, coarse_buckets
    )

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[id_col] == df["cluster_id"]][[id_col]]

    return clusters.map_batches(survivors, batch_format="pandas")


def minhash_keep_verified_sql(threshold: float = 0.8, k: int = 3) -> str:
    """DuckDB twin of :func:`minhash_dedup_keep_verified`: recursive
    closure over the brute-force shingle-Jaccard pair set; a doc is
    removed iff some smaller id is reachable."""
    pairs = minhash_pairs_oracle_sql(threshold, k)
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({pairs}) p
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
removed AS (
  SELECT u FROM reach GROUP BY u HAVING MIN(v) < u
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT u FROM removed)
"""


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard pairs — exhaustive over a bounded subset,
# SQL-twinnable (the oracle cross-joins with list_intersect), so the
# exact-similarity math gets a value-level correctness gate that the
# LSH paths (sampling-based candidate generation) cannot provide.
# ---------------------------------------------------------------------------


class WordJaccardScorer:
    """Actor: broadcast word-set index for the subset; each batch of
    left docs scores against every subset doc (blocked all-pairs)."""

    def __init__(self, docs_ref, text_col: str, id_col: str,
                 threshold: float):
        docs = ray.get(docs_ref)
        self.ids = docs[id_col].to_numpy()
        self.sets = [
            np.unique(np.asarray(t.split(" "), dtype=object))
            for t in docs[text_col]
        ]
        self.sizes = np.array([s.size for s in self.sets])
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        for i, t in zip(ids, texts):
            s = np.unique(np.asarray(t.split(" "), dtype=object))
            for j in range(len(self.ids)):
                other = int(self.ids[j])
                if other <= int(i):
                    continue  # emit each unordered pair once (a < b)
                inter = np.intersect1d(s, self.sets[j],
                                       assume_unique=True).size
                union = s.size + self.sizes[j] - inter
                jac = inter / union if union else 1.0
                if jac >= self.threshold:
                    out_a.append(int(i))
                    out_b.append(other)
                    out_j.append(float(round_half_away(np.float64(jac), 6)))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )


def word_jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    max_id: int = 400,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact word-set Jaccard over doc pairs with id < max_id (bounded
    subset keeps the O(n²) honest; LSH is the path for the full set)."""
    subset = docs.filter(expr=f"{id_col} < {max_id}")
    small = subset.select_columns([id_col, text_col]).to_pandas()
    ref = ray.put(small)
    key = ("word_jaccard", ref.hex(), threshold)

    def score_fn(batch: pa.Table) -> pa.Table:
        sc = process_cached(
            key,
            lambda: WordJaccardScorer(ref, text_col, id_col, threshold),
        )
        return sc(batch)

    return subset.map_batches(
        score_fn, batch_format="pyarrow", batch_size=256
    )


def word_jaccard_pairs_sql(threshold: float = 0.5, max_id: int = 400) -> str:
    return f"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(
         len(list_intersect(a.ws, b.ws))
         / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))::DOUBLE,
       6) AS jaccard
FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      FROM documents WHERE doc_id < {max_id}) a
JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      FROM documents WHERE doc_id < {max_id}) b
  ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.ws, b.ws))
      / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))::DOUBLE
      >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash per doc; near-dup bucketing by splitting the hash
    into (hamming_k + 1) blocks — pigeonhole: any pair within hamming
    distance k shares at least one exact block.

    Vectorized batch path: one Arrow lowercase+split, one amortized
    word hash, per-bit majority via ``np.add.reduceat`` over the flat
    word array — no per-document Python loop.

    ``word_hash="duckdb"`` swaps the native buffer-level word hash for
    DuckDB's vectorized ``hash()`` kernel (still one call per batch).
    With that hash the whole signature — and therefore the near-dup
    pair set — is reproducible in SQL (:func:`simhash_pairs_oracle_sql`),
    which value-gates the pipeline (split, majority, block bucketing,
    pair distinct, hamming filter).  Native remains the default."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        word_hash: str = "native",
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.word_hash = word_hash

    def simhash(self, text: str) -> np.uint64:
        """Single-doc reference implementation (tests/tools)."""
        return np.uint64(self.simhash_batch([text])[0])

    def simhash_batch(self, texts) -> np.ndarray:
        import pyarrow as _pa
        import pyarrow.compute as _pc

        arr = _as_string_array(texts)
        n_docs = len(arr)
        words_list = _pc.split_pattern_regex(_pc.utf8_lower(arr), r"\W+")
        flat_arr = _pc.list_flatten(words_list)
        counts = np.asarray(
            _pc.list_value_length(words_list), dtype=np.int64
        )
        doc_ids = np.repeat(np.arange(n_docs), counts)
        keep = _pc.not_equal(flat_arr, "").to_numpy(zero_copy_only=False)
        # vectorized word hash (no Python round-trip): buffer-level
        # native chain hash, or DuckDB's hash() kernel for the
        # SQL-reproducible oracle configuration
        if self.word_hash == "duckdb":
            from ..functions.sketches import duckdb_hash64

            h_all = duckdb_hash64(flat_arr)
        else:
            h_all = hash64(flat_arr)
        h, doc_ids = h_all[keep], doc_ids[keep]
        counts = np.bincount(doc_ids, minlength=n_docs).astype(np.int64)
        out = np.zeros(n_docs, dtype=np.uint64)
        if len(h) == 0:
            return out
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        # bit-majority per doc: reduceat of each bit column
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)  # (n_words, 64)
        # clip: a trailing empty doc's offset == len(flat), which
        # reduceat rejects; its row is zeroed below anyway
        sums = np.add.reduceat(
            bits, np.minimum(offsets, len(h) - 1), axis=0
        )  # (n_docs, 64)
        # reduceat repeats the previous group for empty docs — zero them
        sums[counts == 0] = 0
        maj = (sums * 2 - counts[:, None]) > 0
        for i in range(64):
            out |= maj[:, i].astype(np.uint64) << np.uint64(i)
        out[counts == 0] = np.uint64(0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow column passed straight through — no to_pylist round-trip
        sh = self.simhash_batch(batch[self.text_col])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(sh.astype(np.int64)),
            }
        )


def simhash_near_dups(
    docs: rd.Dataset,
    hamming_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    distributed: bool = True,
    coarse_buckets: int = 1024,
    word_hash: str = "native",
) -> rd.Dataset:
    """Pairs with simhash hamming distance ≤ hamming_k (EXACT, not
    probabilistic — splitting the 64-bit signature into hamming_k + 1
    blocks guarantees by pigeonhole that every qualifying pair shares
    at least one block, so the candidate set has no false negatives and
    the true hamming distance filters).  Default is the hash-shuffle
    scale path (coarse-bucket co-location + pair-hash distinct);
    ``distributed=False`` coalesces once (faster fixed cost on small
    corpora).  ``word_hash="duckdb"`` makes the result a deterministic
    function a SQL oracle can recompute exactly — see
    :func:`simhash_pairs_oracle_sql`."""
    blocks = hamming_k + 1
    width = 64 // blocks

    shkey = ("simhash", text_col, id_col, word_hash)

    def simhash_fn(batch: pa.Table) -> pa.Table:
        sh = process_cached(
            shkey, lambda: SimHasher(text_col, id_col, word_hash=word_hash)
        )
        return sh(batch)

    sigs = docs.map_batches(
        simhash_fn, batch_format="pyarrow", batch_size=4096
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        outs = []
        for b in range(blocks):
            block = (sh >> np.uint64(b * width)) & np.uint64(
                (1 << width) - 1
            )
            outs.append(
                pa.table(
                    {
                        "block": np.full(len(ids), b, dtype=np.int64),
                        "bval": block.astype(np.int64),
                        id_col: ids,
                        "simhash": sh.astype(np.int64),
                    }
                )
            )
        return pa.concat_tables(outs)

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(["block", "bval"], keep=False)]
        if dup.empty:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "hamming": []}
            ).astype("int64")
        m = dup.merge(dup, on=["block", "bval"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        x = m[f"simhash_x"].to_numpy().astype(np.uint64)
        y = m[f"simhash_y"].to_numpy().astype(np.uint64)
        ham = _popcount64(x ^ y)
        out = pd.DataFrame(
            {
                "id_a": m[f"{id_col}_x"].to_numpy(),
                "id_b": m[f"{id_col}_y"].to_numpy(),
                "hamming": ham,
            }
        )
        return out.drop_duplicates(["id_a", "id_b"])

    if not distributed:
        # small-corpus path: one coalesce + one vectorized pass
        uniq = exploded.repartition(1).map_batches(
            lambda df: pairs_in_group(df).drop_duplicates(["id_a", "id_b"]),
            batch_format="pandas",
            batch_size=None,
        )
        return uniq.filter(expr=f"hamming <= {hamming_k}")

    # scale path: co-locate by (block, bval) hash into a bounded number
    # of coarse groups, find pairs vectorized per group, then pair-hash
    # bucketed distinct (a pair can match in several blocks)
    def add_coarse(batch: pa.Table) -> pa.Table:
        blk = batch["block"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bv = batch["bval"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (blk * np.uint64(0x9E3779B97F4A7C15)) ^ (
            bv * np.uint64(1099511628211)
        )
        out = batch.append_column(
            "_c", pa.array((mixed % np.uint64(coarse_buckets)).astype(np.int64))
        )
        if out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    cand = (
        exploded.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_c")
        .map_groups(
            lambda df: pairs_in_group(df.drop(columns=["_c"])),
            batch_format="pandas",
        )
    )
    uniq = distinct_pairs(cand, ("id_a", "id_b"))
    return uniq.filter(expr=f"hamming <= {hamming_k}")


def simhash_pairs_oracle_sql(hamming_k: int = 3) -> str:
    """Recompute the 64-bit simhash signature IN SQL and brute-force
    the hamming-≤k pair set — a value-level oracle for
    ``simhash_near_dups(word_hash="duckdb")``.

    Sound because (a) the engine's block bucketing is pigeonhole-exact
    (no false negatives), so its result IS the brute-force hamming set,
    and (b) with the DuckDB word hash both sides hash identically, so
    the signature is bit-for-bit reproducible: per word-occurrence bit
    b of hash(word), per doc the term-frequency-weighted bit majority
    (strictly-more-ones rule, ties → 0), reassembled as a signed
    BIGINT (bit 63 = sign).  Wordless docs get signature 0 on both
    sides.  O(n²) join: oracle-scale corpora only."""
    sums = ",\n         ".join(
        f"sum(((hash(word) >> {b}) & 1::UBIGINT)::BIGINT) AS s{b}"
        for b in range(64)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN 2*s{b} > cnt THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(63)
    )
    sig_terms += (
        " + (CASE WHEN 2*s63 > cnt THEN (-9223372036854775807 - 1) "
        "ELSE 0 END)"
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '\\w+')) AS word
  FROM documents
),
bits AS (
  SELECT doc_id, count(*) AS cnt,
         {sums}
  FROM w GROUP BY doc_id
),
sigs AS (
  SELECT d.doc_id,
         COALESCE({sig_terms}, 0) AS sig
  FROM documents d LEFT JOIN bits USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {hamming_k}
"""


def minhash_pairs_oracle_sql(threshold: float = 0.8, k: int = 3) -> str:
    """Brute-force k-word-shingle Jaccard pairs in SQL — the exact
    ground truth the LSH path approximates.  Usable as a value-level
    oracle because (a) the MinHash permutations are SEEDED, so the LSH
    candidate set is a deterministic function of the input, and (b) at
    the tested corpus all qualifying pairs sit at j ≥ 0.9 where the
    16-band×4-row detection probability is 1 - 3e-8 — the engine result
    equals ground truth (asserted against brute force in
    tests/test_dedup.py too).  O(n²) in SQL: oracle-scale corpora only.
    """
    words = "regexp_extract_all(lower(text), '\\w+')"
    gram = " || ' ' || ".join(
        f"{words}[i+{j}]" for j in range(k)
    )
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, len({words}) - {k - 2}),
             i -> {gram}
           )
         ) AS s
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.s, b.s))
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE,
             6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE
      >= {threshold}
"""


def cross_corpus_near_dups(
    corpus_a: rd.Dataset,
    corpus_b: rd.Dataset,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_offset_b: int = 1 << 40,
    **minhash_kwargs,
) -> rd.Dataset:
    """Near-duplicate pairs ACROSS two corpora (e.g. new crawl vs an
    existing corpus, or corpus vs benchmark set — doc-level semantic
    decontamination): union the corpora under a disjoint id space, run
    the standard MinHash-LSH → exact-verify path once, and keep only
    pairs that straddle the corpora.  Output ids are restored to each
    corpus's own space plus a ``corpus_b_id`` column; within-corpus
    duplicates are deliberately excluded (run :func:`minhash_near_dups`
    per corpus for those).

    ``id_offset_b`` must exceed every id in ``corpus_a`` (asserted per
    batch); the composition reuses every scale property of the
    underlying path — one shuffle of each corpus, partitioned verify.
    """

    def shift(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= id_offset_b:
            raise ValueError(
                f"{id_col} >= id_offset_b ({id_offset_b}); raise the "
                "offset so the corpora stay disjoint"
            )
        i = t.schema.get_field_index(id_col)
        return t.set_column(
            i, id_col, pa.array(ids + id_offset_b, pa.int64())
        )

    def as_arrow(t: pa.Table) -> pa.Table:
        # normalize block type: a pandas-blocked corpus unioned with
        # the arrow-blocked shifted side trips Ray's batcher inference.
        # Guard corpus_a's id space too: an id >= id_offset_b here
        # would collide with corpus_b's shifted space and silently
        # drop / misattribute cross pairs (round-3 advice finding).
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.max() >= id_offset_b:
            raise ValueError(
                f"corpus_a {id_col} >= id_offset_b ({id_offset_b}); "
                "raise the offset so the corpora stay disjoint"
            )
        return t

    both = corpus_a.select_columns([id_col, text_col]).map_batches(
        as_arrow, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        corpus_b.select_columns([id_col, text_col]).map_batches(
            shift, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    pairs = minhash_near_dups(
        both, threshold=threshold, text_col=text_col, id_col=id_col,
        **minhash_kwargs,
    )

    def cross_only(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy()
        b = df["id_b"].to_numpy()
        # pairs are emitted (lo, hi): cross pairs have lo in corpus A
        # and hi in corpus B's shifted space
        cross = (a < id_offset_b) & (b >= id_offset_b)
        out = pd.DataFrame(
            {
                "doc_id": a[cross],
                "corpus_b_id": b[cross] - id_offset_b,
                "jaccard": df["jaccard"].to_numpy()[cross],
            }
        )
        return out

    return pairs.map_batches(cross_only, batch_format="pandas")


def cross_corpus_pairs_oracle_sql(
    threshold: float = 0.8, k: int = 3
) -> str:
    """Brute-force twin of :func:`cross_corpus_near_dups` over the
    even/odd doc_id split of ``documents`` (the driver's derived
    two-corpus fixture): same shingle definition, pairs restricted to
    one side each, no lo<hi constraint (sides are disjoint)."""
    words = "regexp_extract_all(lower(text), '\\w+')"
    gram = " || ' ' || ".join(f"{words}[i+{j}]" for j in range(k))
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, len({words}) - {k - 2}),
             i -> {gram}
           )
         ) AS s
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.s, b.s))
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE,
             6) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
WHERE len(list_intersect(a.s, b.s))
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE
      >= {threshold}
"""
