"""Exact substring (duplicated-span) deduplication.

Removes every repeated long word-window across documents except one
keeper occurrence — the training-data op published as "exact substring
deduplication" (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022), re-expressed word-level and Ray-Data-first
instead of via a monolithic suffix array:

1. **fingerprint** — one ``map_batches`` pass explodes each doc into
   rolling k-word window fingerprints ``(gram:uint64, doc_id, pos)``;
   the gram hash is a position-weighted combination of buffer-level
   word hashes (`functions.sketches.hash64`), so the text itself never
   leaves the fingerprint stage (16 bytes/window cross the wire, not
   raw text).
2. **find duplicated grams** — per-batch pandas combiner emits one
   partial row per gram ``(keeper occurrence, d_lo, d_hi)``; partials
   are hash-bucketed by gram and reduced per bucket.  A gram is
   duplicated iff ``d_lo != d_hi`` (it occurs in ≥2 distinct docs) —
   the min/max-doc pair is the cheapest mergeable "≥2 distinct" test.
   The keeper is the lexicographically minimal ``(doc_id, pos)``
   occurrence; merging per-batch minima yields the global minimum.
3. **apply removals** — a word position is removed iff some window
   covering it is a non-keeper occurrence of a duplicated gram.
   Broadcast finish (small dup table): ``ray.put`` the sorted gram →
   keeper arrays once, re-derive windows per batch, searchsorted
   lookup, vectorized span-union, Arrow ``binary_join`` rebuild.
   Distributed finish: removal starts come from a bucketed gram join
   (``functions.join.bucket_join``), then docs and their removal rows
   are co-located by a doc-id hash bucket and finished per group —
   no worker ever holds the corpus or the dup table.

Semantics (shared verbatim with the DuckDB twin
``substring_dedup_sql``): words are ``text`` split on a single space;
window ``(d, p)`` covers words ``[p, p+k)``; equality is exact word
sequence (engine: 64-bit gram hash — collision probability over W
windows is ~W²/2⁶⁵, negligible and deterministic); output per doc is
``(doc_id, n_words, n_removed, clean_text)`` with kept words re-joined
by a single space.

Reference analogue: none (the collector has no corpus-level op); this
extends the §2.8 dedup family alongside exact/MinHash/SimHash dedup.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.sketches import hash64

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
# position weights: distinct odd constants so windows are order-sensitive
_GOLD = np.uint64(0x9E3779B97F4A7C15)

_OUT_SCHEMA = {
    "doc_id": "int64",
    "n_words": "int64",
    "n_removed": "int64",
    "clean_text": "object",
}


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series(dtype=t) for c, t in _OUT_SCHEMA.items()}
    )


def _flat_words(texts):
    """Split a batch of texts on single spaces (exact
    ``string_split(text, ' ')`` parity with the SQL twin — empty tokens
    kept).  Returns (flat pyarrow words, word_hashes, doc_offsets,
    word_counts)."""
    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), pa.string())
    words_list = pc.split_pattern(arr, " ")
    flat = pc.list_flatten(words_list)
    counts = np.asarray(pc.list_value_length(words_list), dtype=np.int64)
    h = hash64(flat)
    offsets = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=offsets[1:])
    return flat, h, offsets, counts


def _window_grams(h: np.ndarray, offsets: np.ndarray, counts: np.ndarray,
                  k: int):
    """Rolling k-word gram hashes over the flat word-hash array with doc
    boundaries masked out.  Returns (gram, doc_idx, pos) for every
    window that fits inside one doc — pos is the 0-based word offset
    within its doc."""
    from ..functions.sketches import _splitmix64

    n = len(h)
    ncomb = max(n - k + 1, 0)
    comb = np.zeros(ncomb, dtype=np.uint64)
    # position weights must be non-linear in j: arithmetic-progression
    # multipliers are palindromic (m[j] + m[k-1-j] constant), which
    # makes every window collide with its reverse — caught by the
    # naive-reference property test
    mults = _splitmix64(_GOLD + np.arange(1, k + 1, dtype=np.uint64))
    for j in range(k):
        comb = comb + mults[j] * h[j : ncomb + j]
    doc_of = np.repeat(np.arange(len(counts)), counts)[:ncomb]
    idx = np.arange(ncomb)
    ends = offsets + counts
    if ncomb:
        valid = idx + k - 1 < ends[doc_of]
    else:
        valid = np.zeros(0, dtype=bool)
    d = doc_of[valid]
    return comb[valid], d, idx[valid] - offsets[d]


GRAM_HASH_VERSION = 2
"""Version of the gram/window hash scheme (buffer-level word ``hash64``
combined with splitmix64 position weights).  Bump on ANY change to
:func:`_flat_words` / :func:`_window_grams` semantics or weights: a
persistent gram index stores bare uint64 hashes, so mixing scheme
versions silently compares incompatible gram spaces and dedup quietly
degrades to a no-op (round-3 advice finding).  v2 = the
post-palindrome-fix splitmix64 multipliers."""


def _fingerprint_fn(text_col: str, id_col: str, k: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        _, h, off, cnt = _flat_words(batch[text_col])
        gram, didx, pos = _window_grams(h, off, cnt, k)
        return pa.table(
            {
                "gram": pa.array(gram, pa.uint64()),
                "doc_id": pa.array(ids[didx].astype(np.int64), pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return fn


def _dup_partial_np(
    gram: np.ndarray,
    keep_doc: np.ndarray,
    keep_pos: np.ndarray,
    d_lo: np.ndarray,
    d_hi: np.ndarray,
):
    """Vectorized mergeable reduce per gram: keeper = lexicographic min
    (keep_doc, keep_pos); d_lo/d_hi = min/max doc seen.  One lexsort +
    reduceat — no pandas groupby on the hot path."""
    if not len(gram):
        return (gram,) + tuple(
            np.empty(0, dtype=np.int64) for _ in range(4)
        )
    order = np.lexsort((keep_pos, keep_doc, gram))
    g = gram[order]
    starts = np.empty(len(g), dtype=bool)
    starts[0] = True
    starts[1:] = g[1:] != g[:-1]
    idx = np.flatnonzero(starts)
    return (
        g[idx],
        keep_doc[order][idx],  # first within gram = lexicographic min
        keep_pos[order][idx],
        np.minimum.reduceat(d_lo[order], idx),
        np.maximum.reduceat(d_hi[order], idx),
    )


def _dup_table(gram, keep_doc, keep_pos, d_lo, d_hi,
               bucket: Optional[int] = None) -> pa.Table:
    cols = {
        "gram": pa.array(gram, pa.uint64()),
        "keep_doc": pa.array(keep_doc.astype(np.int64), pa.int64()),
        "keep_pos": pa.array(keep_pos.astype(np.int64), pa.int64()),
        "d_lo": pa.array(d_lo.astype(np.int64), pa.int64()),
        "d_hi": pa.array(d_hi.astype(np.int64), pa.int64()),
    }
    if bucket is not None:
        cols["_b"] = pa.array(
            (gram % np.uint64(bucket)).astype(np.int64), pa.int64()
        )
    return pa.table(cols)


def _as_np(t: pa.Table, col: str, dtype) -> np.ndarray:
    return t[col].to_numpy(zero_copy_only=False).astype(dtype)


def duplicated_grams(
    occ: rd.Dataset, num_buckets: int = 64
) -> rd.Dataset:
    """Occurrence fingerprints → ``(gram, keep_doc, keep_pos)`` for
    every gram that appears in ≥2 distinct docs (min-doc ≠ max-doc is
    the cheapest mergeable "≥2 distinct docs" test).  Combiner-first:
    one partial row per (block, gram) crosses the exchange,
    hash-bucketed by gram so no worker holds the global gram space."""

    def bucketize(t: pa.Table) -> pa.Table:
        doc = _as_np(t, "doc_id", np.int64)
        out = _dup_partial_np(
            _as_np(t, "gram", np.uint64),
            doc,
            _as_np(t, "pos", np.int64),
            doc,
            doc,
        )
        return _dup_table(*out, bucket=num_buckets)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        g, kd, kp, lo, hi = _dup_partial_np(
            _as_np(t, "gram", np.uint64),
            _as_np(t, "keep_doc", np.int64),
            _as_np(t, "keep_pos", np.int64),
            _as_np(t, "d_lo", np.int64),
            _as_np(t, "d_hi", np.int64),
        )
        dup = lo != hi
        return pa.table(
            {
                "gram": pa.array(g[dup], pa.uint64()),
                "keep_doc": pa.array(kd[dup], pa.int64()),
                "keep_pos": pa.array(kp[dup], pa.int64()),
            }
        )

    return (
        occ.map_batches(
            bucketize, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .groupby("_b")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def _apply_removals(
    texts, ids: np.ndarray, rm_doc: np.ndarray, rm_pos: np.ndarray, k: int
) -> pd.DataFrame:
    """Finish kernel shared by both paths: given docs and their
    non-keeper duplicated-window START positions, union the covered
    spans and rebuild clean text (kept words re-joined by ' ')."""
    flat, _, off, cnt = _flat_words(texts)
    n_flat = len(flat)
    # doc_id value → batch-local index
    order = np.argsort(ids, kind="stable")
    pos_in_sorted = np.searchsorted(ids[order], rm_doc)
    if len(pos_in_sorted) and (
        pos_in_sorted.max() >= len(order)
        or not (ids[order][pos_in_sorted] == rm_doc).all()
    ):
        missing = np.setdiff1d(rm_doc, ids)
        raise ValueError(
            "removal rows reference docs absent from this group "
            f"(co-location contract violated): {missing[:5].tolist()}"
        )
    loc = order[pos_in_sorted]
    # covered flat indices: off[doc] + pos + j for j in [0, k)
    starts = off[loc] + rm_pos
    removed = np.zeros(n_flat, dtype=bool)
    if len(starts):
        cover = (starts[:, None] + np.arange(k)[None, :]).ravel()
        removed[cover] = True
    kept = ~removed
    kept_doc = np.repeat(np.arange(len(cnt)), cnt)[kept]
    cnt_kept = np.bincount(kept_doc, minlength=len(cnt)).astype(np.int64)
    new_off = np.zeros(len(cnt) + 1, dtype=np.int64)
    np.cumsum(cnt_kept, out=new_off[1:])
    flat_kept = flat.filter(pa.array(kept))
    lists = pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32() if n_flat < 2**31 else pa.int64()),
        flat_kept,
    )
    clean = pc.binary_join(lists, " ")
    return pd.DataFrame(
        {
            "doc_id": ids.astype(np.int64),
            "n_words": cnt,
            "n_removed": cnt - cnt_kept,
            "clean_text": clean.to_pandas().astype(object),
        }
    )


def substring_dedup(
    docs: rd.Dataset,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    distributed: Optional[bool] = None,
) -> rd.Dataset:
    """Cross-doc duplicated k-word-window removal →
    ``(doc_id, n_words, n_removed, clean_text)``.

    ``distributed=None`` → the estimator picks the finish from the
    size of the DUP-GRAM table itself (the actual broadcast side —
    input size is the wrong proxy here: a 100 TB corpus with sparse
    duplication still has a worker-sized dup table, and broadcasting
    it avoids two co-location shuffles): broadcast when it fits,
    else bucketed joins so nothing corpus-sized lands anywhere.  The
    fingerprint pass is re-run per consumer (text is read twice) —
    the streaming trade over materializing the occurrence table.
    """
    from .aggregate import AUTO_DISTRIBUTED_BYTES

    occ = docs.map_batches(
        _fingerprint_fn(text_col, id_col, k),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    dup = duplicated_grams(occ, num_buckets=num_buckets)

    if distributed is None:
        dup = dup.materialize()  # reduced table; reused by either path
        # 24 B/row (u64 gram + i64 doc + i64 pos); worker-heap bound
        distributed = dup.count() * 24 > AUTO_DISTRIBUTED_BYTES

    if distributed:
        return _finish_distributed(
            docs, occ, dup, k, text_col, id_col, num_buckets
        )
    return _finish_broadcast(docs, dup, k, text_col, id_col)


def _finish_broadcast(
    docs: rd.Dataset, dup: rd.Dataset, k: int, text_col: str, id_col: str
) -> rd.Dataset:
    dup_df = dup.to_pandas()  # bounded: one row per duplicated gram
    if "gram" not in dup_df.columns:  # fully-empty Dataset drops schema
        dup_df = pd.DataFrame(
            {
                "gram": pd.Series(dtype="uint64"),
                "keep_doc": pd.Series(dtype="int64"),
                "keep_pos": pd.Series(dtype="int64"),
            }
        )
    g = dup_df["gram"].to_numpy().astype(np.uint64)
    order = np.argsort(g, kind="stable")
    ref = ray.put(
        (
            g[order],
            dup_df["keep_doc"].to_numpy()[order],
            dup_df["keep_pos"].to_numpy()[order],
        )
    )

    def finish(batch: pa.Table) -> pd.DataFrame:
        grams_s, keep_doc, keep_pos = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, h, off, cnt = _flat_words(batch[text_col])
        gram, didx, pos = _window_grams(h, off, cnt, k)
        if len(grams_s) and len(gram):
            j = np.searchsorted(grams_s, gram)
            j = np.clip(j, 0, len(grams_s) - 1)
            hit = grams_s[j] == gram
            not_keeper = (ids[didx] != keep_doc[j]) | (pos != keep_pos[j])
            rm = hit & not_keeper
        else:
            rm = np.zeros(len(gram), dtype=bool)
        return _apply_removals(
            batch[text_col], ids, ids[didx[rm]], pos[rm], k
        )

    return docs.map_batches(
        finish, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def _finish_distributed(
    docs: rd.Dataset,
    occ: rd.Dataset,
    dup: rd.Dataset,
    k: int,
    text_col: str,
    id_col: str,
    num_buckets: int,
) -> rd.Dataset:
    from ..functions.bloom import bloom_prefilter, build_bloom
    from ..functions.join import bucket_join

    # dup is the small side by construction (one row per duplicated
    # gram) and is consumed twice (bloom build + join) — pin it
    dup = dup.materialize()
    # Bloom over the dup grams, broadcast once: occurrences that miss
    # are DEFINITELY not duplicated and never enter the exchange — at
    # realistic duplication rates this turns the all-to-all from
    # |corpus windows| into |duplicated windows| (the filter only
    # prunes; the bucketed join stays exact)
    bf = build_bloom(dup, "gram", n_keys=max(dup.count(), 1))
    occ_cand = bloom_prefilter(occ, bf, "gram", keep_hits=True)

    joined = bucket_join(occ_cand, dup, on="gram", num_buckets=num_buckets)
    # non-keeper occurrences of duplicated grams → removal starts
    removals = joined.map_batches(
        lambda df: df.loc[
            (df["doc_id"] != df["keep_doc"]) | (df["pos"] != df["keep_pos"]),
            ["doc_id", "pos"],
        ].reset_index(drop=True),
        batch_format="pandas",
    )

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        # build from numpy — indexed Series would align on the block
        # index and fabricate NaN rows after upstream .loc filters
        out = pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy().astype(np.int64),
                "pos": np.full(len(df), -1, dtype=np.int64),
                "text": df[text_col].to_numpy(dtype=object),
            }
        )
        out["_b"] = (
            hash64(out["doc_id"].to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def tag_rm(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "pos": df["pos"].to_numpy().astype(np.int64),
                "text": np.full(len(df), None, dtype=object),
            }
        )
        out["_b"] = (
            hash64(out["doc_id"].to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    both = docs.map_batches(tag_docs, batch_format="pandas").union(
        removals.map_batches(tag_rm, batch_format="pandas")
    )

    def finish_bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_doc = df["pos"].to_numpy() < 0
        if not is_doc.any():
            return _empty_out()
        d = df[is_doc]
        r = df[~is_doc]
        texts = pa.array(d["text"].to_numpy(), pa.string())
        return _apply_removals(
            texts,
            d["doc_id"].to_numpy(),
            r["doc_id"].to_numpy(),
            r["pos"].to_numpy(),
            k,
        )

    return both.groupby("_b").map_groups(
        lambda df: finish_bucket(df.drop(columns=["_b"])),
        batch_format="pandas",
    )


# --------------------------------------------------------------------------
# deterministic planted corpus + DuckDB twin


PASSAGE_A = (
    "shared passage alpha beta gamma delta epsilon zeta eta theta"
)
PASSAGE_B = (
    "common boilerplate one two three four five six seven eight nine"
)


def plant_passages(docs: rd.Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> rd.Dataset:
    """Deterministically derive a corpus with cross-doc duplicated
    spans (the synthetic documents table has no natural long repeats):
    docs with ``doc_id % 5 == 2`` get PASSAGE_A appended, docs with
    ``doc_id % 7 == 3`` get PASSAGE_B prepended (append first, then
    prepend — a doc can get both).  The SQL twin applies the identical
    CASE chain, so the gate is non-vacuous by construction."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        txt = batch[text_col].to_pandas().astype(object)
        m_a = (ids % 5) == 2
        if m_a.any():
            txt[m_a] = txt[m_a] + (" " + PASSAGE_A)
        m_b = (ids % 7) == 3
        if m_b.any():
            txt[m_b] = (PASSAGE_B + " ") + txt[m_b]
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, pa.array(txt, pa.string()))

    return docs.map_batches(fn, batch_format="pyarrow")


def substring_dedup_sql(k: int = 8, planted: bool = True) -> str:
    """DuckDB value oracle mirroring ``substring_dedup`` over
    (optionally planted) ``documents``: same space split, same window
    rule, same keeper rule (lexicographic min (doc_id, pos)), same
    position-union removal, same re-join."""
    src = (
        f"""
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 3
                    THEN '{PASSAGE_B}' || ' ' ||
                         CASE WHEN doc_id % 5 = 2
                              THEN text || ' ' || '{PASSAGE_A}'
                              ELSE text END
                    WHEN doc_id % 5 = 2
                    THEN text || ' ' || '{PASSAGE_A}'
                    ELSE text END AS text
        FROM documents
        """
        if planted
        else "SELECT doc_id, text FROM documents"
    )
    return f"""
WITH src AS ({src}),
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM src
),
occ AS (
  SELECT doc_id,
         unnest(generate_series(1, len(w) - {k} + 1)) AS i,
         w
  FROM words
),
occ2 AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(w[i : i + {k} - 1], ' ') AS gram
  FROM occ
),
dup AS (
  SELECT gram,
         min(doc_id * 4294967296 + pos) AS keep_key
  FROM occ2
  GROUP BY gram
  HAVING count(DISTINCT doc_id) >= 2
),
removals AS (
  SELECT o.doc_id, o.pos
  FROM occ2 o JOIN dup USING (gram)
  WHERE o.doc_id * 4294967296 + o.pos <> dup.keep_key
),
removed_pos AS (
  SELECT DISTINCT doc_id,
         pos + unnest(generate_series(0, {k} - 1)) AS wpos
  FROM removals
),
per_word AS (
  SELECT doc_id,
         unnest(generate_series(1, len(w))) - 1 AS wpos,
         w
  FROM words
),
kept AS (
  SELECT p.doc_id, p.wpos, p.w[p.wpos + 1] AS word
  FROM per_word p
  LEFT JOIN removed_pos r
    ON p.doc_id = r.doc_id AND p.wpos = r.wpos
  WHERE r.doc_id IS NULL
),
agg AS (
  SELECT doc_id,
         string_agg(word, ' ' ORDER BY wpos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       len(w.w)::BIGINT AS n_words,
       (len(w.w) - coalesce(a.n_kept, 0))::BIGINT AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM words w LEFT JOIN agg a USING (doc_id)
"""


# --------------------------------------------------------------------------
# incremental substring dedup against a persistent gram index


def _distinct_grams(occ: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Globally-distinct ``(gram)`` rows: per-block np.unique combiner,
    then a bucketed distinct so no worker holds the gram space."""

    def local(t: pa.Table) -> pa.Table:
        g = np.unique(_as_np(t, "gram", np.uint64))
        return pa.table(
            {
                "gram": pa.array(g, pa.uint64()),
                "_b": pa.array(
                    (g % np.uint64(num_buckets)).astype(np.int64)
                ),
            }
        )

    def bucket_distinct(t: pa.Table) -> pa.Table:
        g = np.unique(_as_np(t, "gram", np.uint64))
        return pa.table({"gram": pa.array(g, pa.uint64())})

    return (
        occ.map_batches(
            local, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .groupby("_b")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


def incremental_substring_dedup(
    new_docs: rd.Dataset,
    index_dir: str,
    run_id: str,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    distributed: Optional[bool] = None,
) -> rd.Dataset:
    """Span-dedup a NEW ingest against the persistent gram index of
    every prior ingest, then register the batch's grams — the
    incremental-crawl variant of :func:`substring_dedup`, mirroring
    ``curation.incremental_dedup``'s run-partitioned idempotent layout.

    Semantics: a window whose gram is in the INDEX is always removed
    (its keeper lives in a prior ingest); within-batch duplicates keep
    the lexicographic-min occurrence as usual.  History grams take
    priority when a gram is both indexed and batch-duplicated
    (``anti_join`` drops the in-batch keeper row, so every occurrence
    goes).  The history side is never broadcast whole — occurrences
    are Bloom-prefiltered and only candidate grams enter the exact
    bucketed verify; the index itself is corpus-scale by nature (as is
    a suffix array), stored as one hive partition per run so re-runs
    overwrite themselves.

    Registration stores the ORIGINAL batch's distinct grams: the
    keeper occurrence of every in-batch duplicate survives in this
    ingest, so future batches must dedup against all of them.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from ..functions.join import anti_join, semi_join
    from .aggregate import AUTO_DISTRIBUTED_BYTES

    # The index stores bare uint64 gram hashes: a k or hash-scheme
    # mismatch across ingests would compare disjoint gram spaces and
    # silently match nothing, so the index carries its parameters and
    # every call validates them (round-3 advice finding).
    import json as _json

    meta = {"k": k, "hash_version": GRAM_HASH_VERSION}
    meta_path = _os.path.join(index_dir, "_meta.json")
    if _os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = _json.load(f)
        if existing != meta:
            raise ValueError(
                f"gram index at {index_dir} was built with {existing}; "
                f"this call uses {meta} — incompatible gram spaces "
                "(history would silently match nothing). Use a fresh "
                "index_dir or matching parameters."
            )
    else:
        _os.makedirs(index_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            _json.dump(meta, f)

    run_dir = f"{index_dir}/run={run_id}"
    if _os.path.isdir(run_dir):  # idempotent re-run
        _shutil.rmtree(run_dir)
    history = sorted(
        p
        for p in _glob.glob(f"{index_dir}/run=*/*.parquet")
        if f"/run={run_id}/" not in p
    )

    occ = new_docs.map_batches(
        _fingerprint_fn(text_col, id_col, k),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    batch_grams = _distinct_grams(occ, num_buckets).materialize()
    new_dup = duplicated_grams(occ, num_buckets=num_buckets)

    if history:
        hist = rd.read_parquet(history).select_columns(["gram"])
        hits = semi_join(
            batch_grams, hist, on="gram", prefilter="bloom",
            num_buckets=num_buckets,
        )

        def as_hist_dup(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table(
                {
                    "gram": t["gram"],
                    "keep_doc": pa.array(
                        np.full(n, -1, dtype=np.int64)
                    ),
                    "keep_pos": pa.array(
                        np.full(n, -1, dtype=np.int64)
                    ),
                }
            )

        hist_dup = hits.map_batches(
            as_hist_dup, batch_format="pyarrow", zero_copy_batch=True
        )
        # history keeper wins: drop the in-batch keeper row for grams
        # already indexed, so EVERY new occurrence of them is removed
        new_dup = anti_join(
            new_dup, hist_dup, on="gram", num_buckets=num_buckets
        )
        dup = new_dup.union(hist_dup)
    else:
        dup = new_dup

    if distributed is None:
        dup = dup.materialize()
        distributed = dup.count() * 24 > AUTO_DISTRIBUTED_BYTES

    if distributed:
        out = _finish_distributed(
            new_docs, occ, dup, k, text_col, id_col, num_buckets
        )
    else:
        out = _finish_broadcast(new_docs, dup, k, text_col, id_col)

    batch_grams.write_parquet(run_dir)
    return out


def remove_matching_spans(
    docs: rd.Dataset,
    bench: rd.Dataset,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    distributed: Optional[bool] = None,
) -> rd.Dataset:
    """Span-level decontamination: remove every k-word window of
    ``docs`` that also occurs in ``bench`` (the benchmark/eval corpus)
    — the surgical complement to ``decontam.decontaminate``'s
    drop-the-whole-document policy, built from the substring-dedup
    machinery: the benchmark's distinct grams act as an always-wins
    history (keeper ``(-1,-1)`` matches no real occurrence, so every
    matching doc window is removed).  Output shape matches
    :func:`substring_dedup`.  Within-``docs`` duplication is NOT
    touched here — compose with :func:`substring_dedup` for that."""
    from .aggregate import AUTO_DISTRIBUTED_BYTES

    bench_occ = bench.map_batches(
        _fingerprint_fn(text_col, id_col, k),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )

    def as_history(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "gram": t["gram"],
                "keep_doc": pa.array(np.full(n, -1, dtype=np.int64)),
                "keep_pos": pa.array(np.full(n, -1, dtype=np.int64)),
            }
        )

    dup = _distinct_grams(bench_occ, num_buckets).map_batches(
        as_history, batch_format="pyarrow", zero_copy_batch=True
    )

    if distributed is None:
        dup = dup.materialize()
        distributed = dup.count() * 24 > AUTO_DISTRIBUTED_BYTES

    if distributed:
        occ = docs.map_batches(
            _fingerprint_fn(text_col, id_col, k),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        return _finish_distributed(
            docs, occ, dup, k, text_col, id_col, num_buckets
        )
    return _finish_broadcast(docs, dup, k, text_col, id_col)


def remove_matching_spans_sql(
    k: int = 8, planted: bool = True, bench_mod: int = 25,
    bench_rem: int = 2,
) -> str:
    """DuckDB twin of :func:`remove_matching_spans` over the driver's
    derived fixture: the planted corpus split into bench
    (``doc_id % bench_mod == bench_rem`` — a subset of the PASSAGE_A
    carriers) and corpus (the rest); every corpus window whose word
    sequence occurs anywhere in bench is removed."""
    src = (
        f"""
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 3
                    THEN '{PASSAGE_B}' || ' ' ||
                         CASE WHEN doc_id % 5 = 2
                              THEN text || ' ' || '{PASSAGE_A}'
                              ELSE text END
                    WHEN doc_id % 5 = 2
                    THEN text || ' ' || '{PASSAGE_A}'
                    ELSE text END AS text
        FROM documents
        """
        if planted
        else "SELECT doc_id, text FROM documents"
    )
    return f"""
WITH src AS ({src}),
corpus AS (
  SELECT * FROM src WHERE doc_id % {bench_mod} <> {bench_rem}
),
bench AS (
  SELECT * FROM src WHERE doc_id % {bench_mod} = {bench_rem}
),
bwords AS (SELECT string_split(text, ' ') AS w FROM bench),
bgrams AS (
  SELECT DISTINCT
         array_to_string(w[i : i + {k} - 1], ' ') AS gram
  FROM (
    SELECT w, unnest(generate_series(1, len(w) - {k} + 1)) AS i
    FROM bwords
  )
),
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
),
occ2 AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(w[i : i + {k} - 1], ' ') AS gram
  FROM (
    SELECT doc_id, w,
           unnest(generate_series(1, len(w) - {k} + 1)) AS i
    FROM words
  )
),
removals AS (
  SELECT o.doc_id, o.pos FROM occ2 o JOIN bgrams USING (gram)
),
removed_pos AS (
  SELECT DISTINCT doc_id,
         pos + unnest(generate_series(0, {k} - 1)) AS wpos
  FROM removals
),
per_word AS (
  SELECT doc_id,
         unnest(generate_series(1, len(w))) - 1 AS wpos,
         w
  FROM words
),
kept AS (
  SELECT p.doc_id, p.wpos, p.w[p.wpos + 1] AS word
  FROM per_word p
  LEFT JOIN removed_pos r
    ON p.doc_id = r.doc_id AND p.wpos = r.wpos
  WHERE r.doc_id IS NULL
),
agg AS (
  SELECT doc_id,
         string_agg(word, ' ' ORDER BY wpos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       len(w.w)::BIGINT AS n_words,
       (len(w.w) - coalesce(a.n_kept, 0))::BIGINT AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM words w LEFT JOIN agg a USING (doc_id)
"""
