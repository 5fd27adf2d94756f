"""Corpus language-model statistics over the ``documents`` table.

Two training-data ops public pipelines run at corpus scale:

* **unigram log-probability scoring** — fit a unigram LM on the corpus
  (one combiner pass), broadcast the model once (``ray.put`` +
  per-process cache), score every document with its mean word
  log-probability.  This is the perplexity-style quality signal
  (CCNet/KenLM filtering) reduced to a unigram model so a DuckDB
  oracle can recompute it exactly.
* **top-k bigram counts** — corpus-wide word-bigram frequencies with a
  deterministic tie-break, the n-gram statistics pass of tokenizer /
  contamination audits.

Scale notes: the frequency pass emits one row per (block, word) —
vocabulary grows sub-linearly with corpus size (Heaps' law), and a
production run caps the broadcast model at top-V words before
``ray.put`` (the tail shares one OOV bucket); the bigram group space
CAN scale with the data, so its merge takes the estimator-driven
``distributed`` path of :func:`merge_partials`.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.broadcast import process_cached
from .aggregate import merge_partials
from .text import _WORD_SPLIT_RE, _WORDS_EXPR

# DuckDB's round() rounds half away from zero; logprobs are negative,
# so the numpy twin must mirror that on both signs
def _round6_away_signed(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _tokenize(col: pa.ChunkedArray | pa.Array) -> Tuple[np.ndarray, np.ndarray, int]:
    """(words, row_id, n_rows) as NUMPY object strings — legacy helper
    for callers that genuinely need Python-level words.  Hot paths use
    :func:`_tokenize_arrow` (no per-word Python objects)."""
    flat, row, n = _tokenize_arrow(col)
    return (
        flat.to_numpy(zero_copy_only=False).astype(object), row, n
    )


def _tokenize_arrow(
    col: pa.ChunkedArray | pa.Array,
) -> Tuple[pa.Array, np.ndarray, int]:
    """(flat_words_arrow, row_id, n_rows): lowercased ``[a-z0-9]+``
    tokens with their row index, empties dropped — one regex split per
    batch, the flat word array staying an Arrow string array end to
    end (round-4: the per-word ``astype(object)`` round-trip made the
    LM family the slowest vectorized ops in the bench)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lists = pc.split_pattern_regex(pc.utf8_lower(col), _WORD_SPLIT_RE)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = pc.not_equal(flat, "")
    return (
        flat.filter(keep),
        row[keep.to_numpy(zero_copy_only=False)],
        n,
    )


def word_frequencies(
    ds: rd.Dataset, text_col: str = "text",
    distributed: bool | None = None,
) -> rd.Dataset:
    """Corpus word counts ``(word, c)`` — per-batch combiner, then the
    partial merge (tree for worker-sized vocabularies, hash-partitioned
    groupby when the estimator says the input is large)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize_arrow(batch[text_col])
        vc = pc.value_counts(flat)
        return pa.table(
            {"word": vc.field("values"),
             "c": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_partials(partials, ["word"], [("c", "sum")],
                          distributed=distributed)


def unigram_logprob(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> rd.Dataset:
    """Append ``unigram_logprob``: mean over the document's words of
    ``ln(count(word) / total_words)`` under the corpus unigram model
    (0.0 for empty documents), rounded to 6 digits.

    Model fit is one combiner pass; the fitted ``(vocab, logprob)``
    arrays are ``ray.put`` once and mapped per batch via searchsorted —
    never re-shipped, never joined.

    The broadcast vocabulary is CAPPED — standard LM practice, and the
    round-3 review finding: a web corpus's ``\\w+`` token set is
    effectively unbounded (URLs, typos, code identifiers), so an
    uncapped model grows with the input and materializes on the driver.
    ``min_count`` drops words rarer than the floor; ``max_vocab`` keeps
    the top-V by (count DESC, word ASC) via a DISTRIBUTED sort+limit,
    so the driver only ever holds V rows.  All trimmed words share one
    OOV bucket whose probability is ``tail_count / total`` — total and
    tail are exact (Dataset-side sums), so capping changes which words
    share a bucket, never the mass accounting."""
    freq_ds = word_frequencies(ds, text_col)
    total = freq_ds.sum("c") or 0
    if min_count > 1:
        freq_ds = freq_ds.filter(expr=f"c >= {min_count}")
    if max_vocab is not None:
        freq_ds = freq_ds.sort(
            ["c", "word"], descending=[True, False]
        ).limit(max_vocab)
    freq = freq_ds.to_pandas()  # bounded: min(vocab, max_vocab) rows
    vocab = freq["word"].to_numpy(dtype=object)
    counts = freq["c"].to_numpy(dtype=np.float64)
    tail = float(total) - counts.sum()
    lp = np.log(counts / total) if len(counts) else counts
    # OOV bucket: trimmed words share ln(tail/total); -inf cannot arise
    # at score time (a scored OOV word implies a nonzero trimmed tail)
    oov = np.log(tail / total) if tail > 0 else 0.0
    # vocab ships as an Arrow array; scoring is one hash-table
    # index_in per batch (no Python word objects, round 4)
    model_ref = ray.put((pa.array(vocab, pa.string()), lp, oov))

    def fn(batch: pa.Table) -> pa.Table:
        vocab_a, lp_s, oov_s = process_cached(
            ("unigram_model", model_ref.hex()), lambda: ray.get(model_ref)
        )
        flat, row, n = _tokenize_arrow(batch[text_col])
        sums = np.zeros(n, dtype=np.float64)
        nw = np.zeros(n, dtype=np.int64)
        if len(flat):
            idx = pc.index_in(flat, value_set=vocab_a)
            found = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            idx_np = idx.fill_null(0).to_numpy(zero_copy_only=False)
            w_lp = (
                np.where(found, lp_s[idx_np.astype(np.int64)], oov_s)
                if len(lp_s)
                else np.full(len(flat), oov_s)
            )
            sums = np.bincount(row, weights=w_lp, minlength=n)
            nw = np.bincount(row, minlength=n)
        mean = np.where(nw > 0, sums / np.maximum(nw, 1), 0.0)
        return batch.append_column(
            "unigram_logprob",
            pa.array(_round6_away_signed(mean), pa.float64()),
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def top_bigrams(
    ds: rd.Dataset, k: int = 20, text_col: str = "text",
    distributed: bool | None = None,
) -> rd.Dataset:
    """Corpus top-k word bigrams ``(bigram, n)`` — per-batch combiner,
    estimator-driven merge (the bigram space scales with the corpus),
    then sort + limit with a deterministic tie-break (n DESC, bigram
    ASC)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, row, _ = _tokenize_arrow(batch[text_col])
        adj = row[1:] == row[:-1] if len(row) else np.zeros(0, bool)
        if not adj.any():
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        mask = pa.array(adj)
        bg = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1).filter(mask),
            flat.slice(1).filter(mask),
            " ",
        )
        vc = pc.value_counts(bg)
        return pa.table(
            {"bigram": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # the bigram group space scales with the corpus — estimator decides
    from .aggregate import resolve_distributed

    merged = merge_partials(
        partials, ["bigram"], [("n", "sum")],
        distributed=resolve_distributed(ds, distributed),
    )
    return merged.sort(["n", "bigram"], descending=[True, False]).limit(k)


def lm_stats(ds: rd.Dataset, k: int = 20,
             tfidf_k: int = 3, min_count: int = 1,
             min_df: int = 1) -> rd.Dataset:
    """Tag-union of the corpus-LM ops for the driver query: rows
    ``('bigram', bigram, count)`` ∪ ``('doc_lp', doc_id, logprob)`` ∪
    ``('tfidf', doc_id#rank#term, score)`` — the rank in the key makes
    the per-doc TF-IDF ORDERING part of the value gate.  ``min_count``
    / ``min_df`` activate the vocabulary caps (mirrored in
    :func:`lm_stats_sql`, so the driver gate exercises the capped
    path)."""

    def melt_bigrams(t: pa.Table) -> pa.Table:
        return pa.table(
            {"kind": pa.array(["bigram"] * len(t), pa.string()),
             "key": t["bigram"],
             "val": pc.cast(t["n"], pa.float64())}
        )

    def melt_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {"kind": pa.array(["doc_lp"] * len(t), pa.string()),
             "key": pc.cast(t["doc_id"], pa.string()),
             "val": t["unigram_logprob"]}
        )

    def melt_tfidf(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()),
            pc.cast(t["rank"], pa.string()),
            t["term"],
            "#",
        )
        return pa.table(
            {"kind": pa.array(["tfidf"] * len(t), pa.string()),
             "key": key,
             "val": t["score"]}
        )

    bigrams = top_bigrams(ds, k).map_batches(
        melt_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    scored = unigram_logprob(ds, min_count=min_count).map_batches(
        melt_docs, batch_format="pyarrow", zero_copy_batch=True
    )
    tfidf = tfidf_top_terms(ds, tfidf_k, min_df=min_df).map_batches(
        melt_tfidf, batch_format="pyarrow", zero_copy_batch=True
    )
    return bigrams.union(scored).union(tfidf)


_BIGRAMS_UNNEST = (
    "unnest(list_transform(range(1, len(ws)), "
    "i -> ws[i] || ' ' || ws[i+1]))"
)


def lm_stats_sql(k: int = 20, table: str = "documents",
                 tfidf_k: int = 3, min_count: int = 1,
                 min_df: int = 1) -> str:
    """Twin of :func:`lm_stats` — the vocabulary caps are mirrored:
    words under ``min_count`` share the OOV bucket ``ln(tail/total)``,
    terms under ``min_df`` are excluded from TF-IDF scoring."""
    return f"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wd
  FROM {table}
),
f AS (SELECT wd, count(*)::DOUBLE AS c FROM w GROUP BY wd),
tot AS (SELECT sum(c) AS t FROM f),
kept AS (SELECT wd, c FROM f WHERE c >= {min_count}),
tail AS (SELECT coalesce(sum(c), 0) AS tc FROM f WHERE c < {min_count}),
lp AS (
  SELECT doc_id,
         avg(CASE WHEN kept.wd IS NOT NULL THEN ln(kept.c / t)
                  ELSE ln(tc / t) END) AS v
  FROM w LEFT JOIN kept USING (wd) CROSS JOIN tot CROSS JOIN tail
  GROUP BY doc_id
),
bg AS (
  SELECT {_BIGRAMS_UNNEST} AS b
  FROM (SELECT {_WORDS_EXPR} AS ws FROM {table})
),
top AS (
  SELECT b, count(*) AS n FROM bg GROUP BY b
  ORDER BY n DESC, b ASC LIMIT {k}
),
dfq AS (SELECT wd, count(DISTINCT doc_id)::DOUBLE AS df FROM w GROUP BY wd
        HAVING count(DISTINCT doc_id) >= {min_df}),
nd AS (SELECT count(*)::DOUBLE AS n FROM {table}),
tfq AS (SELECT doc_id, wd, count(*)::DOUBLE AS c FROM w GROUP BY doc_id, wd),
dl AS (SELECT doc_id, count(*)::DOUBLE AS len FROM w GROUP BY doc_id),
sc AS (
  SELECT tfq.doc_id, tfq.wd,
         round(tfq.c / dl.len * ln(nd.n / dfq.df), 6) AS s
  FROM tfq JOIN dl USING (doc_id) JOIN dfq USING (wd) CROSS JOIN nd
),
tk AS (
  SELECT doc_id, wd, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, wd ASC) AS r
  FROM sc
)
SELECT 'bigram' AS kind, b AS key, n::DOUBLE AS val FROM top
UNION ALL
SELECT 'doc_lp' AS kind, CAST(d.doc_id AS VARCHAR) AS key,
       round(coalesce(lp.v, 0), 6) AS val
FROM {table} d LEFT JOIN lp USING (doc_id)
UNION ALL
SELECT 'tfidf' AS kind,
       CAST(doc_id AS VARCHAR) || '#' || CAST(r AS VARCHAR) || '#' || wd
         AS key,
       s AS val
FROM tk WHERE r <= {tfidf_k}
"""


def doc_frequencies(
    ds: rd.Dataset, text_col: str = "text",
    distributed: bool | None = None,
) -> rd.Dataset:
    """Document frequencies ``(word, df)`` — how many documents contain
    each word at least once.  Per-batch combiner over the batch's
    distinct (row, word) pairs; vocab-bounded merge like
    :func:`word_frequencies`."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, row, _ = _tokenize_arrow(batch[text_col])
        if not len(flat):
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
        pairs = pa.table(
            {"row": pa.array(row), "word": flat}
        ).group_by(["row", "word"]).aggregate([])  # distinct pairs
        vc = pc.value_counts(pairs["word"])
        return pa.table(
            {"word": vc.field("values"),
             "df": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_partials(partials, ["word"], [("df", "sum")],
                          distributed=distributed)


def tfidf_top_terms(
    ds: rd.Dataset,
    k_per_doc: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_vocab: int | None = None,
) -> rd.Dataset:
    """Per-document top-k terms by TF-IDF — the classic quality /
    keyword-extraction signal: ``score = (c_term / doc_len) ·
    ln(N / df_term)``, rounded to 6, ranked per document with the
    (score DESC, term ASC) tie-break.  Output (doc_id, term, score,
    rank).

    The (word → idf) table is fit in one combiner pass and broadcast
    once (the unigram-model discipline) — and CAPPED like the unigram
    model (round-3 review finding: the raw vocab grows with a web
    corpus): ``min_df`` excludes terms in fewer than that many
    documents (sklearn's ``min_df``; such terms are never scored —
    they are near-unique strings, not keywords), ``max_vocab`` keeps
    the top-V by (df DESC, word ASC) via a distributed sort+limit.
    Scoring and the per-doc top-k are one vectorized pass per batch —
    each document lives in one row, so its top-k never crosses
    blocks."""
    n_docs = float(ds.count())
    freq_ds = doc_frequencies(ds, text_col)
    if min_df > 1:
        freq_ds = freq_ds.filter(expr=f"df >= {min_df}")
    if max_vocab is not None:
        freq_ds = freq_ds.sort(
            ["df", "word"], descending=[True, False]
        ).limit(max_vocab)
    freq = freq_ds.to_pandas()  # bounded: min(vocab, max_vocab) rows
    vocab = freq["word"].to_numpy(dtype=object)
    idf = np.log(n_docs / freq["df"].to_numpy(dtype=np.float64))
    # vocab ships as an Arrow array; per-batch membership + idf lookup
    # is one hash-table index_in (no Python word objects, round 4)
    model_ref = ray.put((pa.array(vocab, pa.string()), idf))

    def _empty() -> pa.Table:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "term": pa.array([], pa.string()),
             "score": pa.array([], pa.float64()),
             "rank": pa.array([], pa.int64())}
        )

    def fn(batch: pa.Table) -> pa.Table:
        vocab_a, idf_s = process_cached(
            ("tfidf_model", model_ref.hex()), lambda: ray.get(model_ref)
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, row, n = _tokenize_arrow(batch[text_col])
        if not len(flat):
            return _empty()
        dlen = np.bincount(row, minlength=n).astype(np.float64)
        # per-(row, word) term counts via one Arrow hash group-by
        ones = np.ones(len(row), dtype=np.int64)
        grouped = (
            pa.table({"row": pa.array(row), "word": flat,
                      "one": pa.array(ones)})
            .group_by(["row", "word"])
            .aggregate([("one", "sum")])
        )
        t_row = grouped["row"].to_numpy(zero_copy_only=False)
        counts = grouped["one_sum"].to_numpy(zero_copy_only=False)
        words_g = grouped["word"]
        if isinstance(words_g, pa.ChunkedArray):
            words_g = words_g.combine_chunks()
        tf = counts / dlen[t_row]
        # membership check: terms trimmed from the idf table (min_df /
        # max_vocab) are not scored
        idx = pc.index_in(words_g, value_set=vocab_a)
        found = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        if not found.any():
            return _empty()
        idx_np = (
            idx.fill_null(0).to_numpy(zero_copy_only=False)
            .astype(np.int64)[found]
        )
        t_row, tf = t_row[found], tf[found]
        words_g = words_g.filter(pa.array(found))
        score = _round6_away_signed(tf * idf_s[idx_np])
        # per-doc rank by (score desc, term asc): Arrow sort keeps the
        # term strings out of numpy; (row, word) is unique so the key
        # is total and the order deterministic
        sel = pc.sort_indices(
            pa.table({"row": pa.array(t_row),
                      "score": pa.array(score), "word": words_g}),
            sort_keys=[("row", "ascending"), ("score", "descending"),
                       ("word", "ascending")],
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        t_row, score = t_row[sel], score[sel]
        doc_first = np.ones(len(t_row), dtype=bool)
        doc_first[1:] = t_row[1:] != t_row[:-1]
        pos = np.arange(len(t_row))
        rank = pos - np.maximum.accumulate(
            np.where(doc_first, pos, 0)
        ) + 1
        keep = rank <= k_per_doc
        keep_idx = sel[keep]
        return pa.table(
            {id_col: pa.array(ids[t_row[keep]]),
             "term": words_g.take(pa.array(keep_idx)),
             "score": pa.array(score[keep], pa.float64()),
             "rank": pa.array(rank[keep], pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def datacard(
    docs: rd.Dataset,
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Corpus data card — the one-page statistics report a training-data
    release ships (dataset cards): corpus size, token totals, language
    and source composition, distinct-text count.  Emitted in the same
    ``(kind='card', key, val)`` long form as :func:`lm_stats` so both
    fold into one driver slot.

    One combiner pass: each block contributes partial sums and a
    distinct-text-hash set; sums tree-merge, the distinct count is a
    hash-bucketed distinct (64-bit text hash — at 10^12 docs the
    birthday error is ~3e4 rows, fine for a report and documented).
    """
    from ..functions.sketches import hash64

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        # \W+ (not text.py's lowercase class): verified split-count
        # parity with the twin's regexp_split_to_array(text, '\W+')
        words = pc.list_value_length(
            pc.split_pattern_regex(txt, r"\W+")
        )
        keys = ["n_docs", "total_words", "total_chars"]
        vals = [
            float(len(t)),
            float(
                pc.sum(words).as_py() or 0
            ),
            float(pc.sum(pc.utf8_length(txt)).as_py() or 0),
        ]
        for col in ("lang", "source"):
            if col in t.schema.names:
                # nulls are dropped on BOTH sides: the SQL twin's
                # ``'lang:' || lang`` yields a NULL key for the null
                # group, and pandas/Arrow would hash it as 'lang:None'
                # — a silent value mismatch (round-3 advice finding)
                vc = pc.value_counts(pc.drop_null(t[col]))
                for s in vc:
                    keys.append(f"{col}:{s['values'].as_py()}")
                    vals.append(float(s['counts'].as_py()))
        return pa.table(
            {
                "kind": pa.array(["card"] * len(keys), pa.string()),
                "key": pa.array(keys, pa.string()),
                "val": pa.array(vals, pa.float64()),
            }
        )

    sums = merge_partials(
        docs.map_batches(
            partial, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ),
        ["kind", "key"],
        [("val", "sum")],
    )

    def text_hash(t: pa.Table) -> pa.Table:
        h = np.unique(hash64(t[text_col]))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "_b": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int64)
                ),
            }
        )

    def count_bucket(t: pa.Table) -> pa.Table:
        n = len(np.unique(t["h"].to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "kind": pa.array(["card"], pa.string()),
                "key": pa.array(["distinct_texts"], pa.string()),
                "val": pa.array([float(n)], pa.float64()),
            }
        )

    distinct = merge_partials(
        docs.map_batches(
            text_hash, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .groupby("_b")
        .map_groups(count_bucket, batch_format="pyarrow"),
        ["kind", "key"],
        [("val", "sum")],
    )
    return sums.union(distinct)


def datacard_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`datacard` (same `\\W+`-split word count —
    empty splits excluded exactly like Arrow's split on a non-empty
    string produces none for ''... both sides count split pieces of
    the same regex)."""
    return f"""
SELECT 'card' AS kind, 'n_docs' AS key, count(*)::DOUBLE AS val FROM {table}
UNION ALL
SELECT 'card', 'total_words',
       coalesce(sum(len(regexp_split_to_array(text, '\\W+'))), 0)::DOUBLE
FROM {table}
UNION ALL
SELECT 'card', 'total_chars',
       coalesce(sum(length(text)), 0)::DOUBLE FROM {table}
UNION ALL
SELECT 'card', 'lang:' || lang, count(*)::DOUBLE FROM {table}
WHERE lang IS NOT NULL GROUP BY lang
UNION ALL
SELECT 'card', 'source:' || source, count(*)::DOUBLE
FROM {table} WHERE source IS NOT NULL GROUP BY source
UNION ALL
SELECT 'card', 'distinct_texts', count(DISTINCT text)::DOUBLE FROM {table}
"""
