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
    """(words, row_id, n_rows): lowercased ``[a-z0-9]+`` tokens with
    their row index, empties dropped — one regex split per batch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lists = pc.split_pattern_regex(pc.utf8_lower(col), _WORD_SPLIT_RE)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(object)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = flat != ""
    return flat[keep], row[keep], n


def word_frequencies(
    ds: rd.Dataset, text_col: str = "text",
    distributed: bool | None = None,
) -> rd.Dataset:
    """Corpus word counts ``(word, c)`` — per-batch combiner, then the
    partial merge (tree for worker-sized vocabularies, hash-partitioned
    groupby when the estimator says the input is large)."""

    def partial(batch: pa.Table) -> pa.Table:
        words, _, _ = _tokenize(batch[text_col])
        uniq, cnt = np.unique(words, return_counts=True)
        return pa.table(
            {"word": pa.array(uniq, pa.string()),
             "c": pa.array(cnt, pa.int64())}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_partials(partials, ["word"], [("c", "sum")],
                          distributed=distributed)


def unigram_logprob(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Append ``unigram_logprob``: mean over the document's words of
    ``ln(count(word) / total_words)`` under the corpus unigram model
    (0.0 for empty documents), rounded to 6 digits.

    Model fit is one combiner pass; the fitted ``(vocab, logprob)``
    arrays are ``ray.put`` once and mapped per batch via searchsorted —
    never re-shipped, never joined."""
    freq = word_frequencies(ds, text_col).to_pandas()  # bounded: vocab
    vocab = freq["word"].to_numpy(dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    counts = freq["c"].to_numpy(dtype=np.float64)[order]
    lp = np.log(counts / counts.sum()) if len(counts) else counts
    model_ref = ray.put((vocab.astype("U"), lp))

    def fn(batch: pa.Table) -> pa.Table:
        vocab_s, lp_s = process_cached(
            ("unigram_model", model_ref.hex()), lambda: ray.get(model_ref)
        )
        words, row, n = _tokenize(batch[text_col])
        sums = np.zeros(n, dtype=np.float64)
        nw = np.zeros(n, dtype=np.int64)
        if len(words):
            idx = np.searchsorted(vocab_s, words.astype("U"))
            sums = np.bincount(row, weights=lp_s[idx], minlength=n)
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
        words, row, _ = _tokenize(batch[text_col])
        adj = row[1:] == row[:-1] if len(row) else np.zeros(0, bool)
        if not adj.any():
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        bg = np.char.add(
            np.char.add(words[:-1][adj].astype("U"), " "),
            words[1:][adj].astype("U"),
        )
        uniq, cnt = np.unique(bg, return_counts=True)
        return pa.table(
            {"bigram": pa.array(uniq.astype(object), pa.string()),
             "n": pa.array(cnt, pa.int64())}
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


def lm_stats(ds: rd.Dataset, k: int = 20) -> rd.Dataset:
    """Tag-union of both ops for the driver query: rows
    ``('bigram', bigram, count)`` ∪ ``('doc_lp', doc_id, logprob)``."""

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

    bigrams = top_bigrams(ds, k).map_batches(
        melt_bigrams, batch_format="pyarrow", zero_copy_batch=True
    )
    scored = unigram_logprob(ds).map_batches(
        melt_docs, batch_format="pyarrow", zero_copy_batch=True
    )
    return bigrams.union(scored)


_BIGRAMS_UNNEST = (
    "unnest(list_transform(range(1, len(ws)), "
    "i -> ws[i] || ' ' || ws[i+1]))"
)


def lm_stats_sql(k: int = 20, table: str = "documents") -> str:
    return f"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wd
  FROM {table}
),
f AS (SELECT wd, count(*)::DOUBLE AS c FROM w GROUP BY wd),
tot AS (SELECT sum(c) AS t FROM f),
lp AS (
  SELECT doc_id, avg(ln(c / t)) AS v
  FROM w JOIN f USING (wd) CROSS JOIN tot GROUP BY doc_id
),
bg AS (
  SELECT {_BIGRAMS_UNNEST} AS b
  FROM (SELECT {_WORDS_EXPR} AS ws FROM {table})
),
top AS (
  SELECT b, count(*) AS n FROM bg GROUP BY b
  ORDER BY n DESC, b ASC LIMIT {k}
)
SELECT 'bigram' AS kind, b AS key, n::DOUBLE AS val FROM top
UNION ALL
SELECT 'doc_lp' AS kind, CAST(d.doc_id AS VARCHAR) AS key,
       round(coalesce(lp.v, 0), 6) AS val
FROM {table} d LEFT JOIN lp USING (doc_id)
"""
