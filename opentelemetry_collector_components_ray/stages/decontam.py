"""Benchmark decontamination over the ``documents`` table.

Public training-data pipelines drop documents that contain verbatim
benchmark/eval text (substring or n-gram overlap — GPT-3 §C, PaLM,
Llama decontamination).  The engine shape:

* a SMALL benchmark snippet set (here derived deterministically from
  the corpus itself so tests need no external data) is broadcast once
  via ``ray.put``;
* every document batch is scanned with vectorized substring kernels
  (one ``pyarrow.compute.match_substring`` pass per snippet — at
  production snippet counts this becomes one Aho-Corasick automaton
  per worker, same broadcast shape);
* the clean corpus is the ``anti_join`` of documents against the
  contaminated id set (functions/join.py) — the filter-join operator
  this pipeline exists to exercise.

The DuckDB twin recomputes contamination with ``position(snippet IN
text)`` over the same snippet derivation, so the whole path — snippet
extraction, matching, anti-join — is value-gated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# deterministic snippet derivation (1-based SQL substr coordinates)
SNIPPET_EVERY = 23
SNIPPET_START = 11
SNIPPET_LEN = 40


def benchmark_snippets(docs: rd.Dataset) -> np.ndarray:
    """Deterministic 'benchmark set': a 40-char substring of every
    23rd document (driver-side, bounded by construction)."""
    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = pc.and_(
            pa.array(ids % SNIPPET_EVERY == 0),
            pc.greater_equal(
                pc.utf8_length(t["text"]), SNIPPET_START - 1 + SNIPPET_LEN
            ),
        )
        return t.filter(m).select(["text"])

    sub = docs.map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    snips = (
        sub["text"]
        .str.slice(SNIPPET_START - 1, SNIPPET_START - 1 + SNIPPET_LEN)
        .to_numpy(dtype=object)
    )
    return np.unique(snips)


SNIPPETS_SQL = f"""
SELECT DISTINCT substr(text, {SNIPPET_START}, {SNIPPET_LEN}) AS snippet
FROM documents
WHERE doc_id % {SNIPPET_EVERY} = 0
  AND length(text) >= {SNIPPET_START - 1 + SNIPPET_LEN}
"""


def flag_contamination(
    docs: rd.Dataset, snippets: np.ndarray, text_col: str = "text"
) -> rd.Dataset:
    """Append ``n_hits``: how many distinct benchmark snippets appear
    verbatim in each document (0 = clean).  Snippets are broadcast
    once; each batch runs one vectorized substring scan per snippet."""
    ref = ray.put(np.asarray(snippets, dtype=object))

    def fn(batch: pa.Table) -> pa.Table:
        snips = ray.get(ref)
        n = len(batch)
        hits = np.zeros(n, dtype=np.int64)
        txt = batch[text_col]
        for s in snips:
            hits += pc.match_substring(txt, s).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        return batch.append_column("n_hits", pa.array(hits, pa.int64()))

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate(
    docs: rd.Dataset, snippets: np.ndarray, id_col: str = "doc_id"
) -> rd.Dataset:
    """The clean corpus: documents anti-joined against the contaminated
    id set (distributed filter join — no driver-side id list)."""
    from ..functions.join import anti_join

    flagged = flag_contamination(docs, snippets)

    def dirty(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_hits"], 0)).select([id_col])

    dirty_ids = flagged.map_batches(
        dirty, batch_format="pyarrow", zero_copy_batch=True
    )
    return anti_join(docs, dirty_ids, on=id_col)


def decontam_report(docs: rd.Dataset) -> rd.Dataset:
    """Driver-query form: every document tagged ``contaminated`` (with
    its hit count) or ``clean`` — the clean half produced by the
    anti_join path so a filter-join bug becomes a value mismatch."""
    snippets = benchmark_snippets(docs)
    flagged = flag_contamination(docs, snippets)

    def dirty_rows(t: pa.Table) -> pa.Table:
        m = pc.greater(t["n_hits"], 0)
        sub = t.filter(m)
        return pa.table(
            {"doc_id": sub["doc_id"],
             "status": pa.array(["contaminated"] * len(sub), pa.string()),
             "n_hits": sub["n_hits"]}
        )

    dirty = flagged.map_batches(
        dirty_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def clean_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"],
             "status": pa.array(["clean"] * len(t), pa.string()),
             "n_hits": pa.array(np.zeros(len(t), np.int64))}
        )

    clean = decontaminate(docs, snippets).map_batches(
        clean_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return dirty.union(clean)


DECONTAM_REPORT_SQL = f"""
WITH snip AS ({SNIPPETS_SQL}),
hits AS (
  SELECT d.doc_id, count(*)::BIGINT AS n_hits
  FROM documents d JOIN snip s ON position(s.snippet IN d.text) > 0
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       CASE WHEN h.doc_id IS NULL THEN 'clean' ELSE 'contaminated' END
         AS status,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits
FROM documents d LEFT JOIN hits h USING (doc_id)
"""
