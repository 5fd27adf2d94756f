"""Text analysis over the ``documents`` table.

Training-data-pipeline ops: token counting, quality scoring, n-gram
language ID, content fingerprinting.  All stateless vectorized
``map_batches`` (Arrow/pandas kernels, compiled regexes at module
scope); each op carries a DuckDB-SQL twin generated from the SAME
constants so the oracle can verify it exactly.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# Token counting (whitespace + a BPE-ish sub-token regex)
# ---------------------------------------------------------------------------

# BPE-ish: runs of letters, runs of digits, or a single non-space symbol
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_counts(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        ws = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
        )
        # empty string → one empty token from split; count as 0
        ws = pc.if_else(pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(txt)), 0),
                        pa.scalar(0, pa.int32()), ws)
        bpe = pc.count_substring_regex(txt, BPE_RE)
        n_chars = pc.utf8_length(txt)
        return (
            batch.append_column("n_tokens", pc.cast(ws, pa.int64()))
            .append_column("n_bpe_tokens", pc.cast(bpe, pa.int64()))
            .append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TOKEN_COUNTS_SQL = f"""
SELECT documents.*,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_calc
FROM documents
"""

# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

STOPWORDS: Sequence[str] = (
    "the", "a", "of", "to", "and", "in", "is", "it", "for", "on",
)
_STOP_PATTERN = r"\b(" + "|".join(STOPWORDS) + r")\b"


def quality_scores(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Quality heuristics: mean word length, stopword ratio, alpha ratio.

    The shape mirrors quality-filter stages in public training-data
    pipelines (C4/Gopher-style heuristics); thresholds are left to the
    caller — this stage only scores.
    """

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        n_chars = pc.utf8_length(txt)
        n_words = pc.count_substring_regex(txt, r"\w+")
        n_stop = pc.count_substring_regex(txt, _STOP_PATTERN)
        n_alpha = pc.count_substring_regex(txt, r"[a-zA-Z]")
        nw_safe = pc.max_element_wise(n_words, 1)
        nc_safe = pc.max_element_wise(n_chars, 1)
        # half_towards_infinity = ties away from zero, matching DuckDB's
        # round() so the oracle hash compares bit-equal (Arrow's default
        # half_to_even differs on exact ties like 0.8203125)
        rmode = "half_towards_infinity"
        stop_ratio = pc.round(
            pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(nw_safe, pa.float64())),
            ndigits=6, round_mode=rmode,
        )
        alpha_ratio = pc.round(
            pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(nc_safe, pa.float64())),
            ndigits=6, round_mode=rmode,
        )
        mean_word_len = pc.round(
            pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(nw_safe, pa.float64())),
            ndigits=6, round_mode=rmode,
        )
        return (
            batch.append_column("n_words", pc.cast(n_words, pa.int64()))
            .append_column("stop_ratio", stop_ratio)
            .append_column("alpha_ratio", alpha_ratio)
            .append_column("mean_word_len", mean_word_len)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_SCORES_SQL = f"""
SELECT documents.*,
  CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_words,
  round(len(regexp_extract_all(text, '{_STOP_PATTERN}'))
        / greatest(len(regexp_extract_all(text, '\\w+')), 1)::DOUBLE, 6)
    AS stop_ratio,
  round(len(regexp_extract_all(text, '[a-zA-Z]'))
        / greatest(length(text), 1)::DOUBLE, 6) AS alpha_ratio,
  round(len(regexp_extract_all(text, '[a-zA-Z]'))
        / greatest(len(regexp_extract_all(text, '\\w+')), 1)::DOUBLE, 6)
    AS mean_word_len
FROM documents
"""

# ---------------------------------------------------------------------------
# Language ID (marker-word heuristic, deterministic + SQL-twinnable)
# ---------------------------------------------------------------------------

# marker vocabularies per language; scored by occurrence count, argmax
# with ties broken by language code order (deterministic)
LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "des"),
    "zh": ("zh",),  # synthetic corpus carries no CJK — placeholder marker
}
LANGS = sorted(LANG_MARKERS)


def _lang_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


def lang_id(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """n-gram/marker language ID: counts marker words per language,
    argmax (ties → first language code alphabetically, 'und' when no
    marker hits at all)."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        scores = [
            pc.count_substring_regex(txt, _lang_pattern(l)).to_numpy(
                zero_copy_only=False
            )
            for l in LANGS
        ]
        m = np.stack(scores, axis=1)  # (n, n_langs)
        best = np.argmax(m, axis=1)  # first max wins (LANGS sorted)
        detected = np.where(
            m.max(axis=1) > 0, np.array(LANGS, dtype=object)[best], "und"
        )
        return batch.append_column(
            "lang_detected", pa.array(detected, pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_id_sql() -> str:
    score = {
        l: f"len(regexp_extract_all(text, '{_lang_pattern(l)}'))"
        for l in LANGS
    }
    greatest = "greatest(" + ", ".join(score[l] for l in LANGS) + ")"
    case = "CASE "
    for l in LANGS:  # first max wins in sorted order
        case += f"WHEN {score[l]} = {greatest} THEN '{l}' "
    case += "END"
    return f"""
SELECT documents.*,
  CASE WHEN {greatest} = 0 THEN 'und' ELSE {case} END AS lang_detected
FROM documents
"""


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


def fingerprints(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Content fingerprint (md5 hex — matches DuckDB's md5()) computed
    per unique value (dup texts amortize), with the vectorized MD5
    kernel (functions/md5vec.py) doing the digests — hashlib only for
    texts ≥ 56 bytes (multi-block)."""
    from ..functions.md5vec import md5_hex_np

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        uniq, inv = np.unique(df[text_col].to_numpy(dtype=object), return_inverse=True)
        digests = md5_hex_np(uniq)
        df = df.copy()
        df["fingerprint"] = digests[inv]
        return df

    return ds.map_batches(fn, batch_format="pandas")


FINGERPRINTS_SQL = "SELECT documents.*, md5(text) AS fingerprint FROM documents"


# ---------------------------------------------------------------------------
# Text normalization (training-data cleaning): NFC → lower → collapse
# whitespace → trim.  NFC goes through Python's unicodedata on
# np.unique-amortized values — pyarrow's utf8_normalize(form="NFC")
# does NOT compose (leaves e + combining accent), which would diverge
# from DuckDB's nfc_normalize and every downstream exact-dedup.
# ---------------------------------------------------------------------------


def normalize_text(
    ds: rd.Dataset, text_col: str = "text", out_col: str = "text_norm"
) -> rd.Dataset:
    import unicodedata

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[text_col].to_numpy(zero_copy_only=False).astype(object)
        uniq, inv = np.unique(vals, return_inverse=True)
        normed = np.array(
            [unicodedata.normalize("NFC", s) for s in uniq], dtype=object
        )
        arr = pa.array(normed[inv], pa.string())
        arr = pc.utf8_lower(arr)
        arr = pc.replace_substring_regex(arr, r"\s+", " ")
        arr = pc.utf8_trim_whitespace(arr)
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZE_TEXT_SQL = (
    "SELECT documents.*, trim(regexp_replace(lower(nfc_normalize(text)),"
    " '\\s+', ' ', 'g')) AS text_norm FROM documents"
)


# ---------------------------------------------------------------------------
# PII redaction (training-data cleaning): emails, IPv4 addresses and
# phone numbers replaced with typed placeholders, plus a per-document
# match count.  Both pyarrow and DuckDB run RE2, so the SQL twin uses
# the IDENTICAL patterns — no dialect translation layer to drift.
# ---------------------------------------------------------------------------

PII_PATTERNS: Sequence[Tuple[str, str, str]] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{7,}\d", "<PHONE>"),
)


def redact_pii(
    ds: rd.Dataset, text_col: str = "text", out_col: str = "text_redacted"
) -> rd.Dataset:
    """Append ``n_pii`` (matches counted on the ORIGINAL text, so the
    count is redaction-order-independent) and ``out_col`` with all
    three PII classes replaced by placeholders, applied in
    ``PII_PATTERNS`` order."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        n_pii = pc.cast(
            pc.count_substring_regex(txt, PII_PATTERNS[0][1]), pa.int64()
        )
        red = txt
        for i, (_, pat, repl) in enumerate(PII_PATTERNS):
            if i > 0:
                n_pii = pc.add(
                    n_pii,
                    pc.cast(pc.count_substring_regex(txt, pat), pa.int64()),
                )
            red = pc.replace_substring_regex(red, pat, repl)
        return batch.append_column("n_pii", n_pii).append_column(
            out_col, red
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def redact_pii_sql(
    text_expr: str = "text", out_col: str = "text_redacted"
) -> str:
    """``<n_pii expr> AS n_pii, <redacted expr> AS <out_col>`` — same
    RE2 patterns as the engine."""
    counts = " + ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for _, pat, _ in PII_PATTERNS
    )
    red = text_expr
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"CAST({counts} AS BIGINT) AS n_pii, {red} AS {out_col}"


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality heuristics): fraction of
# duplicated words, most-common-word fraction, fraction of duplicated
# word bigrams — the repetition filters public training-data pipelines
# (Gopher §A.1, C4) apply to drop boilerplate/spam documents.  Fully
# vectorized: one regex split per batch, then factorized token ids and
# run-length encoding over a sorted (row, token) key — no Python loop
# over rows or tokens.
# ---------------------------------------------------------------------------

_WORD_SPLIT_RE = r"[^a-z0-9]+"
# the SQL twin tokenizes with the complement character class; the two
# are equivalent once empty split fragments are dropped
_WORDS_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _round6_away(x: np.ndarray) -> np.ndarray:
    """round-half-away-from-zero to 6 digits for non-negative doubles,
    matching DuckDB's round()."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def repetition_scores(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Append ``dup_word_frac``, ``top_word_frac``, ``dup_bigram_frac``.

    dup_word_frac   = (n_words - n_distinct_words) / n_words
    top_word_frac   = count(most frequent word) / n_words
    dup_bigram_frac = (n_bigrams - n_distinct_bigrams) / n_bigrams
    (all 0 when the denominator is 0; rounded to 6 digits)
    """

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(batch)
        lists = pc.split_pattern_regex(pc.utf8_lower(col), _WORD_SPLIT_RE)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_numpy(zero_copy_only=False).astype(object)
        row = np.repeat(np.arange(n, dtype=np.int64), counts)
        keep = flat != ""  # boundary splits yield empty fragments
        flat, row = flat[keep], row[keep]
        n_words = np.bincount(row, minlength=n).astype(np.int64)
        distinct = np.zeros(n, dtype=np.int64)
        top = np.zeros(n, dtype=np.int64)
        n_bigrams = np.zeros(n, dtype=np.int64)
        distinct_bg = np.zeros(n, dtype=np.int64)
        if len(flat):
            uniq, wid = np.unique(flat, return_inverse=True)
            V = np.int64(len(uniq))
            # distinct words + top-word count per row: RLE over sorted keys
            sk = np.sort(row * V + wid)
            starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            run_len = np.diff(np.r_[starts, len(sk)])
            run_row = sk[starts] // V
            distinct = np.bincount(run_row, minlength=n).astype(np.int64)
            row_starts = np.flatnonzero(
                np.r_[True, run_row[1:] != run_row[:-1]]
            )
            if len(row_starts):
                top[run_row[row_starts]] = np.maximum.reduceat(
                    run_len, row_starts
                )
            # bigrams: adjacent tokens within the same row
            adj = row[1:] == row[:-1]
            if adj.any():
                brow = row[:-1][adj]
                bkey = (brow * V + wid[:-1][adj]) * V + wid[1:][adj]
                n_bigrams = np.bincount(brow, minlength=n).astype(np.int64)
                sbk = np.sort(bkey)
                bstarts = np.flatnonzero(np.r_[True, sbk[1:] != sbk[:-1]])
                brun_row = sbk[bstarts] // (V * V)
                distinct_bg = np.bincount(
                    brun_row, minlength=n
                ).astype(np.int64)

        def frac(numer: np.ndarray, denom: np.ndarray) -> pa.Array:
            safe = np.maximum(denom, 1).astype(np.float64)
            return pa.array(_round6_away(numer / safe), pa.float64())

        return (
            batch.append_column("dup_word_frac", frac(n_words - distinct, n_words))
            .append_column("top_word_frac", frac(top, n_words))
            .append_column(
                "dup_bigram_frac", frac(n_bigrams - distinct_bg, n_bigrams)
            )
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_BIGRAMS_EXPR = (
    f"list_transform(range(1, len({_WORDS_EXPR})), "
    f"i -> {_WORDS_EXPR}[i] || ' ' || {_WORDS_EXPR}[i+1])"
)

REPETITION_SCORES_SQL = f"""
SELECT documents.*,
  round((len({_WORDS_EXPR}) - len(list_distinct({_WORDS_EXPR})))
        / greatest(len({_WORDS_EXPR}), 1)::DOUBLE, 6) AS dup_word_frac,
  round(coalesce(list_max(list_transform(list_distinct({_WORDS_EXPR}),
            w -> len(list_filter({_WORDS_EXPR}, x -> x = w)))), 0)
        / greatest(len({_WORDS_EXPR}), 1)::DOUBLE, 6) AS top_word_frac,
  round((len({_BIGRAMS_EXPR}) - len(list_distinct({_BIGRAMS_EXPR})))
        / greatest(len({_BIGRAMS_EXPR}), 1)::DOUBLE, 6) AS dup_bigram_frac
FROM documents
"""

# ---------------------------------------------------------------------------
# Folded per-document profile: all five text-analysis ops in one pass.
# Each op appends columns, so the chain is a single fused map_batches
# pipeline (no extra shuffles/materialization); the SQL twin is
# assembled from the five ops' own twins so engine and oracle can never
# drift apart per-op.
# ---------------------------------------------------------------------------


def text_profile(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """token counts + quality scores + language ID + fingerprint +
    normalization + repetition signals, appended to the input rows in
    one fused pass."""
    ds = token_counts(ds, text_col)
    ds = quality_scores(ds, text_col)
    ds = lang_id(ds, text_col)
    ds = fingerprints(ds, text_col)
    ds = normalize_text(ds, text_col)
    return repetition_scores(ds, text_col)


def _derived_exprs(sql: str) -> str:
    """'SELECT documents.*, <exprs> FROM documents' → '<exprs>'."""
    body = sql.strip()
    assert body[:6].upper() == "SELECT"
    head, _, tail = body[6:].rpartition("FROM")
    assert tail.strip().startswith("documents")
    head = head.strip()
    assert head.startswith("documents.*,")
    return head[len("documents.*,"):].strip()


def text_profile_sql() -> str:
    parts = [
        _derived_exprs(TOKEN_COUNTS_SQL),
        _derived_exprs(QUALITY_SCORES_SQL),
        _derived_exprs(lang_id_sql()),
        _derived_exprs(FINGERPRINTS_SQL),
        _derived_exprs(NORMALIZE_TEXT_SQL),
        _derived_exprs(REPETITION_SCORES_SQL),
    ]
    return (
        "SELECT documents.*,\n  " + ",\n  ".join(parts)
        + "\nFROM documents"
    )


def chunk_documents(
    ds: rd.Dataset,
    size: int = 200,
    overlap: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Split documents into fixed-size character windows with overlap —
    the standard long-document preprocessing step for embedding / RAG
    pipelines (each chunk embeds independently; overlap preserves
    cross-boundary context).  Output one row per chunk:
    ``(doc_id, chunk_idx, chunk_text, n_chars)``.

    Vectorized per CHUNK INDEX, not per document: chunk ``k`` of every
    document in the batch is one ``utf8_slice_codeunits`` call over the
    rows that have a k-th chunk, so the inner loop runs
    ``max_chunks_in_batch`` times over column vectors — never once per
    row.  An empty document still yields its single empty chunk (chunk
    count ``1 + max(ceil((len - size)/stride), 0)``), matching the SQL
    twin's ``substr`` semantics exactly."""
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n_chunks = 1 + np.maximum(
            np.ceil((n - size) / float(stride)).astype(np.int64), 0
        )
        out_id, out_idx, out_txt = [], [], []
        max_chunks = int(n_chunks.max()) if len(n_chunks) else 0
        for k in range(max_chunks):
            has = n_chunks > k
            mask = pa.array(has)
            sliced = pc.utf8_slice_codeunits(
                txt.filter(mask), k * stride, k * stride + size
            )
            out_id.append(ids[has])
            out_idx.append(np.full(int(has.sum()), k, dtype=np.int64))
            out_txt.append(sliced)
        if not out_id:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "chunk_idx": pa.array([], pa.int64()),
                 "chunk_text": pa.array([], pa.string()),
                 "n_chars": pa.array([], pa.int64())}
            )
        chunk_text = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_txt]
        )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "chunk_idx": pa.array(np.concatenate(out_idx)),
                "chunk_text": chunk_text,
                "n_chars": pc.cast(
                    pc.utf8_length(chunk_text), pa.int64()
                ),
            }
        )

    return ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def chunk_documents_tokens(
    ds: rd.Dataset,
    size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Token-aware chunking (round-5 variant of :func:`chunk_documents`):
    windows of ``size`` TOKENS with ``overlap`` tokens of context, so a
    chunk never exceeds a model's context budget no matter how long
    the words are.  Token = space-delimited word (the deterministic,
    SQL-twin-able core of the tokenizer family in :func:`token_counts`;
    a BPE vocabulary would plug in here as a pre-pass that rewrites
    ``text`` to space-joined BPE pieces).

    Same per-CHUNK-INDEX vectorization as the char chunker, entirely in
    Arrow list kernels: one ``split_pattern`` per batch, then chunk
    ``k`` of every document is one ``list_slice`` + ``binary_join``
    over the rows that have a k-th chunk.  Output one row per chunk:
    ``(doc_id, chunk_idx, chunk_text, n_tokens)``."""
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(txt, " ")
        n = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_chunks = 1 + np.maximum(
            np.ceil((n - size) / float(stride)).astype(np.int64), 0
        )
        out_id, out_idx, out_txt, out_n = [], [], [], []
        max_chunks = int(n_chunks.max()) if len(n_chunks) else 0
        for k in range(max_chunks):
            has = n_chunks > k
            mask = pa.array(has)
            window = pc.list_slice(
                toks.filter(mask), k * stride, k * stride + size
            )
            out_txt.append(pc.binary_join(window, " "))
            out_n.append(pc.list_value_length(window))
            out_id.append(ids[has])
            out_idx.append(np.full(int(has.sum()), k, dtype=np.int64))
        if not out_id:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "chunk_idx": pa.array([], pa.int64()),
                 "chunk_text": pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64())}
            )

        def _flat(arrs):
            return pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in arrs]
            )

        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "chunk_idx": pa.array(np.concatenate(out_idx)),
                "chunk_text": _flat(out_txt),
                "n_tokens": pc.cast(_flat(out_n), pa.int64()),
            }
        )

    return ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def chunk_documents_tokens_sql(
    size: int = 32, overlap: int = 8, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`chunk_documents_tokens` (1-based
    list_slice over string_split)."""
    stride = size - overlap
    return f"""
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_idx,
       array_to_string(
         list_slice(string_split(text, ' '),
                    CAST(k * {stride} + 1 AS BIGINT),
                    CAST(k * {stride} + {size} AS BIGINT)), ' ')
         AS chunk_text,
       CAST(len(list_slice(string_split(text, ' '),
                           CAST(k * {stride} + 1 AS BIGINT),
                           CAST(k * {stride} + {size} AS BIGINT)))
            AS BIGINT) AS n_tokens
FROM (
  SELECT doc_id, text,
         unnest(range(0,
           1 + greatest(CAST(ceil((len(string_split(text, ' ')) - {size})
                             / CAST({stride} AS DOUBLE)) AS BIGINT), 0)
         )) AS k
  FROM {table}
)
"""


def chunk_documents_sql(
    size: int = 200, overlap: int = 40, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`chunk_documents` (1-based substr)."""
    stride = size - overlap
    return f"""
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_idx,
       substr(text, CAST(k * {stride} + 1 AS BIGINT), {size})
         AS chunk_text,
       CAST(length(substr(text, CAST(k * {stride} + 1 AS BIGINT), {size}))
            AS BIGINT) AS n_chars
FROM (
  SELECT doc_id, text,
         unnest(range(0,
           1 + greatest(CAST(ceil((length(text) - {size})
                             / CAST({stride} AS DOUBLE)) AS BIGINT), 0)
         )) AS k
  FROM {table}
)
"""
