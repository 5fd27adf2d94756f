"""Text analysis stages vs their generated SQL twins."""

import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages import text as T


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet").materialize()


def test_token_counts_matches_oracle(docs_ds, oracle):
    got = T.token_counts(docs_ds).to_pandas()
    want = oracle.execute(T.TOKEN_COUNTS_SQL).df()
    assert_frames_equal(got, want, ["doc_id"])


def test_quality_scores_matches_oracle(docs_ds, oracle):
    got = T.quality_scores(docs_ds).to_pandas()
    want = oracle.execute(T.QUALITY_SCORES_SQL).df()
    assert_frames_equal(got, want, ["doc_id"])


def test_lang_id_matches_oracle(docs_ds, oracle):
    got = T.lang_id(docs_ds).to_pandas()
    want = oracle.execute(T.lang_id_sql()).df()
    assert_frames_equal(got, want, ["doc_id"])


def test_fingerprints_matches_oracle(docs_ds, oracle):
    got = T.fingerprints(docs_ds).to_pandas()
    want = oracle.execute(T.FINGERPRINTS_SQL).df()
    assert_frames_equal(got, want, ["doc_id"])


def test_token_counts_unit(ray_session):
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b  c", "", "hi42!x"]}
    )
    out = (
        T.token_counts(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.n_tokens.tolist() == [3, 0, 1]
    # BPE-ish: 'hi' '42' '!' 'x' → 4
    assert out.n_bpe_tokens.tolist() == [3, 0, 4]


def test_normalize_text_unicode_and_whitespace(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        normalize_text,
    )

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "  Café   MENU  ",  # decomposed accent + spaces
                "Tabs\tand\nnewlines",
                "already clean",
            ],
        }
    )
    out = (
        normalize_text(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.text_norm.tolist() == [
        "café menu",  # composed é, single spaces, trimmed
        "tabs and newlines",
        "already clean",
    ]


def test_repetition_scores(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        repetition_scores,
    )

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "spam spam spam spam",        # 4 words, 1 distinct
                "a b c d",                     # all distinct
                "",                            # empty → all fracs 0
                "x y x y x y",                 # repeated bigrams
                "solo",                        # single word, no bigrams
            ],
        }
    )
    out = (
        repetition_scores(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
    )
    # dup_word_frac = (n - distinct) / n
    assert out.dup_word_frac.tolist() == [0.75, 0.0, 0.0, 0.666667, 0.0]
    # top_word_frac = max count / n
    assert out.top_word_frac.tolist() == [1.0, 0.25, 0.0, 0.5, 1.0]
    # doc 0: 3 bigrams, 1 distinct → 2/3; doc 3: xy yx xy yx xy →
    # 5 bigrams, 2 distinct → 0.6
    assert out.dup_bigram_frac.tolist() == [0.666667, 0.0, 0.0, 0.6, 0.0]


def test_repetition_scores_rounding_matches_duckdb(ray_session):
    """dup fractions must round half-away-from-zero like DuckDB."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        REPETITION_SCORES_SQL,
        repetition_scores,
    )

    documents = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "one two two three three three",
                "q w e r t y q w",
                "repeat repeat unique",
                "a a b b c c d d e",
            ],
        }
    )
    got = (
        repetition_scores(rd.from_pandas(documents))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.connect()
        .execute(REPETITION_SCORES_SQL.replace("documents", "documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("dup_word_frac", "top_word_frac", "dup_bigram_frac"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_redact_pii(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        redact_pii,
    )

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail bob@corp.io from 192.168.0.1 call +1 555 0100 now",
                "no pii here",
                "two mails: a@b.co and c.d@e.org",
            ],
        }
    )
    out = redact_pii(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out.n_pii.tolist() == [3, 0, 2]
    assert out.text_redacted.tolist() == [
        "mail <EMAIL> from <IP> call <PHONE> now",
        "no pii here",
        "two mails: <EMAIL> and <EMAIL>",
    ]


def test_redact_pii_sql_twin_matches(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        redact_pii,
        redact_pii_sql,
    )

    documents = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "x 10.0.0.300 y someone@example.com tel +44 20 7946 0958",
                "bare +1234567890 and 1.2.3.4",
            ],
        }
    )
    got = (
        redact_pii(rd.from_pandas(documents))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.execute(
            f"SELECT doc_id, {redact_pii_sql()} FROM documents ORDER BY doc_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.n_pii.astype("int64").tolist() == exp.n_pii.tolist()
    assert got.text_redacted.tolist() == exp.text_redacted.tolist()


def test_chunk_documents_windows_and_overlap(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        chunk_documents,
    )

    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["abcdefghij", "xy", ""]}
        )
    )
    out = (
        chunk_documents(docs, size=6, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 1: len 10, stride 4 -> chunks at 0,4 ("abcdef", "efghij")
    got1 = out[out.doc_id == 1]
    assert got1.chunk_text.tolist() == ["abcdef", "efghij"]
    assert got1.n_chars.tolist() == [6, 6]
    # short and empty docs yield their single (possibly empty) chunk
    assert out[out.doc_id == 2].chunk_text.tolist() == ["xy"]
    assert out[out.doc_id == 3].chunk_text.tolist() == [""]


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        chunk_documents,
    )

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, size=10, overlap=10)


def test_chunk_documents_tokens_windows_and_overlap(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        chunk_documents_tokens,
    )

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": [words, "one two", ""]}
        )
    )
    out = (
        chunk_documents_tokens(docs, size=6, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 1: 10 tokens, stride 4 -> token windows at 0 and 4
    got1 = out[out.doc_id == 1]
    assert got1.chunk_text.tolist() == [
        " ".join(f"w{i}" for i in range(0, 6)),
        " ".join(f"w{i}" for i in range(4, 10)),
    ]
    assert got1.n_tokens.tolist() == [6, 6]
    # short doc: one whole chunk; empty text splits to one empty token
    assert out[out.doc_id == 2].chunk_text.tolist() == ["one two"]
    assert out[out.doc_id == 2].n_tokens.tolist() == [2]
    assert out[out.doc_id == 3].chunk_text.tolist() == [""]
    assert out[out.doc_id == 3].n_tokens.tolist() == [1]


def test_chunk_documents_tokens_matches_naive(ray_session):
    """Property: the vectorized per-chunk-index explode equals a naive
    per-document recomputation on irregular token counts."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.text import (
        chunk_documents_tokens,
    )

    size, overlap, stride = 5, 2, 3
    texts = [
        " ".join(f"t{j}" for j in range(n))
        for n in [0, 1, 4, 5, 6, 8, 13, 23]
    ]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = (
        chunk_documents_tokens(docs, size=size, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    want = []
    for did, text in enumerate(texts):
        toks = text.split(" ")
        n_chunks = 1 + max(-(-(len(toks) - size) // stride), 0)
        for k in range(n_chunks):
            win = toks[k * stride: k * stride + size]
            want.append((did, k, " ".join(win), len(win)))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "chunk_idx", "chunk_text", "n_tokens"]
    )
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
