"""Unit tests for stages/lm.py (corpus unigram LM + bigram stats)."""

import math

import pandas as pd
import pytest


def _docs(texts):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_word_frequencies(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import (
        word_frequencies,
    )

    out = (
        word_frequencies(_docs(["a b a", "b c", ""]))
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    assert out.word.tolist() == ["a", "b", "c"]
    assert out.c.tolist() == [2, 2, 1]


def test_unigram_logprob_matches_manual(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import (
        unigram_logprob,
    )

    # corpus: a×3 b×2 c×1 → total 6
    out = (
        unigram_logprob(_docs(["a a b", "a b c", ""]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp = {w: math.log(c / 6) for w, c in {"a": 3, "b": 2, "c": 1}.items()}
    exp0 = (2 * lp["a"] + lp["b"]) / 3
    exp1 = (lp["a"] + lp["b"] + lp["c"]) / 3
    assert out.unigram_logprob[0] == pytest.approx(exp0, abs=1e-6)
    assert out.unigram_logprob[1] == pytest.approx(exp1, abs=1e-6)
    assert out.unigram_logprob[2] == 0.0  # empty doc


def test_top_bigrams_deterministic_tiebreak(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import (
        top_bigrams,
    )

    out = top_bigrams(
        _docs(["x y x y", "a b", "a b"]), k=2
    ).to_pandas()
    # "a b"×2 and "x y"×2 tie; "y x"×1 loses — tie-break bigram ASC
    assert out.bigram.tolist() == ["a b", "x y"]
    assert out.n.tolist() == [2, 2]


def test_lm_stats_union_shape(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import lm_stats

    out = lm_stats(_docs(["a b a b", "c d"]), k=3).to_pandas()
    kinds = out.kind.value_counts().to_dict()
    assert kinds["doc_lp"] == 2
    assert kinds["bigram"] == 3


def test_doc_frequencies(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import lm

    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["cat dog cat", "dog bird", "fish"],
            }
        )
    ).repartition(2)
    out = (
        lm.doc_frequencies(ds)
        .to_pandas()
        .set_index("word")["df"]
        .to_dict()
    )
    assert out == {"cat": 1, "dog": 2, "bird": 1, "fish": 1}


def test_tfidf_top_terms_manual(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import lm

    # doc 0: "a a b" — 'a' common to both docs (idf=0), 'b' unique
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["a a b", "a c c c"]}
        )
    )
    out = lm.tfidf_top_terms(ds, k_per_doc=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    # 'b': tf=1/3, idf=ln(2/1) → top; 'a': idf=ln(2/2)=0
    assert d0.term.tolist() == ["b", "a"]
    assert np.isclose(d0.score.iloc[0], round(1 / 3 * np.log(2), 6))
    assert d0.score.iloc[1] == 0.0
    d1 = out[out.doc_id == 1].sort_values("rank")
    assert d1.term.tolist() == ["c", "a"]
    assert np.isclose(d1.score.iloc[0], round(3 / 4 * np.log(2), 6))


def test_unigram_logprob_min_count_oov_bucket(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import (
        unigram_logprob,
    )

    # corpus: a×3 b×2 c×1 → total 6; min_count=2 trims c into the OOV
    # bucket, whose mass is the trimmed tail: ln(1/6)
    out = (
        unigram_logprob(_docs(["a a b", "a b c", ""]), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp = {w: math.log(c / 6) for w, c in {"a": 3, "b": 2}.items()}
    oov = math.log(1 / 6)
    exp0 = (2 * lp["a"] + lp["b"]) / 3
    exp1 = (lp["a"] + lp["b"] + oov) / 3
    assert out.unigram_logprob[0] == pytest.approx(exp0, abs=1e-6)
    assert out.unigram_logprob[1] == pytest.approx(exp1, abs=1e-6)


def test_unigram_logprob_max_vocab_cap(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import (
        unigram_logprob,
    )

    # corpus: a×3 b×2 c×1 → total 6; max_vocab=2 keeps {a, b} (count
    # DESC), c shares the OOV bucket ln(1/6)
    out = (
        unigram_logprob(_docs(["a a b", "a b c", ""]), max_vocab=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp = {w: math.log(c / 6) for w, c in {"a": 3, "b": 2}.items()}
    oov = math.log(1 / 6)
    exp1 = (lp["a"] + lp["b"] + oov) / 3
    assert out.unigram_logprob[1] == pytest.approx(exp1, abs=1e-6)
    assert out.unigram_logprob[2] == 0.0


def test_tfidf_min_df_drops_rare_terms(ray_session):
    from opentelemetry_collector_components_ray.stages.lm import (
        tfidf_top_terms,
    )

    out = tfidf_top_terms(
        _docs(["common rare1", "common rare2", "common rare3"]),
        k_per_doc=3, min_df=2,
    ).to_pandas()
    # every rareN appears in 1 doc < min_df → only 'common' is scored
    assert set(out.term) == {"common"}
    assert len(out) == 3
