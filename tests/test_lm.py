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
