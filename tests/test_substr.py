"""Exact substring (duplicated-span) dedup: hand-pinned semantics,
broadcast ≡ distributed path parity, and the planted-corpus DuckDB
twin at unit scale."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opentelemetry_collector_components_ray.stages import substr


def _docs(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def _run(docs, **kw):
    df = substr.substring_dedup(docs, **kw).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


SHARED = "a b c d e f g h"  # exactly one k=8 window


def test_basic_cross_doc_removal():
    docs = _docs(
        [
            (1, SHARED + " x y"),
            (2, "p q " + SHARED),
            (3, "solo words only here nothing repeated at all"),
        ]
    )
    out = _run(docs, k=8, distributed=False)
    # doc 1 holds the keeper (min (doc_id, pos)) — untouched
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[0, "clean_text"] == SHARED + " x y"
    # doc 2's occurrence is removed, prefix kept
    assert out.loc[1, "n_removed"] == 8
    assert out.loc[1, "clean_text"] == "p q"
    # doc 3 untouched
    assert out.loc[2, "n_removed"] == 0


def test_overlapping_windows_union():
    # a 10-word shared span has three k=8 windows; covered positions
    # union to the whole span in the non-keeper doc
    span = "a b c d e f g h i j"
    docs = _docs([(1, span), (2, "zz " + span + " qq")])
    out = _run(docs, k=8, distributed=False)
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[1, "n_removed"] == 10
    assert out.loc[1, "clean_text"] == "zz qq"


def test_within_doc_repeat_not_removed():
    # duplication requires >= 2 distinct docs: a doc repeating its own
    # span keeps everything
    span = "a b c d e f g h"
    docs = _docs([(1, span + " " + span)])
    out = _run(docs, k=8, distributed=False)
    assert out.loc[0, "n_removed"] == 0


def test_keeper_is_lexicographic_min():
    span = "a b c d e f g h"
    docs = _docs([(5, "xx " + span), (2, span + " yy"), (9, span)])
    out = _run(docs, k=8, distributed=False)
    by_id = out.set_index("doc_id")
    assert by_id.loc[2, "n_removed"] == 0  # min doc_id keeps
    assert by_id.loc[5, "n_removed"] == 8
    assert by_id.loc[5, "clean_text"] == "xx"
    assert by_id.loc[9, "n_removed"] == 8
    assert by_id.loc[9, "clean_text"] == ""


def test_short_docs_no_windows():
    docs = _docs([(1, "a b c"), (2, "a b c")])
    out = _run(docs, k=8, distributed=False)
    assert (out["n_removed"] == 0).all()
    assert list(out["n_words"]) == [3, 3]


def test_path_parity_planted():
    rng = np.random.default_rng(7)
    vocab = list("abcdefghijklmnop")
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(10, 30))))
        for i in range(60)
    ]
    docs = substr.plant_passages(_docs(rows))
    a = _run(docs, k=8, distributed=False)
    b = _run(docs, k=8, distributed=True, num_buckets=7)
    pd.testing.assert_frame_equal(a, b)


def test_duckdb_twin_planted():
    rng = np.random.default_rng(11)
    vocab = list("abcdefghijklmnop")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.integers(9, 25)))
                for _ in range(80)
            ],
        }
    )
    docs = substr.plant_passages(rd.from_pandas(df))
    got = _run(docs, k=8, distributed=False)

    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(substr.substring_dedup_sql(k=8, planted=True))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # non-vacuous: the planted passages actually got removed somewhere
    assert (want["n_removed"] > 0).any()


def test_incremental_substring_dedup(tmp_path):
    idx = str(tmp_path / "gram_index")
    span = "a b c d e f g h i j"

    # ingest 1: doc 1 holds the span (nothing to dedup against)
    run1 = _run_inc(
        [(1, span + " tail one"), (2, "unrelated words only here")],
        idx, "r1",
    )
    assert run1.set_index("doc_id").loc[1, "n_removed"] == 0

    # ingest 2: the span is indexed → removed from BOTH new docs (the
    # history keeper wins, so no new occurrence survives, unlike the
    # within-batch rule that would keep one)
    run2 = _run_inc(
        [(10, span + " fresh suffix"), (11, "prefix words " + span)],
        idx, "r2",
    )
    by = run2.set_index("doc_id")
    assert by.loc[10, "n_removed"] == 10
    assert by.loc[10, "clean_text"] == "fresh suffix"
    assert by.loc[11, "n_removed"] == 10
    assert by.loc[11, "clean_text"] == "prefix words"

    # ingest 2 re-run is idempotent (its own partition is replaced)
    rerun = _run_inc(
        [(10, span + " fresh suffix"), (11, "prefix words " + span)],
        idx, "r2",
    )
    pd.testing.assert_frame_equal(
        run2.reset_index(drop=True), rerun.reset_index(drop=True)
    )

    # ingest 3: a NEW span duplicated within the batch only → normal
    # within-batch keeper semantics
    span2 = "p q r s t u v w x y"
    run3 = _run_inc(
        [(20, span2), (21, span2 + " zz")], idx, "r3",
    )
    by3 = run3.set_index("doc_id")
    assert by3.loc[20, "n_removed"] == 0
    assert by3.loc[21, "n_removed"] == 10
    assert by3.loc[21, "clean_text"] == "zz"


def _run_inc(rows, idx, run_id):
    from opentelemetry_collector_components_ray.stages import substr

    out = substr.incremental_substring_dedup(
        _docs(rows), idx, run_id, k=8, distributed=False
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_remove_matching_spans():
    from opentelemetry_collector_components_ray.stages import substr

    bench_span = "q w e r t y u i o p"
    bench = _docs([(100, "some benchmark item " + bench_span)])
    docs = _docs(
        [
            (1, "intro words " + bench_span + " outro words"),
            (2, "totally unrelated text with many plain words here"),
            # within-docs duplication is NOT removed by this op
            (3, "a b c d e f g h"),
            (4, "a b c d e f g h"),
        ]
    )
    out = (
        substr.remove_matching_spans(docs, bench, k=8, distributed=False)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[1, "n_removed"] == 10
    assert out.loc[1, "clean_text"] == "intro words outro words"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[3, "n_removed"] == 0 and out.loc[4, "n_removed"] == 0

    # distributed path parity
    out2 = (
        substr.remove_matching_spans(
            docs, bench, k=8, distributed=True, num_buckets=5
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    import pandas as pd

    pd.testing.assert_frame_equal(out.reset_index(), out2.reset_index())
