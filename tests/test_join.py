"""Join primitives vs a pandas/DuckDB reference."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.functions import join as J


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(1)
    left = pd.DataFrame(
        {
            "k": [f"k{i}" for i in rng.randint(0, 300, 2000)],
            "x": rng.randint(0, 100, 2000).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": [f"k{i}" for i in range(0, 400, 2)],
            "y": np.arange(0, 400, 2).astype("int64"),
        }
    )
    return left, right, rd.from_pandas(left).repartition(5), rd.from_pandas(
        right
    ).repartition(3)


def _norm(df):
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def test_broadcast_join(sides):
    left, right, lds, _ = sides
    got = _norm(J.broadcast_join(lds, right, on="k", how="left").to_pandas())
    want = _norm(left.merge(right, on="k", how="left"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_inner(sides):
    left, right, lds, rds = sides
    got = _norm(
        J.hash_join(lds, rds, on="k", how="inner", num_partitions=8)
        .to_pandas()[["k", "x", "y"]]
    )
    want = _norm(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_inner(sides):
    left, right, lds, rds = sides
    got = _norm(J.bucket_join(lds, rds, on="k").to_pandas()[["k", "x", "y"]])
    want = _norm(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_left(sides):
    left, right, lds, rds = sides
    got = _norm(
        J.bucket_join(lds, rds, on="k", how="left").to_pandas()[
            ["k", "x", "y"]
        ]
    )
    want = _norm(left.merge(right, on="k", how="left"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_matches_merge_asof(ray_session):
    """Bucketed asof_join equals a driver-side global pd.merge_asof."""
    import numpy as np
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import asof_join

    rng = np.random.RandomState(4)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], size=200),
            "t": rng.randint(0, 1000, size=200).astype("int64"),
            "lval": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=60),
            "t": rng.randint(0, 1000, size=60).astype("int64"),
            "rval": np.arange(60) * 10,
        }
    )
    # keep (k, t) unique on the right so the match is unambiguous
    right = right.drop_duplicates(["k", "t"])
    got = (
        asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            by="k",
            on="t",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "t", "lval"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort"),
            on="t",
            by="k",
        )
        .sort_values(["k", "t", "lval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_asof_join_forward_direction(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import asof_join

    left = pd.DataFrame({"k": ["a", "a"], "t": [5, 20], "lv": [1, 2]})
    right = pd.DataFrame({"k": ["a", "a"], "t": [10, 30], "rv": [7, 9]})
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="k", on="t", direction="forward",
        )
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    assert got.rv.tolist() == [7, 9]


def test_range_join_broadcast(ray_session):
    import numpy as np
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        range_join_broadcast,
    )

    left = pd.DataFrame(
        {"v": [0.0, 49.9, 50.0, 999.0, 5000.0, -3.0, np.nan]}
    )
    bands = pd.DataFrame(
        {
            "lo": [0.0, 50.0, 1000.0],
            "hi": [50.0, 1000.0, None],
            "band": ["low", "mid", "high"],
        }
    )
    out = (
        range_join_broadcast(rd.from_pandas(left), bands, value_col="v")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    by_v = dict(zip(out.v, out.band))
    assert by_v[0.0] == "low" and by_v[49.9] == "low"
    assert by_v[50.0] == "mid" and by_v[999.0] == "mid"
    assert by_v[5000.0] == "high"
    assert by_v[-3.0] is None  # below first band
    assert out[out.v.isna()].band.isna().all()


def test_range_join_rejects_gappy_bands(ray_session):
    import pytest
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        range_join_broadcast,
    )

    left = pd.DataFrame({"v": [1.0]})
    bad = pd.DataFrame(
        {"lo": [0.0, 60.0], "hi": [50.0, None], "band": ["a", "b"]}
    )
    with pytest.raises(ValueError):
        range_join_broadcast(rd.from_pandas(left), bad, value_col="v")


def _left_right(ray_session):
    import pandas as pd
    import ray.data as rd

    left = rd.from_pandas(
        pd.DataFrame(
            {"k": ["a", "b", "c", "d", "a"], "v": [1, 2, 3, 4, 5]}
        )
    )
    right = rd.from_pandas(pd.DataFrame({"k": ["a", "c", "zz"]}))
    return left, right


def test_semi_anti_join_broadcast(ray_session):
    from opentelemetry_collector_components_ray.functions.join import (
        anti_join,
        semi_join,
    )

    left, right = _left_right(ray_session)
    semi = semi_join(left, right, on="k", broadcast=True).to_pandas()
    anti = anti_join(left, right, on="k", broadcast=True).to_pandas()
    assert sorted(semi.v.tolist()) == [1, 3, 5]
    assert sorted(anti.v.tolist()) == [2, 4]


def test_semi_anti_join_bucketed_matches_broadcast(ray_session):
    from opentelemetry_collector_components_ray.functions.join import (
        filter_join,
    )

    left, right = _left_right(ray_session)
    for mode, exp in (("semi", [1, 3, 5]), ("anti", [2, 4])):
        out = filter_join(
            left, right, on="k", mode=mode, broadcast=False, num_buckets=4
        ).to_pandas()
        assert sorted(out.v.tolist()) == exp
        assert list(out.columns) == ["k", "v"]


def test_decontaminate_removes_contaminated_docs(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.decontam import (
        decontaminate,
        flag_contamination,
    )

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "the quick brown fox BENCHMARK SNIPPET here",
                    "unrelated content entirely",
                    "also contains BENCHMARK SNIPPET text",
                    "clean as a whistle",
                ],
            }
        )
    )
    import numpy as np

    snips = np.array(["BENCHMARK SNIPPET"], dtype=object)
    flagged = flag_contamination(docs, snips).to_pandas().sort_values("doc_id")
    assert flagged.n_hits.tolist() == [1, 0, 1, 0]
    clean = decontaminate(docs, snips).to_pandas()
    assert sorted(clean.doc_id.tolist()) == [1, 3]


def test_ngram_contamination(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.decontam import (
        _word_ngrams,
        flag_ngram_contamination,
    )

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "one two three four five six seven eight nine",
                    "ONE two THREE four Five six SEVEN eight ten",
                    "completely different words in this document here now",
                ],
            }
        )
    )
    # benchmark grams = the 8-grams of doc 0
    import pyarrow as pa

    grams, _, _ = _word_ngrams(
        pa.array(["one two three four five six seven eight nine"]), 8
    )
    out = (
        flag_ngram_contamination(docs, np.unique(grams))
        .to_pandas()
        .sort_values("doc_id")
    )
    # doc 0: both of its 8-grams are benchmark grams; doc 1 shares the
    # FIRST 8-gram after lowercasing (word 9 differs); doc 2: none
    assert out.n_hits.tolist() == [2, 1, 0]


def test_filter_join_paths_agree_on_random_data(ray_session):
    """Property: broadcast and bucketed filter joins agree on random
    key distributions (including keys absent from either side)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        filter_join,
    )

    rng = np.random.RandomState(7)
    left = rd.from_pandas(
        pd.DataFrame(
            {
                "k": rng.randint(0, 40, 300),
                "v": np.arange(300),
            }
        )
    )
    right = rd.from_pandas(
        pd.DataFrame({"k": rng.randint(20, 60, 50)})
    )
    for mode in ("semi", "anti"):
        a = filter_join(
            left, right, on="k", mode=mode, broadcast=True
        ).to_pandas()
        b = filter_join(
            left, right, on="k", mode=mode, broadcast=False, num_buckets=8
        ).to_pandas()
        assert sorted(a.v.tolist()) == sorted(b.v.tolist()), mode


def test_filter_join_rows_exchange_matches_keys_exchange(ray_session):
    """The full-row exchange fallback (exchange="rows") and the default
    key-only exchange settle identical row sets, including null-free
    string keys and keys unique to one side."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        filter_join,
    )

    rng = np.random.RandomState(11)
    left = rd.from_pandas(
        pd.DataFrame(
            {
                "k": [f"k{i}" for i in rng.randint(0, 80, 500)],
                "v": np.arange(500),
            }
        )
    ).repartition(4)
    right = rd.from_pandas(
        pd.DataFrame({"k": [f"k{i}" for i in rng.randint(40, 120, 60)]})
    ).repartition(3)
    for mode in ("semi", "anti"):
        keys_path = filter_join(
            left, right, on="k", mode=mode, broadcast=False, num_buckets=8
        ).to_pandas()
        rows_path = filter_join(
            left, right, on="k", mode=mode, broadcast=False, num_buckets=8,
            exchange="rows",
        ).to_pandas()
        assert sorted(keys_path.v.tolist()) == sorted(
            rows_path.v.tolist()
        ), mode


def test_filter_join_empty_right_distributed(ray_session):
    """Empty right side through the key exchange: semi drops all rows,
    anti keeps all rows."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        filter_join,
    )

    left = rd.from_pandas(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}))
    right = rd.from_pandas(pd.DataFrame({"k": ["a"]})).filter(
        lambda r: False
    )
    assert filter_join(
        left, right, on="k", mode="semi", broadcast=False
    ).count() == 0
    assert filter_join(
        left, right, on="k", mode="anti", broadcast=False
    ).count() == 2
