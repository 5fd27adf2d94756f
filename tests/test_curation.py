"""Curation composition and incremental dedup against the persistent
fingerprint index."""

import glob

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.stages.curation import (
    CurationConfig,
    curate,
    incremental_dedup,
)


def _docs(ray_session, texts, start_id=0):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(start_id, start_id + len(texts)),
                "text": texts,
            }
        )
    ).repartition(3)


GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "sleeps near the river with a friendly dog in the warm sun"
)


def test_curate_filters_dedups_and_packs(ray_session):
    texts = [
        GOOD,                       # keeps
        GOOD,                       # exact dup → dropped
        "zz zz zz zz zz zz",        # repetition + und language → dropped
        "el perro y el gato en la casa grande con mucha comida el "
        "perro duerme y el gato come en la cocina con la familia",
        GOOD + " extra tail words about the meadow and the morning",
    ]
    out = curate(
        _docs(ray_session, texts),
        cfg=CurationConfig(near_dup=False, pack_budget=16),
    ).to_pandas()
    # doc 0 survives, doc 1 is an exact dup, 2 fails quality, 3 is
    # Spanish, 4 survives
    assert sorted(out.doc_id.tolist()) == [0, 4]
    assert {"pack_offset", "pack_first_chunk", "pack_n_chunks"} <= set(
        out.columns
    )
    o = out.sort_values("doc_id")
    assert o.pack_offset.tolist()[0] == 0
    assert o.pack_offset.tolist()[1] == o.n_tokens.tolist()[0]


def test_curate_near_dup_drops_twin(ray_session):
    texts = [
        GOOD,
        GOOD.replace("lazy", "sleepy"),  # near dup of doc 0
        "completely different content about mountains and snow and "
        "long winter evenings by the fire with hot tea and old books",
    ]
    out = curate(
        _docs(ray_session, texts),
        cfg=CurationConfig(near_dup=True, pack_budget=64),
    ).to_pandas()
    assert sorted(out.doc_id.tolist()) == [0, 2]


def test_curate_writes_partitioned(ray_session, tmp_path):
    texts = [GOOD + f" variation {i}" for i in range(30)]
    curate(
        _docs(ray_session, texts),
        out_dir=str(tmp_path / "out"),
        cfg=CurationConfig(near_dup=False, pack_budget=8,
                           partition_chunks=16),
    )
    parts = glob.glob(str(tmp_path / "out" / "pack_partition=*"))
    assert len(parts) >= 2  # enough chunks to span partitions


def test_incremental_dedup_across_runs(ray_session, tmp_path):
    idx = str(tmp_path / "fpindex")
    batch1 = _docs(ray_session, ["aaa", "bbb", "ccc", "aaa"])
    fresh1 = incremental_dedup(batch1, idx, run_id="r1").to_pandas()
    assert sorted(fresh1.text.tolist()) == ["aaa", "bbb", "ccc"]

    # second ingest: one repeat of history, one new
    batch2 = _docs(ray_session, ["bbb", "ddd"], start_id=10)
    fresh2 = incremental_dedup(batch2, idx, run_id="r2").to_pandas()
    assert fresh2.text.tolist() == ["ddd"]

    # idempotent re-run of r2 must not double-register
    batch2b = _docs(ray_session, ["bbb", "ddd"], start_id=10)
    fresh2b = incremental_dedup(batch2b, idx, run_id="r2").to_pandas()
    assert fresh2b.text.tolist() == ["ddd"]

    # third ingest sees ddd as history exactly once
    batch3 = _docs(ray_session, ["ddd", "eee"], start_id=20)
    fresh3 = incremental_dedup(batch3, idx, run_id="r3").to_pandas()
    assert fresh3.text.tolist() == ["eee"]


def test_embedding_decontam_report(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import decontam

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": [
                rng.normal(size=16).astype(np.float32) for _ in range(60)
            ],
        }
    )
    out = decontam.embedding_decontam_report(
        rd.from_pandas(df).repartition(4)
    ).to_pandas()
    assert len(out) == 60  # corpus rows only, twins excluded
    by_id = out.set_index("doc_id")
    planted = set(range(0, 60, decontam.EMB_EVERY))
    got = set(by_id[by_id["status"] == "contaminated"].index)
    assert got == planted  # exactly the docs with a planted twin
    assert (by_id.loc[sorted(planted), "n_hits"] == 1).all()


def test_curate_substring_stage_rewrites_spans(ray_session):
    shared = ("a little boat sails down the long green valley past "
              "the old stone mill")
    texts = [
        GOOD + " " + shared,                 # keeper of the span
        "different opening words here today now " + shared,
        "completely different content about mountains and snow and "
        "long winter evenings by the fire with hot tea and old books",
    ]
    out = curate(
        _docs(ray_session, texts),
        cfg=CurationConfig(near_dup=False, substring_k=8, pack_budget=64),
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(out.doc_id.tolist()) == [0, 1, 2]
    # doc 1 lost the shared 12-word span; doc 0 (keeper) kept it
    t0, t1 = out.loc[0, "text"], out.loc[1, "text"]
    assert shared in t0
    assert shared not in t1
    assert t1.startswith("different opening words")
    # the packing budget saw the POST-removal token counts
    assert out.loc[1, "n_tokens"] < out.loc[0, "n_tokens"]


def test_curate_substring_reapplies_quality_mask(ray_session):
    # doc 1 is ONLY the shared span plus two filler words: after span
    # removal it drops below min_tokens and must be filtered out, not
    # packed (round-3 advice finding: post-rewrite quality drift)
    shared = ("a little boat sails down the long green valley past "
              "the old stone mill")
    texts = [
        GOOD + " " + shared,     # keeper of the span
        "um well " + shared,     # 2 tokens once the span is removed
        "completely different content about mountains and snow and "
        "long winter evenings by the fire with hot tea and old books",
    ]
    out = curate(
        _docs(ray_session, texts),
        cfg=CurationConfig(near_dup=False, substring_k=8, pack_budget=64,
                           min_tokens=5),
    ).to_pandas()
    assert sorted(out.doc_id.tolist()) == [0, 2]
