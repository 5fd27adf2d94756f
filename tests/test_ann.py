"""Similarity search: brute-force top-k vs SQL oracle; LSH near-dup recall."""

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages import ann


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()


def test_cosine_topk_matches_oracle(emb_ds, oracle):
    queries = emb_ds.filter(expr="vec_id < 5")
    got = ann.cosine_topk(emb_ds, queries, k=10).to_pandas()
    want = oracle.execute(ann.cosine_topk_sql(k=10, n_queries=5)).df()
    assert_frames_equal(got, want, ["query_id", "rank"])


def test_topk_self_is_rank_one(emb_ds):
    queries = emb_ds.filter(expr="vec_id < 3")
    got = ann.cosine_topk(emb_ds, queries, k=5).to_pandas()
    top1 = got[got["rank"] == 1]
    assert (top1.query_id.to_numpy() == top1.vec_id.to_numpy()).all()
    assert (top1.sim == 1.0).all()


def test_ivf_topk_recall_vs_brute_force(emb_ds):
    queries = emb_ds.filter(expr="vec_id < 5")
    brute = ann.cosine_topk(emb_ds, queries, k=10).to_pandas()
    ivf = ann.ivf_topk(
        emb_ds, queries, k=10, n_centroids=16, nprobe=10
    ).to_pandas()
    recalls = []
    for q in brute.query_id.unique():
        want = set(brute[brute.query_id == q].vec_id)
        got = set(ivf[ivf.query_id == q].vec_id)
        recalls.append(len(want & got) / len(want))
    # training is now fully deterministic (sorted sample + fixed-order
    # matmul), so this is a stable number, not a flaky bound
    assert sum(recalls) / len(recalls) >= 0.85, recalls
    # self-match must survive probing (query's own bucket is probed)
    top1 = ivf[ivf["rank"] == 1]
    assert (top1.query_id.to_numpy() == top1.vec_id.to_numpy()).all()


def test_ivf_deterministic(emb_ds):
    queries = emb_ds.filter(expr="vec_id < 3")
    a = ann.ivf_topk(emb_ds, queries, k=5).to_pandas()
    b = ann.ivf_topk(emb_ds.repartition(5), queries, k=5).to_pandas()
    assert a.vec_id.tolist() == b.vec_id.tolist()


def _emb_with_dups(n=200, d=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, d))
    rows = [(i, m[i].astype(np.float32).tolist()) for i in range(n)]
    # inject near-identical vectors
    for j, i in enumerate([4, 60, 123]):
        v = m[i] + rng.normal(scale=0.01, size=d)
        rows.append((n + j, v.astype(np.float32).tolist()))
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def test_embedding_clusters_group_near_copies(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    rows = []
    for fam in range(20):
        base = rng.normal(size=16)
        for rep in range(4):
            v = base + rng.normal(scale=0.01, size=16)
            rows.append((fam * 10 + rep, v.astype(np.float32).tolist()))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    cl = ann.embedding_clusters(
        rd.from_pandas(df), dim=16, n_bits=10, n_tables=4
    ).to_pandas()
    cl["family"] = cl.vec_id // 10
    per_fam = cl.groupby("family")["cluster_id"].nunique()
    # near-identical vectors share all hyperplane signs w.h.p.
    assert (per_fam == 1).mean() >= 0.9
    # distinct random families should (mostly) not merge
    assert cl.cluster_id.nunique() >= 15


def test_cosine_near_dup_pairs_finds_injected(ray_session):
    import ray.data as rd

    df = _emb_with_dups()
    got = ann.cosine_near_dup_pairs(
        rd.from_pandas(df), threshold=0.99, dim=16
    ).to_pandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    assert {(4, 200), (60, 201), (123, 202)} <= pairs
    assert (got.sim >= 0.99).all()


def test_embedding_clusters_distributed_equals_driver(emb_ds):
    from opentelemetry_collector_components_ray.stages.ann import (
        embedding_clusters,
    )

    dist = (
        embedding_clusters(emb_ds, distributed=True, coarse_buckets=8)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    drv = (
        embedding_clusters(emb_ds, distributed=False)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(dist.astype("int64"), drv.astype("int64"))


def test_planted_twins_found_with_high_recall(emb_ds):
    """plant_near_dup_twins + multi-table LSH: ≥90% of planted pairs
    recovered at τ=0.99 and no organic (unplanted) pair qualifies."""
    planted = ann.plant_near_dup_twins(emb_ds, every=10, eps=0.1)
    got = ann.cosine_near_dup_pairs(planted, threshold=0.99).to_pandas()
    # vec_ids are contiguous 0..n-1 in the fixture
    n_planted = (emb_ds.count() + 9) // 10
    assert len(got) > 0
    # every found pair is (v, its twin)
    assert (got.id_b - got.id_a == 1_000_000).all()
    assert (got.sim >= 0.99).all()
    assert len(got) >= 0.9 * n_planted


def test_ivf_index_search_equals_streaming_ivf(emb_ds, tmp_path):
    """Build-once parquet IVF index searched with partition-pruned
    reads returns exactly what the streaming ivf_topk returns for the
    same centroids/probes."""
    idx = str(tmp_path / "ivf")
    ann.ivf_build_index(emb_ds, idx, n_centroids=8)
    q = emb_ds.filter(expr="vec_id < 5")
    got = (
        ann.ivf_search_index(idx, q, k=10, nprobe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        ann.ivf_topk(emb_ds, q, k=10, n_centroids=8, nprobe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)

    # the pruned read touches at most nprobe*|queries| partitions
    import glob

    all_parts = glob.glob(f"{idx}/vectors/centroid_id=*")
    assert len(all_parts) >= 5  # corpus actually spread over partitions


def test_quantize_embeddings_roundtrip(emb_ds):
    """int8 quantization: |q| ≤ 127, dequantized error ≤ scale/254 per
    dim, zero vectors get scale 0."""
    got = ann.quantize_embeddings(emb_ds).to_pandas()
    assert len(got) == emb_ds.count()
    for _, row in got.head(20).iterrows():
        q = np.asarray(row.qvec, dtype=np.float64)
        assert np.abs(q).max() <= 127
    # cross-check flat vs list form on one vector
    flat = ann.quantize_embeddings_flat(
        emb_ds.filter(expr="vec_id < 3")
    ).to_pandas()
    lst = got[got.vec_id < 3].sort_values("vec_id")
    for vid in range(3):
        f = flat[flat.vec_id == vid].sort_values("dim_idx")
        l = np.asarray(lst[lst.vec_id == vid].qvec.iloc[0], dtype=np.int64)
        assert (f.q.to_numpy() == l).all()


def test_embedding_clusters_verified_twins(ray_session):
    """threshold mode: planted twins cluster with their original, all
    other vectors stay singletons."""
    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )
    from opentelemetry_collector_components_ray.stages import ann

    embs = read_parquet_clean(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    planted = ann.plant_near_dup_twins(embs, every=10, eps=0.1)
    out = ann.embedding_clusters(
        planted, threshold=0.99, n_bits=6, n_tables=8
    ).to_pandas()
    label = dict(zip(out["vec_id"], out["cluster_id"]))
    n_twin = 0
    for vid, lab in label.items():
        if vid >= 1_000_000:
            assert lab == vid - 1_000_000
            n_twin += 1
        else:
            assert lab == vid
    assert n_twin > 0


def test_distributed_kmeans_matches_driver_trainer(ray_session):
    """Same seeded init + same math over the same full corpus: the
    sharded trainer converges to the driver-sample trainer's centroids
    (cross-block float sum order differs only in the last ulp)."""
    import numpy as np

    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )
    from opentelemetry_collector_components_ray.stages import ann

    embs = read_parquet_clean("/root/testdata/sf0.001/embeddings.parquet")
    driver = ann.train_centroids(embs, 8, iters=6)
    dist = ann.train_centroids_distributed(embs, 8, iters=6)
    assert dist.shape == driver.shape
    assert np.allclose(dist, driver, atol=1e-8)
