"""Product quantization: codebook shapes, encode determinism,
compact/flat consistency, ADC vs true-distance sanity, and trained
codebooks beating random ones on reconstruction error."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.stages import ann

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_corpus_codebook_shape_and_order(embs):
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    assert cb.shape == (8, 32, 8)
    # code c must be the slice of vec_id == c
    df = embs.filter(expr="vec_id < 32").to_pandas().sort_values("vec_id")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    assert np.allclose(cb[3, 7], mat[7, 24:32])


def test_encode_flat_matches_compact(embs):
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    compact = ann.pq_encode(embs, cb).to_pandas()
    flat = ann.pq_encode_flat(embs, cb).to_pandas()
    for _, row in compact.sample(10, random_state=0).iterrows():
        sub = flat[flat.vec_id == row.vec_id].sort_values("subspace")
        assert sub.code.tolist() == list(row.codes)


def test_self_encoding(embs):
    """A vector that IS a codebook entry must encode to its own code
    in every subspace (distance exactly 0)."""
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    flat = ann.pq_encode_flat(
        embs.filter(expr="vec_id < 32"), cb
    ).to_pandas()
    assert (flat.code == flat.vec_id).all()


def test_adc_topk_rank1_is_self(embs):
    """Each query's own row (ADC distance = sum of its own subspace
    quantization errors... zero when the query is a codebook entry)
    must rank first for codebook-member queries."""
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    codes = ann.pq_encode(embs, cb)
    out = ann.pq_adc_topk(
        codes, embs.filter(expr="vec_id < 3"), cb, k=5
    ).to_pandas()
    r1 = out[out["rank"] == 1]
    assert r1.set_index("query_id")["vec_id"].to_dict() == {0: 0, 1: 1, 2: 2}
    assert (r1.adc_d2 == 0).all()


def test_trained_codebook_beats_random_reconstruction(embs):
    df = embs.to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    trained = ann.pq_train_codebook(embs, m=8, n_codes=16, iters=8)
    rng = np.random.RandomState(0)
    random_cb = np.stack(
        [rng.normal(size=(16, 8)) for _ in range(8)]
    )

    def recon_err(cb):
        err = 0.0
        for s in range(8):
            x = mat[:, s * 8 : (s + 1) * 8]
            d2 = ann._pq_subspace_d2(x, cb[s])
            err += d2.min(axis=1).sum()
        return err

    assert recon_err(trained) < 0.5 * recon_err(random_cb)


def test_adc_approximates_true_distance(ray_session):
    """ADC distance must correlate strongly with the true squared L2
    distance on CLUSTERED vectors (PQ's design regime — isotropic
    random vectors concentrate all distances and are its worst case)."""
    import ray.data as rd

    rng = np.random.RandomState(5)
    centers = rng.normal(size=(20, 64)) * 3.0
    vecs = (
        centers[rng.randint(0, 20, 500)]
        + rng.normal(size=(500, 64)) * 0.3
    )
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(500), "embedding": list(vecs)}
        )
    )
    cb = ann.pq_train_codebook(ds, m=8, n_codes=32, iters=8)
    codes = ann.pq_encode(ds, cb)
    out = ann.pq_adc_topk(
        codes, ds.filter(expr="vec_id < 2"), cb, k=200
    ).to_pandas()
    true_d2 = np.array(
        [
            ((vecs[int(r.query_id)] - vecs[int(r.vec_id)]) ** 2).sum()
            for _, r in out.iterrows()
        ]
    )
    corr = np.corrcoef(out.adc_d2.to_numpy(), true_d2)[0, 1]
    assert corr > 0.95


def test_ivfpq_exhaustive_equals_flat_adc(embs, tmp_path):
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    n_cent = 4
    ann.ivfpq_build_index(
        embs, str(tmp_path / "idx"), n_centroids=n_cent, codebook=cb
    )
    queries = embs.filter(expr="vec_id < 3")
    via_index = ann.ivfpq_search_index(
        str(tmp_path / "idx"), queries, k=8, nprobe=n_cent
    ).to_pandas()
    flat = ann.pq_adc_topk(
        ann.pq_encode(embs, cb), queries, cb, k=8
    ).to_pandas()
    key = ["query_id", "rank"]
    a = via_index.sort_values(key).reset_index(drop=True)
    b = flat.sort_values(key).reset_index(drop=True)
    assert a.vec_id.tolist() == b.vec_id.tolist()
    assert np.allclose(a.adc_d2, b.adc_d2)


def test_ivfpq_pruned_probe_recall(embs, tmp_path):
    """Pruned probes must still recover most of the exhaustive ADC
    top-k (same bar shape as the IVF recall test)."""
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    ann.ivfpq_build_index(
        embs, str(tmp_path / "idx"), n_centroids=4, codebook=cb
    )
    queries = embs.filter(expr="vec_id < 3")
    pruned = ann.ivfpq_search_index(
        str(tmp_path / "idx"), queries, k=8, nprobe=2
    ).to_pandas()
    full = ann.pq_adc_topk(
        ann.pq_encode(embs, cb), queries, cb, k=8
    ).to_pandas()
    hits = 0
    for q in (0, 1, 2):
        want = set(full[full.query_id == q].vec_id)
        got = set(pruned[pruned.query_id == q].vec_id)
        hits += len(want & got)
    assert hits / (3 * 8) >= 0.4  # nprobe=2 of 4 on isotropic data


def test_ivfpq_index_stores_codes_not_vectors(embs, tmp_path):
    import glob
    import os

    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=32)
    ann.ivfpq_build_index(
        embs, str(tmp_path / "pq"), n_centroids=4, codebook=cb
    )
    ann.ivf_build_index(embs, str(tmp_path / "ivf"), n_centroids=4)

    def nbytes(d, sub):
        return sum(
            os.path.getsize(p)
            for p in glob.glob(f"{d}/{sub}/**/*.parquet", recursive=True)
        )

    assert nbytes(tmp_path / "pq", "codes") < 0.5 * nbytes(
        tmp_path / "ivf", "vectors"
    )
