"""Distributed Gram reduce and PCA whitening: DuckDB value gate for
the flat Gram form (same gate the driver queries use, run in-test),
whitened-covariance identity, and determinism across block layouts."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.stages import ann

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_gram_flat_matches_duckdb(embs):
    got = (
        ann.gram_flat(embs)
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = (
        con.execute(ann.gram_flat_sql(dim=64))
        .df()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 64 * 65 // 2
    assert (got.i.to_numpy() == want.i.to_numpy()).all()
    assert (got.j.to_numpy() == want.j.to_numpy()).all()
    assert (got.g.to_numpy() == want.g.to_numpy()).all()


def test_gram_matches_numpy(embs):
    g, s, n = ann.gram_matrix(embs)
    df = embs.to_pandas()
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    assert n == len(x)
    assert np.allclose(g, x.T @ x)
    assert np.allclose(s, x.sum(axis=0))


def test_whitened_covariance_is_identity(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(0)
    # anisotropic: stretch some directions hard
    base = rng.normal(size=(2000, 16)) * np.linspace(0.1, 5.0, 16)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(2000), "embedding": list(base)}
        )
    ).repartition(5)
    out = ann.pca_whiten(ds, vec_col="embedding").to_pandas()
    w = np.stack(out["whitened"].to_numpy())
    cov = np.cov(w, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(16), atol=1e-6)


def test_whiten_deterministic_across_layouts(embs, ray_session):
    import ray.data as rd

    df = embs.to_pandas()
    a = (
        ann.pca_whiten(embs, k=8)
        .to_pandas()
        .sort_values("vec_id")
    )
    b = (
        ann.pca_whiten(rd.from_pandas(df).repartition(11), k=8)
        .to_pandas()
        .sort_values("vec_id")
    )
    wa = np.stack(a["whitened"].to_numpy())
    wb = np.stack(b["whitened"].to_numpy())
    assert np.allclose(wa, wb, atol=1e-9)
    assert wa.shape[1] == 8


def test_pca_rotate_preserves_distances(embs):
    out = ann.pca_rotate(embs, m=8).to_pandas().sort_values("vec_id")
    raw = np.stack(out["embedding"].to_numpy()).astype(np.float64)
    rot = np.stack(out["rotated"].to_numpy())
    d_raw = ((raw[0] - raw[1:20]) ** 2).sum(axis=1)
    d_rot = ((rot[0] - rot[1:20]) ** 2).sum(axis=1)
    assert np.allclose(d_raw, d_rot)


def test_pca_rotate_improves_pq_on_mixed_axes(ray_session):
    """Axis-aligned cluster structure scrambled by a dense random
    rotation: raw subspaces see correlated mixtures and PQ degrades;
    pca_rotate recovers decorrelated axes (keeping scale) and ADC
    fidelity must improve."""
    import ray.data as rd

    rng = np.random.RandomState(2)
    d = 32
    centers = rng.normal(size=(12, d)) * np.linspace(4.0, 0.1, d)
    axis_data = (
        centers[rng.randint(0, 12, 700)]
        + rng.normal(size=(700, d)) * 0.3
    )
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    mixed = axis_data @ q  # dense correlation across all dims

    def corr_for(mat):
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(len(mat)), "embedding": list(mat)}
            )
        )
        cb = ann.pq_train_codebook(ds, m=4, n_codes=16, iters=6)
        out = ann.pq_adc_topk(
            ann.pq_encode(ds, cb),
            ds.filter(expr="vec_id < 2"), cb, k=150,
        ).to_pandas()
        true = np.array(
            [
                ((mat[int(r.query_id)] - mat[int(r.vec_id)]) ** 2).sum()
                for _, r in out.iterrows()
            ]
        )
        return np.corrcoef(out.adc_d2.to_numpy(), true)[0, 1]

    mixed_corr = corr_for(mixed)
    ds0 = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(len(mixed)), "embedding": list(mixed)}
        )
    )
    rdf = ann.pca_rotate(ds0, m=4).to_pandas().sort_values("vec_id")
    rot = np.stack(rdf["rotated"].to_numpy())
    rot_corr = corr_for(rot)
    assert rot_corr > mixed_corr
