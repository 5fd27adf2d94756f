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
