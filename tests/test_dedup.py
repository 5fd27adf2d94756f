"""Dedup stages: exact vs oracle; MinHash-LSH & SimHash vs brute force."""

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages import dedup


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet").materialize()


def test_exact_dedup_matches_oracle(docs_ds, oracle):
    got = dedup.exact_dedup(docs_ds).to_pandas()
    want = oracle.execute(dedup.EXACT_DEDUP_SQL).df()
    assert_frames_equal(got, want, ["doc_id"])


def test_dedup_stats_matches_oracle(docs_ds, oracle):
    got = dedup.dedup_stats(docs_ds)
    want = oracle.execute(dedup.DEDUP_STATS_SQL).df()
    assert_frames_equal(got, want, ["n_docs"])


def test_exact_dedup_keeps_min_id(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": [5, 3, 9, 1],
            "text": ["same", "same", "other", "same"],
        }
    )
    out = dedup.exact_dedup(rd.from_pandas(df)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [1, 9]


def _corpus_with_near_dups(n=120, seed=7):
    """Random word docs + injected near-duplicate pairs."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(n):
        words = list(rng.choice(vocab, size=40))
        rows.append((i, " ".join(words)))
    # inject near dups: copy doc i -> doc n+i with 2 words changed
    for j, i in enumerate([3, 17, 42]):
        words = rows[i][1].split()
        words[0] = "changed0"
        words[20] = "changed20"
        rows.append((n + j, " ".join(words)))
    # and one exact dup
    rows.append((n + 50, rows[5][1]))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_minhash_near_dups_matches_brute_force(ray_session):
    import ray.data as rd

    df = _corpus_with_near_dups()
    got = (
        dedup.minhash_near_dups(rd.from_pandas(df), threshold=0.8)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = dedup.brute_force_jaccard_pairs(df, 0.8)
    assert got[["id_a", "id_b"]].values.tolist() == (
        want[["id_a", "id_b"]].values.tolist()
    )
    assert len(got) >= 4  # 3 injected near dups + 1 exact dup
    np.testing.assert_allclose(got.jaccard, want.jaccard, atol=1e-6)


def test_minhash_no_false_negatives_on_exact_dups(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c d e f", "a b c d e f", "x y z q r s"]}
    )
    got = dedup.minhash_near_dups(rd.from_pandas(df), threshold=0.99).to_pandas()
    assert got[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert got.jaccard.iloc[0] == 1.0


def test_lsh_distributed_path_equals_default(ray_session):
    """The hash-shuffle candidate path (scale) and the coalesce path
    (default) produce the same candidate set."""
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.dedup import (
        MinHasher,
        lsh_candidate_pairs,
    )

    df = _corpus_with_near_dups()
    sigs = (
        rd.from_pandas(df)
        .map_batches(
            MinHasher,
            batch_format="pyarrow",
            batch_size=32,
            concurrency=2,
            num_cpus=1,
        )
        .materialize()
    )
    a = (
        lsh_candidate_pairs(sigs, distributed=False)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    b = (
        lsh_candidate_pairs(sigs, distributed=True)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert a.values.tolist() == b.values.tolist()
    assert len(a) >= 4


def test_simhash_near_dups_finds_injected(ray_session):
    import ray.data as rd

    df = _corpus_with_near_dups()
    got = (
        dedup.simhash_near_dups(rd.from_pandas(df), hamming_k=6)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    pairs = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
    # exact dup must be found (hamming 0)
    assert (5, 170) in pairs
    assert got.set_index(["id_a", "id_b"]).loc[(5, 170), "hamming"] == 0


def test_minhash_clusters_group_replicas(ray_session):
    """Label propagation groups each replica family into one cluster
    with the min id as representative — no pairwise enumeration."""
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.dedup import (
        minhash_clusters,
        minhash_dedup_keep,
    )

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for fam in range(30):
        words = list(rng.choice(vocab, size=60))
        for rep in range(5):
            w = list(words)
            if rep:
                w[rep] = f"alt{rep}"  # near-copy
            rows.append((fam * 100 + rep, " ".join(w)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    cl = minhash_clusters(rd.from_pandas(df)).to_pandas()
    assert len(cl) == len(df)
    # every member of family f labelled with its min id f*100
    cl["family"] = cl.doc_id // 100
    per_fam = cl.groupby("family")["cluster_id"].nunique()
    assert (per_fam == 1).all()
    assert (cl.cluster_id == cl.family * 100).all()

    keep = minhash_dedup_keep(rd.from_pandas(df)).to_pandas()
    assert sorted(keep.doc_id) == [f * 100 for f in range(30)]


def test_shingles_deterministic():
    a = dedup._shingles("the quick brown fox jumps", 3)
    b = dedup._shingles("the quick brown fox jumps", 3)
    assert (a == b).all()
    assert len(a) == 3  # 5 words → 3 tri-shingles


def test_exact_dedup_distributed_equals_coalesced(docs_ds):
    dist = (
        dedup.exact_dedup(docs_ds, distributed=True, num_buckets=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    coal = (
        dedup.exact_dedup(docs_ds, distributed=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, coal)


def test_label_propagation_ds_equals_driver(ray_session):
    """Distributed CC (3-phase hash-to-min + pointer doubling) reaches
    the same fixed point as the driver-side propagation — including on
    a 100-link chain, the worst case for plain min-propagation."""
    import ray.data as rd

    rng = np.random.RandomState(0)
    edges = []
    for i in range(99):  # chain 0-1-2-...-99 via buckets
        edges += [(1000 + i, i), (1000 + i, i + 1)]
    for c in range(50):  # random clusters
        members = rng.randint(200, 5000, size=rng.randint(2, 20))
        edges += [(2000 + c, int(m)) for m in members]
    edges += [(9000 + i, 10000 + i) for i in range(100)]  # singletons
    df = pd.DataFrame(edges, columns=["bkey", "doc_id"])

    want = dedup.label_propagation(
        df.bkey.to_numpy(), df.doc_id.to_numpy(), max_rounds=200
    ).rename(columns={"id": "doc_id"})
    assert (want[want.doc_id < 100].cluster_id == 0).all()

    got = dedup.label_propagation_ds(
        rd.from_pandas(df).repartition(8), coarse_buckets=16
    ).to_pandas()
    a = want.sort_values("doc_id").reset_index(drop=True)
    b = (
        got.sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "cluster_id": "int64"})
    )
    pd.testing.assert_frame_equal(a.astype("int64"), b)


def test_minhash_clusters_distributed_equals_driver(ray_session):
    import ray.data as rd

    df = _corpus_with_near_dups()
    ds = rd.from_pandas(df).repartition(4)
    dist = (
        dedup.minhash_clusters(ds, distributed=True, coarse_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    drv = (
        dedup.minhash_clusters(ds, distributed=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        dist.astype("int64"), drv.astype("int64")
    )


def test_minhash_verify_partitioned_equals_broadcast(ray_session):
    """The id-hash-partitioned Jaccard verify (no whole-corpus
    broadcast) produces byte-identical pairs to the broadcast path."""
    import ray.data as rd

    df = _corpus_with_near_dups()
    ds = rd.from_pandas(df).repartition(4)
    part = (
        dedup.minhash_near_dups(
            ds, threshold=0.8, verify="partitioned", num_buckets=8
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    bc = (
        dedup.minhash_near_dups(ds, threshold=0.8, verify="broadcast")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(part, bc)


def test_simhash_distributed_equals_coalesced(ray_session):
    import ray.data as rd

    df = _corpus_with_near_dups()
    ds = rd.from_pandas(df).repartition(4)
    cols = ["id_a", "id_b"]
    dist = (
        dedup.simhash_near_dups(ds, hamming_k=3, distributed=True,
                                coarse_buckets=16)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    coal = (
        dedup.simhash_near_dups(ds, hamming_k=3, distributed=False)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, coal)


def test_simhash_duckdb_hash_matches_sql_signature():
    """The word_hash="duckdb" signature must be bit-for-bit
    reproducible by the SQL oracle's 64-bit-majority reconstruction —
    the soundness premise of the d_simhash_pairs value gate."""
    import duckdb
    import pyarrow as pa

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different words entirely here now",
        "",  # wordless doc → signature 0 on both sides
        "punctuation, splitting; and CASE Folding!",
    ]
    sh = dedup.SimHasher(word_hash="duckdb").simhash_batch(texts)
    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    con = duckdb.connect()
    con.register("documents", t)
    sums = ",".join(
        f"sum(((hash(word) >> {b}) & 1::UBIGINT)::BIGINT) AS s{b}"
        for b in range(64)
    )
    sig = " + ".join(
        f"(CASE WHEN 2*s{b} > cnt THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(63)
    ) + (
        " + (CASE WHEN 2*s63 > cnt THEN (-9223372036854775807 - 1)"
        " ELSE 0 END)"
    )
    got = con.execute(
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all("
        "lower(text), '\\w+')) AS word FROM documents), "
        f"bits AS (SELECT doc_id, count(*) AS cnt, {sums} FROM w "
        "GROUP BY doc_id) "
        f"SELECT COALESCE({sig}, 0) AS sig FROM documents d "
        "LEFT JOIN bits USING (doc_id) ORDER BY d.doc_id"
    ).fetchnumpy()["sig"]
    assert np.array_equal(sh.astype(np.int64), got)
    assert sh[3] == 0


def test_simhash_duckdb_pairs_match_native_pipeline(ray_session):
    """Same pipeline, different hash constant: the duckdb-hash variant
    must still find the planted near-dups."""
    import ray.data as rd

    df = _corpus_with_near_dups()
    ds = rd.from_pandas(df).repartition(4)
    got = (
        dedup.simhash_near_dups(ds, hamming_k=6, word_hash="duckdb")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) >= 1
    assert (got["hamming"] <= 6).all()


def test_dedup_stats_distributed_equals_coalesced(docs_ds):
    dist = dedup.dedup_stats(docs_ds, distributed=True, num_buckets=7)
    coal = dedup.dedup_stats(docs_ds, distributed=False)
    pd.testing.assert_frame_equal(dist, coal)


def test_minhash_dedup_keep_verified_matches_union_find(ray_session):
    """Verified-edge survivors == union-find over brute-force pairs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import dedup

    base = [
        f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
        f"iota kappa lambda mu nu xi omicron pi rho sigma tau"
        for i in range(30)
    ]
    texts, ids = [], []
    for i, t in enumerate(base):
        texts.append(t)
        ids.append(i)
    # chain: 100 ~ 101 ~ 102 (identical texts → jaccard 1)
    for j, tid in enumerate((100, 101, 102)):
        texts.append(base[0])
        ids.append(tid)
    docs = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    out = (
        dedup.minhash_dedup_keep_verified(docs, threshold=0.8)
        .to_pandas()["doc_id"]
        .sort_values()
        .tolist()
    )
    # component {0, 100, 101, 102} keeps 0; everything else survives
    expect = sorted(set(ids) - {100, 101, 102})
    assert out == expect


def test_clusters_from_pairs_chain_and_singletons(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.dedup import (
        clusters_from_pairs,
    )

    pairs = rd.from_arrow(
        pa.table({"id_a": pa.array([1, 2, 7], pa.int64()),
                  "id_b": pa.array([2, 3, 9], pa.int64())})
    )
    ids = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(10)), pa.int64())})
    )
    out = (
        clusters_from_pairs(pairs, ids)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    label = dict(zip(out["doc_id"], out["cluster_id"]))
    assert label[1] == label[2] == label[3] == 1
    assert label[7] == label[9] == 7
    for s in (0, 4, 5, 6, 8):
        assert label[s] == s


def test_cross_corpus_near_dups(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.dedup import (
        cross_corpus_near_dups,
    )

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river in the warm morning sun with birds singing")
    a = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                base,
                base.replace("lazy", "sleepy"),  # in-corpus near dup: excluded
                "totally unrelated content about winter snow and long "
                "dark evenings by the fire with tea and books",
            ],
        }
    )
    b = pd.DataFrame(
        {
            "doc_id": [0, 7],
            "text": [
                "fresh words entirely new to both corpora about sailing "
                "boats on a green lake under tall white clouds",
                base.replace("morning", "evening"),  # cross dup of a:0/a:1
            ],
        }
    )
    out = (
        cross_corpus_near_dups(
            rd.from_pandas(a), rd.from_pandas(b), threshold=0.5
        )
        .to_pandas()
        .sort_values(["doc_id", "corpus_b_id"])
        .reset_index(drop=True)
    )
    # only cross pairs; b ids restored to their own space
    assert set(zip(out["doc_id"], out["corpus_b_id"])) == {(0, 7), (1, 7)}
    assert (out["jaccard"] >= 0.5).all()
