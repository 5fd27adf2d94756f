"""Property-based tests (hypothesis) for the pure kernels.

The reference has no randomized testing (SURVEY.md §5); these go
beyond it: the engine's algebraic claims — merge commutativity /
associativity, parse totality, round-trip stability — hold for
arbitrary inputs, not just fixtures.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_components_ray.functions.histograms import (
    ExplicitHist,
    ExpoHist,
)
from opentelemetry_collector_components_ray.functions.sketches import (
    HyperLogLog,
    hash64,
)
from opentelemetry_collector_components_ray.stages.enrich import (
    enrich_scalar_batch,
    sanitize_name,
)
from opentelemetry_collector_components_ray.stages.parse import parse_batch

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


def _batch(text_list):
    n = len(text_list)
    return pa.table(
        {
            "conv_id": ["c"] * n,
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": ["user"] * n,
            "text": pa.array(text_list, pa.string()),
            "tool": [""] * n,
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )


@settings(max_examples=50, deadline=None)
@given(st.lists(texts, min_size=1, max_size=20))
def test_parse_total_on_arbitrary_text(text_list):
    """Parse never raises and never drops rows, whatever the text
    (per-event error accumulation semantics, stream.go:236-243)."""
    out = parse_batch(_batch(text_list))
    assert out.num_rows == len(text_list)
    # weight defaults to 1.0 whenever no p-token parsed
    w = out["weight"].to_pylist()
    assert all(v >= 1.0 for v in w)


@settings(max_examples=50, deadline=None)
@given(st.lists(texts, min_size=1, max_size=20))
def test_enrich_total_and_outcome_closed(text_list):
    out = enrich_scalar_batch(parse_batch(_batch(text_list)))
    assert set(out["event_outcome"].to_pylist()) <= {
        "success",
        "failure",
        "unknown",
    }


@settings(max_examples=100, deadline=None)
@given(texts)
def test_sanitize_output_alphabet(s):
    """resource.go:297-307: output only [a-zA-Z0-9 _-], ≤100 units."""
    out = sanitize_name(pa.array([s])).to_pylist()[0]
    assert len(out) <= 100
    assert all(c.isalnum() or c in " _-" for c in out if ord(c) < 128)
    assert all(ord(c) < 128 for c in out)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(0.01, 1e6), min_size=1, max_size=60),
    st.lists(st.floats(0.01, 1e6), min_size=1, max_size=60),
)
def test_expo_merge_commutative_property(xs, ys):
    a1 = ExpoHist.from_values(np.array(xs), 4).merge(
        ExpoHist.from_values(np.array(ys), 4)
    )
    a2 = ExpoHist.from_values(np.array(ys), 4).merge(
        ExpoHist.from_values(np.array(xs), 4)
    )
    assert a1.scale == a2.scale and a1.offset == a2.offset
    assert a1.counts.tolist() == a2.counts.tolist()
    assert a1.count == a2.count


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(-1e5, 1e5), max_size=40),
    st.lists(st.floats(-1e5, 1e5), max_size=40),
)
def test_explicit_merge_totals(xs, ys):
    bounds = [10.0, 100.0, 1000.0]
    a = ExplicitHist.from_values(np.array(xs), bounds)
    b = ExplicitHist.from_values(np.array(ys), bounds)
    a.merge(b)
    assert a.count == len(xs) + len(ys)
    assert int(a.counts.sum()) == len(xs) + len(ys)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=500))
def test_hll_merge_upper_bound_union(values):
    """Merged estimate ≈ union cardinality within sketch error."""
    half = len(values) // 2
    a = HyperLogLog().add(np.array(values[:half] or [0]))
    b = HyperLogLog().add(np.array(values[half:] or [0]))
    a.merge(b)
    true = len(set(values[:half] or [0]) | set(values[half:] or [0]))
    assert abs(a.estimate() - true) <= max(3.0, 0.1 * true)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=50))
def test_hash64_stable_and_consistent(strs):
    arr = np.asarray(strs, dtype=object)
    h1, h2 = hash64(arr), hash64(arr)
    assert (h1 == h2).all()
    # equal inputs hash equal (vectorized path == per-value path)
    for i, s in enumerate(strs):
        assert h1[i] == hash64(np.asarray([s], dtype=object))[0]


@given(st.lists(st.text(max_size=120), min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_md5vec_matches_hashlib(strs):
    import hashlib

    from opentelemetry_collector_components_ray.functions.md5vec import (
        md5_hex,
        md5_hex_np,
    )

    exp = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strs]
    assert list(md5_hex_np(np.array(strs, dtype=object))) == exp
    assert md5_hex(pa.array(strs, pa.string())).to_pylist() == exp


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False).filter(lambda x: x != 0),
        min_size=1, max_size=300,
    ),
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False).filter(lambda x: x != 0),
        min_size=1, max_size=300,
    ),
)
@settings(max_examples=40, deadline=None)
def test_expo_merge_commutative_with_negatives(xs, ys):
    from opentelemetry_collector_components_ray.functions.histograms import (
        ExpoHist,
    )

    a1 = ExpoHist.from_values(np.array(xs), scale=3)
    b1 = ExpoHist.from_values(np.array(ys), scale=3)
    a2 = ExpoHist.from_values(np.array(xs), scale=3)
    b2 = ExpoHist.from_values(np.array(ys), scale=3)
    m1 = a1.merge(b1)
    m2 = b2.merge(a2)
    assert m1.scale == m2.scale
    assert m1.count == m2.count
    assert int(m1.counts.sum()) == int(m2.counts.sum())
    assert int(m1.neg_counts.sum()) == int(m2.neg_counts.sum())
    assert m1.zero_count == m2.zero_count
    # totals conserved
    assert m1.count == len(xs) + len(ys)
    assert (
        int(m1.counts.sum()) + int(m1.neg_counts.sum()) + m1.zero_count
        == m1.count
    )


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 40)),
        min_size=1, max_size=300,
    )
)
@settings(max_examples=60, deadline=None)
def test_label_propagation_is_connected_components(edges):
    """Driver-side propagation labels == true connected components of
    the bipartite graph (checked against a union-find)."""
    from opentelemetry_collector_components_ray.stages.dedup import (
        label_propagation,
    )

    bkeys = np.array([b for b, _ in edges], dtype=np.int64)
    ids = np.array([i for _, i in edges], dtype=np.int64)
    got = label_propagation(bkeys, ids, max_rounds=200)

    # union-find ground truth over (bucket+OFFSET, id) nodes
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        parent[find(x)] = find(y)

    OFF = 10**9
    for b, i in edges:
        union(b + OFF, i)
    want = {}
    for i in set(ids.tolist()):
        want.setdefault(find(i), []).append(i)
    comp_min = {root: min(members) for root, members in want.items()}
    for _, row in got.iterrows():
        assert row.cluster_id == comp_min[find(int(row.id))]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(max_size=40), min_size=1, max_size=30))
def test_hash64_matches_python_reference(blobs):
    """The buffer-level word-at-a-time hash equals a direct per-value
    python implementation of the same scheme (length-seeded word chain,
    power-of-two padding, splitmix64 finalizer)."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.functions.sketches import (
        hash64,
    )

    M = (1 << 64) - 1

    def sm(x):
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
        return x ^ (x >> 31)

    def ref(b: bytes) -> int:
        acc = sm(len(b) ^ 0x243F6A8885A308D3)
        if b:
            nw = (len(b) + 7) // 8
            W = 1 << max((nw - 1).bit_length(), 0)
            padded = b + b"\x00" * (W * 8 - len(b))
            for j in range(W):
                w = int.from_bytes(padded[8 * j : 8 * j + 8], "little")
                acc = (acc * 1099511628211 + w) & M
        return sm(acc)

    out = hash64(pa.array(blobs, pa.binary()))
    for i, b in enumerate(blobs):
        assert int(out[i]) == ref(b)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_substring_dedup_matches_naive_reference(word_lists, k):
    """Engine substring dedup ≡ a direct per-occurrence reference
    implementation over tiny 4-word-vocab corpora (windows collide
    constantly, exercising keeper choice and span-union merging)."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import substr

    texts = [" ".join(ws) for ws in word_lists]
    ids = list(range(len(texts)))

    # naive reference: string grams, dict bookkeeping
    occ = {}
    for d, ws in zip(ids, [t.split(" ") for t in texts]):
        for p in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[p : p + k]), []).append((d, p))
    removed = {d: set() for d in ids}
    for gram, occs in occ.items():
        if len({d for d, _ in occs}) < 2:
            continue
        keeper = min(occs)
        for d, p in occs:
            if (d, p) != keeper:
                removed[d].update(range(p, p + k))
    want = []
    for d, t in zip(ids, texts):
        ws = t.split(" ")
        kept = [w for i, w in enumerate(ws) if i not in removed[d]]
        want.append((d, len(ws), len(ws) - len(kept), " ".join(kept)))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "n_words", "n_removed", "clean_text"]
    )

    docs = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    got = (
        substr.substring_dedup(docs, k=k, distributed=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(want_df.dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(got, want_df)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0,
                 max_size=8),
        min_size=1, max_size=6,
    ),
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0,
                 max_size=8),
        min_size=1, max_size=6,
    ),
)
def test_incremental_substring_matches_naive(words1, words2):
    """Two-ingest incremental substring dedup ≡ a naive reference:
    ingest-2 windows are removed if their gram occurred anywhere in
    ingest 1, else within-batch keeper semantics apply."""
    import tempfile

    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import substr

    k = 3
    t1 = [" ".join(ws) for ws in words1]
    t2 = [" ".join(ws) for ws in words2]
    ids1 = list(range(len(t1)))
    ids2 = [100 + i for i in range(len(t2))]

    # naive: ingest-1 gram set
    g1 = set()
    for t in t1:
        ws = t.split(" ")
        for p in range(len(ws) - k + 1):
            g1.add(tuple(ws[p : p + k]))
    # ingest-2 reference removal
    occ = {}
    hist_rm = {d: set() for d in ids2}
    for d, t in zip(ids2, t2):
        ws = t.split(" ")
        for p in range(len(ws) - k + 1):
            gram = tuple(ws[p : p + k])
            if gram in g1:
                hist_rm[d].update(range(p, p + k))
            else:
                occ.setdefault(gram, []).append((d, p))
    for gram, occs in occ.items():
        if len({d for d, _ in occs}) < 2:
            continue
        keeper = min(occs)
        for d, p in occs:
            if (d, p) != keeper:
                hist_rm[d].update(range(p, p + k))
    want = []
    for d, t in zip(ids2, t2):
        ws = t.split(" ")
        kept = [w for i, w in enumerate(ws) if i not in hist_rm[d]]
        want.append((d, len(ws), len(ws) - len(kept), " ".join(kept)))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "n_words", "n_removed", "clean_text"]
    )

    with tempfile.TemporaryDirectory() as idx:
        substr.incremental_substring_dedup(
            rd.from_pandas(pd.DataFrame({"doc_id": ids1, "text": t1})),
            idx, "r1", k=k, distributed=False,
        ).materialize()
        got = (
            substr.incremental_substring_dedup(
                rd.from_pandas(
                    pd.DataFrame({"doc_id": ids2, "text": t2})
                ),
                idx, "r2", k=k, distributed=False,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype(want_df.dtypes.to_dict())
        )
    import pandas as pd2
    pd2.testing.assert_frame_equal(got, want_df)
