"""profilingmetricsconnector port: frame classification semantics.

Three independent layers pin each other:
1. hand-computed expectations per scenario pin the NAIVE walker
   (classify_sample_ref — the transcription of frame.go the SQL twin
   is generated from);
2. the vectorized engine (classify_batch) is checked ≡ the naive
   walker over the full template grid and random stacks;
3. frame_metrics over a Ray dataset matches the DuckDB-evaluated SQL
   twin on sf0.001.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.stages import profiling as P


def agg_ref(contribs):
    """(metric, attrs, val) list → {(metric, attr-tuple): total}."""
    out = {}
    for metric, attrs, val in contribs:
        key = (metric,) + tuple(attrs.get(c, "") for c in P.ATTR_COLS)
        out[key] = out.get(key, 0) + val
    return out


def ref_sample(frames, mult, stack_idx=1):
    return agg_ref(
        P.classify_sample_ref(frames, mult, stack_idx=stack_idx)
    )


def K(metric, **attrs):
    return (metric,) + tuple(attrs.get(c, "") for c in P.ATTR_COLS)


# ---------------------------------------------------------------------------
# 1. Hand-pinned scenario expectations (frame metrics subset).
# ---------------------------------------------------------------------------

def frame_metric_subset(d):
    return {
        k: v for k, v in d.items()
        if k[0].startswith("samples.") and k[0].endswith(".count")
        or k[0] == "samples.user.count"
    }


def test_runtime_leaf_ignores_deeper_kernel():
    # scenario 0: leaf go, deeper kernel frame must NOT produce a
    # kernel metric (walk breaks at the non-kernel leaf, frame.go:352)
    frames, _ = P.template_frames(0, 2)  # rt = go
    got = frame_metric_subset(ref_sample(frames, 2))
    assert got == {
        K("samples.user.count"): 2,
        K("samples.go.count"): 2,
    }


def test_native_shlib_extraction():
    frames, _ = P.template_frames(1, 0)  # libssl.so.3
    got = frame_metric_subset(ref_sample(frames, 1))
    assert got == {
        K("samples.user.count"): 1,
        K("samples.native.count", shlib_name="libssl"): 1,
    }
    frames, _ = P.template_frames(1, 4)  # libstdc++.so.6
    got = frame_metric_subset(ref_sample(frames, 1))
    assert K("samples.native.count", shlib_name="libstdc++") in got


def test_native_no_shlib():
    frames, _ = P.template_frames(2, 0)  # python3.11
    got = frame_metric_subset(ref_sample(frames, 3))
    assert got == {
        K("samples.user.count"): 3,
        K("samples.native.count"): 3,
    }


def test_kernel_syscall_cut_blocks_higher_priority_class():
    # scenario 3: frame after the syscall has the top-priority class
    # (tcp_recvmsg) and must not influence classification
    frames, _ = P.template_frames(3, 0)  # udp_rcv + __x64_sys_read
    got = frame_metric_subset(ref_sample(frames, 1))
    assert got == {
        K("samples.kernel.count", syscall_name="read",
          kernel_area="network", kernel_proto="udp",
          kernel_io="read"): 1,
    }
    assert K("samples.user.count") not in got  # kernel leaf: no user count


def test_kernel_priority_improves_across_frames():
    frames, _ = P.template_frames(4, 0)
    got = frame_metric_subset(ref_sample(frames, 2))
    assert got == {
        K("samples.kernel.count", kernel_area="network",
          kernel_proto="tcp", kernel_io="write"): 2,
    }


def test_write_syscall_overrides_tcp_read():
    frames, _ = P.template_frames(5, 0)
    got = frame_metric_subset(ref_sample(frames, 1))
    assert got == {
        K("samples.kernel.count", syscall_name="write",
          kernel_area="network", kernel_proto="tcp",
          kernel_io="write"): 1,
    }


def test_kernel_syscall_without_class():
    frames, _ = P.template_frames(6, 3)  # getpid
    got = frame_metric_subset(ref_sample(frames, 1))
    assert got == {
        K("samples.kernel.count", syscall_name="getpid"): 1,
    }


def test_invalid_frame_mid_walk_keeps_class():
    frames, _ = P.template_frames(7, 0)  # pipe_read then 'mystery'
    got = frame_metric_subset(ref_sample(frames, 1, stack_idx=0))
    assert got == {
        K("samples.kernel.count", kernel_area="ipc",
          kernel_io="read"): 1,
    }
    frames, _ = P.template_frames(7, 1)  # do_mmap → memory (area only)
    got = frame_metric_subset(ref_sample(frames, 1, stack_idx=0))
    assert got == {
        K("samples.kernel.count", kernel_area="memory"): 1,
    }


def test_invalid_leaf_counts_nothing():
    frames, sidx = P.template_frames(8, 0)
    # frame metrics: nothing; frame-type walker still sees 'badtype'
    got = ref_sample(frames, 5, stack_idx=sidx)
    assert got == {
        K("samples.frame_type", frame_type="badtype",
          origin="samples_count"): 1,
    }
    frames, sidx = P.template_frames(8, 1)  # empty stack, idx 0
    assert ref_sample(frames, 5, stack_idx=sidx) == {}


def test_classification_extracts_go_and_jvm():
    frames, _ = P.template_frames(9, 0)
    got = ref_sample(frames, 1)
    assert got[K("samples.classification", frame_type="go",
                 classification="main", origin="samples_count")] == 1
    assert got[K("samples.classification", frame_type="jvm",
                 classification="com.example.app.Main",
                 origin="samples_count")] == 1
    # leaf go counts as user+go with multiplier
    assert got[K("samples.user.count")] == 1
    assert got[K("samples.go.count")] == 1


def test_custom_aggregations_count_all_frames():
    # scenario 5 has tcp_v4_rcv → custom 'tcp' label fires once
    frames, _ = P.template_frames(5, 0)
    got = ref_sample(frames, 1)
    assert got[K("samples.custom_aggregation", classification="tcp",
                 origin="samples_count")] == 1


# ---------------------------------------------------------------------------
# 2. Extractor equivalence: vectorized vs scalar transcription.
# ---------------------------------------------------------------------------

ADVERSARIAL = [
    "", "a", "a.b", "a.b.c", "a/b", "a.b/c", "a.b/c.d", "/x.y",
    "base/.hidden", "..x", "a b.c(d)", " x.y.z ", "f(", ")(",
    "no/slash/only", "trailing/", "trailing/.", "a/b/c.d.e",
]


def test_golang_extractor_vec_equiv():
    pool = P.GOFN_POOL + ADVERSARIAL
    vec = P._golang_packs_vec(pd.Series(pool, dtype=object))
    for s, v in zip(pool, vec):
        assert v == P.extract_golang_pack(s), s


def test_hotspot_extractor_vec_equiv():
    pool = P.JVMFN_POOL + ADVERSARIAL
    vec = P._hotspot_keys_vec(pd.Series(pool, dtype=object))
    for s, v in zip(pool, vec):
        assert v == P.extract_hotspot_key(s), s


def test_golang_pins():
    assert P.extract_golang_pack(
        "github.com/gin-gonic/gin.(*Engine).ServeHTTP"
    ) == "github.com/gin-gonic/gin"
    assert P.extract_golang_pack("net/http.(*conn).serve") == "net/http"
    assert P.extract_golang_pack("main.main") == "main"
    assert P.extract_golang_pack("noslashnodot") == "noslashnodot"
    assert P.extract_golang_pack("a/b") == "a/b"  # no dot in segment


def test_hotspot_pins():
    assert P.extract_hotspot_key(
        "void com.example.app.Main.run(java.lang.String[])"
    ) == "com.example.app.Main"
    assert P.extract_hotspot_key("run") == ".run"
    assert P.extract_hotspot_key(
        "static void App.main(String[])"
    ) == ".App"


# ---------------------------------------------------------------------------
# 3. Vectorized engine ≡ naive walker (full grid + randomized stacks).
# ---------------------------------------------------------------------------

def _table_from_samples(samples):
    """samples: list of (ts_us, stack_idx, n_ts, frames)."""
    return pa.table({
        "sample_id": pa.array(range(len(samples)), pa.int64()),
        "ts": pa.array(
            [s[0] for s in samples], pa.timestamp("us")
        ),
        "stack_idx": pa.array([s[1] for s in samples], pa.int32()),
        "n_timestamps": pa.array([s[2] for s in samples], pa.int32()),
        "frame_types": pa.array(
            [[f[0] for f in s[3]] for s in samples],
            pa.list_(pa.string()),
        ),
        "func_names": pa.array(
            [[f[1] for f in s[3]] for s in samples],
            pa.list_(pa.string()),
        ),
        "file_names": pa.array(
            [[f[2] for f in s[3]] for s in samples],
            pa.list_(pa.string()),
        ),
    })


def _engine_counts(t, window_us=3_600_000_000):
    out = P.classify_batch(t, window_us)
    df = out.to_pandas()
    d = {}
    for _, r in df.iterrows():
        key = (int(r["window"].value // 1000), r["metric"]) + tuple(
            r[c] for c in P.ATTR_COLS
        )
        d[key] = d.get(key, 0) + int(r["value"])
    return d


def _ref_counts(samples, window_us=3_600_000_000):
    d = {}
    for ts_us, sidx, n_ts, frames in samples:
        w = (ts_us // window_us) * window_us
        for metric, attrs, val in P.classify_sample_ref(
            frames, max(n_ts, 1), stack_idx=sidx
        ):
            key = (w, metric) + tuple(
                attrs.get(c, "") for c in P.ATTR_COLS
            )
            d[key] = d.get(key, 0) + val
    return d


def test_vectorized_matches_reference_on_grid():
    samples = []
    base = 1_700_000_000_000_000
    i = 0
    for s in range(P.N_SCENARIOS):
        for k in range(P.N_VARIANTS):
            frames, sidx = P.template_frames(s, k)
            samples.append(
                (base + (i % 5) * 3_600_000_000, sidx, i % 3, frames)
            )
            i += 1
    t = _table_from_samples(samples)
    assert _engine_counts(t) == _ref_counts(samples)


def test_vectorized_matches_reference_on_random_stacks():
    rng = np.random.default_rng(7)
    types = list(P.ALLOWED_FRAME_TYPES) + ["mystery", "badtype", ""]
    funcs = (
        P.KFUNC_POOL + P.SYSFN_POOL + P.GOFN_POOL + P.JVMFN_POOL
        + ["", "main", "tcp_v4_rcv", "ksys_write", "pipe_read",
           "do_mmap", "schedule_x", "__arm64_sys_futex"]
    )
    files = P.SHLIB_POOL + P.NOSO_POOL + ["java.sock"]
    samples = []
    base = 1_700_000_000_000_000
    for i in range(400):
        L = int(rng.integers(0, 6))
        frames = [
            (
                types[int(rng.integers(len(types)))],
                funcs[int(rng.integers(len(funcs)))],
                files[int(rng.integers(len(files)))],
            )
            for _ in range(L)
        ]
        samples.append((
            base + int(rng.integers(0, 4)) * 3_600_000_000,
            int(rng.integers(0, 3)),
            int(rng.integers(0, 4)),
            frames,
        ))
    t = _table_from_samples(samples)
    assert _engine_counts(t) == _ref_counts(samples)


def test_shlib_regex_is_a_search_not_fullmatch():
    # Go FindStringSubmatchIndex semantics: 'java.sock' DOES match
    # (.+)\.so with lib='java'
    got = frame_metric_subset(
        ref_sample([("native", "f", "java.sock")], 1, stack_idx=0)
    )
    assert K("samples.native.count", shlib_name="java") in got


# ---------------------------------------------------------------------------
# 4. End-to-end: Ray dataset vs the DuckDB-evaluated SQL twin.
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_frame_metrics_matches_sql_twin(tmp_path):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    ds = P.read_profiles(sf_dir)
    got = (
        P.frame_metrics(ds, window="1h").to_pandas()
        .sort_values(["window", "metric"] + P.ATTR_COLS)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    exp = (
        con.execute(P.profiling_metrics_sql(window="1h")).df()
        .sort_values(["window", "metric"] + P.ATTR_COLS)
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp,
        check_dtype=False,
    )
