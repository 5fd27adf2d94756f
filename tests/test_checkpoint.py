"""Resumable sharded execution: manifests, skip-on-resume, identical output
(FIXTURES.md resume_partial; reference Pebble restart persistence
lsmintervalprocessor/README.md:3-6, cursor.go:57-92)."""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from opentelemetry_collector_components_ray.state import checkpoint as cp
from opentelemetry_collector_components_ray.synth import (
    materialize_scaled_transcripts,
)


@pytest.fixture(scope="module")
def sharded_input(sf_dir):
    # 4 replica part-files so sharding is real
    return materialize_scaled_transcripts(sf_dir, repeat=4)


def _count_fn(calls):
    def shard_fn(ds, shard_dir):
        calls.append(shard_dir)
        n = ds.count()
        ds.write_parquet(os.path.join(shard_dir, "rows"))
        return {"rows_in": n}

    return shard_fn


def test_run_and_manifests(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "run1")
    calls = []
    manifests = cp.run_sharded(sharded_input, out, _count_fn(calls), num_shards=4)
    assert len(manifests) == 4
    nonempty = [m for m in manifests if m["input_files"]]
    assert len(calls) == len(nonempty) >= 2
    for m in nonempty:
        assert m["status"] == "complete"
        assert m["metrics"]["rows_in"] > 0
        assert os.path.isdir(m["output_dir"])
    # lineage covers every input file exactly once
    all_inputs = [f for m in manifests for f in m["input_files"]]
    assert sorted(all_inputs) == sorted(cp.list_fragments(sharded_input))


def test_resume_skips_completed(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "run2")
    calls = []
    cp.run_sharded(sharded_input, out, _count_fn(calls), num_shards=4)
    calls2 = []
    cp.run_sharded(sharded_input, out, _count_fn(calls2), num_shards=4)
    assert calls2 == []  # everything skipped


def test_resume_after_partial_failure_identical_output(
    ray_session, sharded_input, tmp_path
):
    out_clean = str(tmp_path / "clean")
    out_crash = str(tmp_path / "crash")
    cp.run_sharded(sharded_input, out_clean, _count_fn([]), num_shards=4)

    boom = RuntimeError("injected")
    state = {"n": 0}

    def failing_fn(ds, shard_dir):
        if state["n"] >= 2:
            raise boom
        state["n"] += 1
        ds.write_parquet(os.path.join(shard_dir, "rows"))
        return {}

    with pytest.raises(RuntimeError):
        cp.run_sharded(
            sharded_input, out_crash, failing_fn, num_shards=4,
            max_concurrent=1,  # deterministic failure point
        )
    done_nonempty = [
        d
        for d in cp.completed_shard_dirs(out_crash)
        if glob.glob(f"{d}/rows/*.parquet")
    ]
    assert len(done_nonempty) == 2

    cp.run_sharded(sharded_input, out_crash, _count_fn([]), num_shards=4)

    def read_all(base):
        files = sorted(glob.glob(f"{base}/shard=*/rows/*.parquet"))
        df = pd.concat(pq.read_table(f).to_pandas() for f in files)
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    a, b = read_all(out_clean), read_all(out_crash)
    assert a.equals(b)


def test_stale_manifest_on_input_change(tmp_path):
    out = str(tmp_path / "m")
    os.makedirs(out)
    cp._atomic_write_json(
        cp._manifest_path(out, 0),
        {"status": "complete", "input_files": ["old.parquet"]},
    )
    assert not cp.shard_complete(out, 0, ["new.parquet"])


def test_compact_parquet_dir(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    path = str(tmp_path / "frag")
    df = pd.DataFrame({"x": range(1000), "y": [f"v{i}" for i in range(1000)]})
    rd.from_pandas(df).repartition(10).write_parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 5
    after = cp.compact_parquet_dir(path, min_rows_per_file=100_000)
    assert after < before
    back = (
        rd.read_parquet(path)
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert back.equals(df)
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".compact")


def test_make_shards_contiguous_mode():
    files = [f"f{i}" for i in range(10)]
    shards = cp.make_shards(files, 4, stable=False)
    assert [f for s in shards for f in s] == files
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1
    assert len(cp.make_shards(files, 100, stable=False)) == 10


def test_make_shards_stable_under_append():
    """Appending input files must only change the shards the new files
    hash into — the incremental-ingest invariant."""
    files = [f"part-{i:04d}.parquet" for i in range(20)]
    before = cp.make_shards(files, 8)
    after = cp.make_shards(files + ["part-9999.parquet"], 8)
    changed = sum(
        1 for a, b in zip(before, after) if a != b
    )
    assert changed == 1  # exactly the shard the new file landed in
    assert sorted(f for s in after for f in s) == sorted(
        files + ["part-9999.parquet"]
    )


def test_incremental_append_recomputes_one_shard(ray_session, sharded_input, tmp_path):
    """End-to-end: append one input file, re-run, only one shard (plus
    none others) recomputes."""
    import shutil

    src = cp.list_fragments(sharded_input)
    inp = str(tmp_path / "inp")
    os.makedirs(inp)
    for f in src[:6]:
        shutil.copy(f, inp)
    out = str(tmp_path / "out")
    calls1 = []
    cp.run_sharded(inp, out, _count_fn(calls1), num_shards=4,
                   max_concurrent=1)
    shutil.copy(src[6], os.path.join(inp, "zz-appended.parquet"))
    calls2 = []
    cp.run_sharded(inp, out, _count_fn(calls2), num_shards=4,
                   max_concurrent=1)
    assert len(calls2) == 1  # only the shard holding the appended file


def test_compaction_heals_crash_mid_swap(ray_session, tmp_path):
    """Crash window: live dir renamed to .old, staging not yet swapped
    in.  The next compaction call must restore the data, not delete the
    only copy (round-1 advice finding)."""
    import pandas as pd
    import ray.data as rd

    path = str(tmp_path / "frag")
    df = pd.DataFrame({"x": range(200)})
    rd.from_pandas(df).repartition(4).write_parquet(path)
    # simulate: swap started (live -> .old), staging half-written
    os.replace(path, path + ".old")
    os.makedirs(path + ".compact")
    with open(path + ".compact/partial.parquet", "w") as f:
        f.write("garbage")

    assert not os.path.exists(path)
    n = cp.compact_parquet_dir(path, min_rows_per_file=100_000)
    assert n >= 1
    back = rd.read_parquet(path).to_pandas().sort_values("x")
    assert back.x.tolist() == list(range(200))
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".compact")


def test_compaction_cleans_leftovers_when_live_intact(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    path = str(tmp_path / "frag")
    rd.from_pandas(pd.DataFrame({"x": range(50)})).repartition(
        2
    ).write_parquet(path)
    os.makedirs(path + ".old")  # stale leftover from a crashed cleanup
    assert cp.heal_compaction(path) is False
    assert not os.path.exists(path + ".old")


def test_compaction_refuses_non_parquet_content(ray_session, tmp_path):
    import pandas as pd
    import pytest
    import ray.data as rd

    path = str(tmp_path / "frag")
    rd.from_pandas(pd.DataFrame({"x": range(50)})).repartition(
        4
    ).write_parquet(path)
    os.makedirs(os.path.join(path, "nested"))
    with pytest.raises(ValueError):
        cp.compact_parquet_dir(path)


def test_resume_heals_crashed_compaction_in_shard(ray_session, tmp_path):
    """A compaction that crashed mid-swap inside a completed shard's
    output is recovered on the next resumable run (advice finding)."""
    import pandas as pd
    import ray.data as rd

    inp = str(tmp_path / "in")
    rd.from_pandas(
        pd.DataFrame({"x": range(100)})
    ).repartition(4).write_parquet(inp)
    out = str(tmp_path / "out")

    def shard_fn(ds, shard_dir):
        ds.write_parquet(f"{shard_dir}/data")
        return {}

    cp.run_sharded(inp, out, shard_fn, num_shards=2, max_concurrent=1)
    # simulate crash-mid-swap in shard 0's data dir
    victim = None
    for d in sorted(glob.glob(f"{out}/shard=*/data")):
        victim = d
        break
    assert victim
    os.replace(victim, victim + ".old")
    assert not os.path.exists(victim)

    cp.run_sharded(inp, out, shard_fn, num_shards=2, max_concurrent=1)
    assert os.path.exists(victim)
    assert not os.path.exists(victim + ".old")
    back = rd.read_parquet(
        sorted(glob.glob(f"{out}/shard=*/data/*.parquet"))
    )
    assert back.count() == 100


def test_stage_metrics_in_shard_manifest(ray_session, tmp_path):
    """Shard manifests carry structured per-operator metrics (the
    metrics half of 'per-partition lineage + metrics')."""
    import json

    from opentelemetry_collector_components_ray.functions.metrics import (
        stage_metrics,
    )

    # parser unit: synthetic stats text
    txt = (
        "Operator 1 ReadParquet->MapBatches(f): 4 tasks executed, "
        "4 blocks produced in 1.25s\n"
        "* Output num rows per block: 10 min, 10 max, 10 mean, 40 total\n"
        "* Output size bytes per block: 1 min, 2 max, 1 mean, 6 total\n"
        "Operator 2 Sort: 2 tasks executed, 2 blocks produced in 0.5s\n"
        "* Output num rows per block: 20 min, 20 max, 20 mean, 40 total\n"
    )
    m = stage_metrics(txt)
    assert m["1 ReadParquet->MapBatches(f)"] == {
        "tasks": 4, "blocks": 4, "wall_s": 1.25,
        "rows_out": 40, "bytes_out": 6,
    }
    assert m["2 Sort"]["wall_s"] == 0.5

    # end-to-end: the flagship shard manifest records non-empty stages
    from opentelemetry_collector_components_ray.pipelines.flagship import (
        run_flagship_sharded,
    )
    from opentelemetry_collector_components_ray.synth import (
        materialize_transcripts,
    )

    inp = materialize_transcripts("/root/testdata/sf0.001")
    out = str(tmp_path / "run")
    run_flagship_sharded(inp, out, num_shards=2)
    import glob

    manifests = sorted(glob.glob(f"{out}/_manifest/*.json"))
    assert manifests
    # one input file → one populated shard; empty shards record {}
    populated = [
        m for m in (json.load(open(p)) for p in manifests)
        if m["metrics"]
    ]
    assert populated
    stages = populated[0]["metrics"]["stages"]
    assert stages, "structured per-stage metrics missing"
    first = next(iter(stages.values()))
    assert {"tasks", "blocks", "wall_s"} <= set(first)
