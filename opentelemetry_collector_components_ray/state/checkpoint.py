"""Per-partition checkpoint manifests for resumable runs.

The reference survives restarts via Pebble's WAL + directory
(processor/lsmintervalprocessor — README.md:3-6) and a persistent poll
cursor (receiver/akamaisiemreceiver/internal/cursor/cursor.go:34-92).
The batch-engine equivalent (north rule: "resumable from checkpoint
with per-partition lineage + metrics"):

- input files are grouped into shards; each shard runs as its own
  bounded Ray Data pipeline writing under ``out/shard=K/``;
- a manifest JSON per shard records lineage (input files), row counts
  in/out per stage, wall time, and a completion marker — written
  atomically (temp + rename) AFTER the shard's output is durable;
- a re-run skips shards whose manifest is complete, so a killed run
  resumes where it left off and produces identical output;
- cross-shard aggregates are finalized from per-shard partials
  (commutative merges — safe because delta adds commute,
  internal/data/add.go:58-68).

At 100 TB a shard is a group of parquet files (≥ a few GB each);
shards can run with high internal parallelism while the driver loop
provides the checkpoint boundary.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional, Sequence

import ray.data as rd


def list_fragments(input_path: str) -> List[str]:
    if os.path.isfile(input_path):
        return [input_path]
    frags = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not frags:
        raise FileNotFoundError(f"no parquet fragments under {input_path}")
    return frags


def make_shards(
    files: Sequence[str], num_shards: int, stable: bool = True
) -> List[List[str]]:
    """Group input files into shards.

    ``stable=True`` (default) assigns by hash of the file's basename:
    appending new input files later only adds to (and therefore only
    invalidates) the shards the new files hash into — the rest of a
    previous run's checkpoints stay valid, which is what makes
    incremental ingest cheap.  ``stable=False`` packs contiguously
    (marginally better balance, but ANY append reshuffles every shard
    and forces a full recompute).
    """
    if not stable:
        n = min(num_shards, len(files))
        out: List[List[str]] = [[] for _ in range(n)]
        for i, f in enumerate(files):
            out[i * n // len(files)].append(f)
        return out
    import numpy as np

    from ..functions.sketches import hash64

    names = np.asarray([os.path.basename(f) for f in files], dtype=object)
    assign = (hash64(names) % np.uint64(num_shards)).astype(int)
    out = [[] for _ in range(num_shards)]
    for f, s in zip(files, assign):
        out[s].append(f)
    # drop empty shards but keep ids stable via (id -> files) mapping:
    # empty shards simply produce no manifest
    return out


def _manifest_dir(out_dir: str) -> str:
    d = os.path.join(out_dir, "_manifest")
    os.makedirs(d, exist_ok=True)
    return d


def _manifest_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"shard-{shard_id:05d}.json")


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_manifest(out_dir: str, shard_id: int) -> Optional[dict]:
    p = _manifest_path(out_dir, shard_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def shard_complete(out_dir: str, shard_id: int, input_files: Sequence[str]) -> bool:
    m = load_manifest(out_dir, shard_id)
    return (
        m is not None
        and m.get("status") == "complete"
        and m.get("input_files") == list(input_files)
    )


def _stabilize_lazy_imports() -> None:
    """Make read_parquet safe to call from several threads.

    Ray's path resolution does ``from fsspec.implementations.http
    import HTTPFileSystem`` per read; in this environment that module
    fails to import (no aiohttp), so every call re-imports it and
    CONCURRENT re-imports race into a half-initialized module — which
    surfaces as ImportError (not the ModuleNotFoundError Ray catches).
    Register a benign stub once so the import permanently succeeds;
    the isinstance check against the stub class is simply False.
    """
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ModuleNotFoundError:
        pass
    import sys
    import types

    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # only ever used in isinstance checks
        pass

    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = stub
    try:
        import fsspec.implementations as _fi

        _fi.http = stub
    except Exception:
        pass


# shard_fn(shard_dataset, shard_out_dir) -> per-stage metrics dict
ShardFn = Callable[[rd.Dataset, str], Dict]


def run_sharded(
    input_path: str,
    out_dir: str,
    shard_fn: ShardFn,
    num_shards: int = 16,
    resume: bool = True,
    max_concurrent: int = 4,
) -> List[dict]:
    """Run ``shard_fn`` once per shard with checkpointing.

    Shard output is staged in ``shard=K.tmp`` and atomically renamed to
    ``shard=K`` before the manifest is written, so a crash at any point
    leaves either no trace or a complete, skippable shard.

    ``max_concurrent`` shards run at once (driver threads; each shard's
    Ray pipeline executes on the shared cluster) — overlapping shards
    amortizes per-pipeline fixed overhead and keeps the cluster busy
    through a shard's serial tail, while the checkpoint boundary stays
    per-shard.  Set 1 for strictly sequential runs.
    """
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    shards = make_shards(list_fragments(input_path), num_shards)

    def run_one(sid: int, files: Sequence[str]) -> dict:
        final_dir = os.path.join(out_dir, f"shard={sid:05d}")
        if resume and shard_complete(out_dir, sid, files):
            # a compaction of this shard's outputs may have crashed
            # mid-swap since the manifest was written — recover any
            # '.old'/'.compact' leftovers before trusting the skip
            for leftover in glob.glob(
                os.path.join(final_dir, "**", "*.old"), recursive=True
            ):
                heal_compaction(leftover[: -len(".old")])
            return load_manifest(out_dir, sid)
        if not files:  # stable hashing can leave a shard empty
            manifest = {
                "shard_id": sid,
                "status": "complete",
                "input_files": [],
                "output_dir": final_dir,
                "wall_seconds": 0.0,
                "metrics": {},
            }
            os.makedirs(final_dir, exist_ok=True)
            _atomic_write_json(_manifest_path(out_dir, sid), manifest)
            return manifest
        stage_dir = final_dir + ".tmp"
        for d in (final_dir, stage_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        os.makedirs(stage_dir)
        t0 = time.monotonic()
        from ..sources.parquet import read_parquet_clean

        ds = read_parquet_clean(files)
        metrics = shard_fn(ds, stage_dir) or {}
        os.replace(stage_dir, final_dir)
        manifest = {
            "shard_id": sid,
            "status": "complete",
            "input_files": list(files),
            "output_dir": final_dir,
            "wall_seconds": round(time.monotonic() - t0, 3),
            "metrics": metrics,
        }
        _atomic_write_json(_manifest_path(out_dir, sid), manifest)
        return manifest

    if max_concurrent <= 1:
        return [run_one(sid, files) for sid, files in enumerate(shards)]
    _stabilize_lazy_imports()
    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        futures = [
            pool.submit(run_one, sid, files)
            for sid, files in enumerate(shards)
        ]
        return [f.result() for f in futures]


def heal_compaction(path: str) -> bool:
    """Recover from a crash mid-:func:`compact_parquet_dir`.

    The two-rename swap has a window where the live directory does not
    exist (old → ``.old`` done, staging → live not yet).  A crash there
    previously stranded the data in ``.old`` with no self-heal — and
    the next compaction call's unconditional cleanup would have DELETED
    the only surviving copy (round-1 advice finding).  Rules:

    - live dir exists → any ``.compact``/``.old`` leftovers are garbage
      (incomplete staging, or a completed swap whose final cleanup
      died) → remove them;
    - live dir missing and ``.old`` exists → crash mid-swap: restore
      ``.old`` as live (the original, always-complete copy) and drop
      the staging dir (it will be rebuilt);
    - both missing → nothing this function created; leave as-is.

    Returns True if a restore happened.
    """
    staging, old = path + ".compact", path + ".old"
    if os.path.exists(path):
        for d in (staging, old):
            if os.path.exists(d):
                shutil.rmtree(d)
        return False
    if os.path.exists(old):
        if os.path.exists(staging):
            shutil.rmtree(staging)
        os.replace(old, path)
        return True
    return False


def compact_parquet_dir(
    path: str, min_rows_per_file: int = 500_000
) -> int:
    """Rewrite a parquet directory into fewer, larger files.

    Sharded fan-out writes produce one file per (shard task, sink) —
    correct but fragmenting over many runs; periodic compaction keeps
    later reads metadata-light.  Crash-safe: heals leftovers from a
    previously interrupted compaction first (:func:`heal_compaction`),
    compacts into a staging dir, then swaps (rename live → .old,
    staging → live, delete .old).  CONCURRENT READERS can observe a
    brief FileNotFound between the two renames — compact only when no
    reader is active, or retry reads; a crash in that window is
    recovered by the next call's heal.  Only top-level ``*.parquet``
    files are compacted; the directory must not hold other content (the
    swap moves the whole directory).  Returns the resulting file count.
    """
    heal_compaction(path)
    frags = sorted(glob.glob(os.path.join(path, "*.parquet")))
    non_parquet = [
        p
        for p in glob.glob(os.path.join(path, "*"))
        if not p.endswith(".parquet")
    ]
    if non_parquet:
        raise ValueError(
            f"compact_parquet_dir: {path} holds non-parquet content "
            f"({non_parquet[:3]}…); refusing the whole-dir swap"
        )
    if len(frags) <= 1:
        return len(frags)
    staging = path + ".compact"
    old = path + ".old"
    rd.read_parquet(frags).write_parquet(
        staging, min_rows_per_file=min_rows_per_file
    )
    os.replace(path, old)
    os.replace(staging, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def completed_shard_dirs(out_dir: str) -> List[str]:
    dirs = []
    for p in sorted(glob.glob(os.path.join(_manifest_dir(out_dir), "shard-*.json"))):
        with open(p) as f:
            m = json.load(f)
        if m.get("status") == "complete":
            dirs.append(m["output_dir"])
    return dirs
