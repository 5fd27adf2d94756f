"""Concurrent fresh-allocation probe: decide per-host whether the glibc
``M_MMAP_MAX=0`` tuning (see ``_tune_allocator`` in the package
``__init__``) should be enabled.

Why a probe instead of a default
--------------------------------
The tuning's effect is violently host-dependent, in BOTH directions
(BASELINE.md, round 3):

- On hosts where concurrent fresh-mmap page faults are pathologically
  slow (zone-lock contention / THP fault storms across many worker
  processes), the tuning bought 3.3x on the allocation-heavy dedup
  tail (doc_cluster_dedup_5m 139 s -> 42 s, measured round 3).
- On hosts where fresh faults are cheap, the same tuning is actively
  harmful: every long-lived worker's sbrk heap grows without release
  and THP compaction storms slow a multi-phase session's tail 2-6x.

A single-process first-touch benchmark does NOT discriminate (the bad
host measured a healthy 5.6 GB/s single-process while concurrent
per-process throughput was 0.26 GB/s), so the probe reproduces the
actual shape of the workload: N processes concurrently filling fresh
64 MB buffers, untuned vs tuned.  Measured on the round-3 host:
untuned 0.26 GB/s/proc vs tuned 4.57 GB/s/proc (17x) -- far from any
plausible threshold.  On a healthy host the two runs are within noise
and the tuning stays off, which also avoids the sbrk-growth harm (that
pathology only manifests when the tuning is ON, so "off unless faults
are measurably slow" is safe on every host class seen so far).

The probe costs ~0.5 s on a healthy host, ~2 s on a pathological one.
Callers that own a process tree (bench.py, CLI entry points) run it
ONCE before ``ray.init`` and export ``OCCR_MALLOC_TUNING`` so every
Ray worker inherits the decision at package import; it must never run
inside a Ray worker (it forks processes).
"""

from __future__ import annotations

import os
from typing import Optional

_MB = 1 << 20


def _fill_worker(tune: bool, q) -> None:  # pragma: no cover - subprocess
    import time

    import numpy as np

    if tune:
        try:
            import ctypes

            libc = ctypes.CDLL("libc.so.6")
            libc.mallopt(-4, 0)  # M_MMAP_MAX=0
            libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        except Exception:
            pass
    n = 64 * _MB
    t0 = time.perf_counter()
    for _ in range(6):
        a = np.empty(n, dtype=np.uint8)
        a.fill(1)
        del a
    q.put(6 * n / (time.perf_counter() - t0) / 1e9)


def _concurrent_fill_rate(tune: bool, nproc: int) -> float:
    """Mean per-process GB/s of ``nproc`` concurrent fresh-alloc fills."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_fill_worker, args=(tune, q)) for _ in range(nproc)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / len(rates)


def _quick_fill_worker(q) -> None:  # pragma: no cover - subprocess
    """Like ``_fill_worker`` but inheriting the parent's allocator
    state (no explicit mallopt): measures the EFFECTIVE rate the
    workload currently sees, with a smaller buffer for speed."""
    import time

    import numpy as np

    n = 32 * _MB
    t0 = time.perf_counter()
    for _ in range(4):
        a = np.empty(n, dtype=np.uint8)
        a.fill(1)
        del a
    q.put(4 * n / (time.perf_counter() - t0) / 1e9)


def effective_fill_rate(nproc: Optional[int] = None) -> float:
    """Quick (~0.3 s healthy) concurrent fresh-alloc probe of the
    CURRENT effective memory throughput — children inherit the
    parent's allocator tuning, so after ``resolve_malloc_tuning`` this
    reads the rate Ray workers actually experience.  Used by bench.py
    to stamp a per-query-group health reading into the artifact and to
    detect a mid-run host collapse (the round-3 artifact problem: one
    probe at start-of-run cannot see a later degradation).

    Fork-based like the main probe: call only from a driver process
    (never inside a Ray worker)."""
    import multiprocessing as mp

    if nproc is None:
        nproc = min(8, os.cpu_count() or 4)
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_quick_fill_worker, args=(q,))
        for _ in range(nproc)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / len(rates)


def probe_malloc_tuning(
    nproc: Optional[int] = None,
    slow_gbps: float = 1.0,
    min_gain: float = 2.0,
) -> dict:
    """Measure concurrent fresh-alloc throughput untuned vs tuned and
    return ``{"enable": bool, "untuned_gbps": x, "tuned_gbps": y}``.

    Enable only when the untuned path is measurably pathological
    (< ``slow_gbps`` per process) AND the tuning actually cures it
    (>= ``min_gain`` improvement) -- both guards must fire, so a noisy
    healthy host can't trip the switch.
    """
    if nproc is None:
        nproc = min(16, os.cpu_count() or 4)
    untuned = _concurrent_fill_rate(False, nproc)
    tuned = _concurrent_fill_rate(True, nproc)
    return {
        "enable": untuned < slow_gbps and tuned >= min_gain * untuned,
        "untuned_gbps": round(untuned, 3),
        "tuned_gbps": round(tuned, 3),
        "nproc": nproc,
    }


def resolve_malloc_tuning() -> dict:
    """Honor an explicit ``OCCR_MALLOC_TUNING`` setting, else probe and
    EXPORT the decision so child processes (raylet -> Ray workers)
    inherit it.  Returns the decision dict (``source``: env|probe).

    Call ONLY from a process that has not yet started Ray.
    """
    explicit = os.environ.get("OCCR_MALLOC_TUNING")
    if explicit is not None and explicit != "auto":
        return {"enable": explicit == "1", "source": "env"}
    try:
        result = probe_malloc_tuning()
    except Exception as exc:  # pragma: no cover - exotic platforms
        return {"enable": False, "source": f"probe-failed: {exc}"}
    os.environ["OCCR_MALLOC_TUNING"] = "1" if result["enable"] else "0"
    if result["enable"]:
        # the package imported before the decision existed; re-apply so
        # the CURRENT process is tuned too, not just future children
        from opentelemetry_collector_components_ray import _tune_allocator

        _tune_allocator()
    result["source"] = "probe"
    return result
