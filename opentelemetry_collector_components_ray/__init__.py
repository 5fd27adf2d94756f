"""Ray-Data-native re-implementation of the data-processing capabilities of
elastic/opentelemetry-collector-components.

A brand-new engine (NOT a port): every stage is a ``ray.data.Dataset``
transform over zero-copy Arrow batches; stateful stages are actor pools;
wide steps use groupby/aggregate with explicit partitioning/salting.

Layout
------
- ``schema``     canonical Arrow schemas (transcripts + derived stages)
- ``synth``      deterministic transcript synthesis (shared SQL with the oracle)
- ``sources``    parquet / ndjson readers
- ``stages``     parse, enrich, route, aggregate, dedup, text, ann stages
- ``functions``  scalar kernels, hashing, sketches (HLL, MinHash, SimHash)
- ``pipelines``  composed pipelines + config validation
- ``state``      per-partition checkpoint manifests for resumable runs

Reference parity citations use ``file:line`` into /root/reference
(elastic/opentelemetry-collector-components v0.67.0).
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """glibc tuning (OPT-IN via OCCR_MALLOC_TUNING=1): serve large
    buffers from the reusable heap instead of fresh mmap/munmap pairs.

    numpy temporaries in hot kernels can be allocation-bound on
    virtualized hosts where a fresh mmap page fault costs tens of µs
    (measured on one sandbox: a 400 MB fresh-alloc multiply ran
    0.08 GB/s cold vs 5.7 GB/s from reused heap pages — a ~70× gap).
    Disabling malloc's mmap path keeps freed big buffers on the heap so
    pages stay warm across batches.

    Default OFF: on other hosts the same setting is actively harmful —
    M_MMAP_MAX=0 grows every long-lived Ray worker's sbrk heap without
    release, and the resulting fragmentation + transparent-huge-page
    compaction storms (kcompactd/khugepaged) measured 2-6× slowdowns on
    the tail of a multi-phase bench (latest_state 17 s → 5.5 s,
    sharded 59 s → 9.2 s with tuning off).  Workload- and
    host-dependent; ``functions/allocprobe.py`` measures the actual
    pathology (CONCURRENT fresh-alloc fill rate, which is what a
    single-process benchmark misses) and exports the per-host decision
    — bench.py and CLI entry points call it before ``ray.init`` so
    every worker inherits it.  Set ``OCCR_MALLOC_TUNING=0|1`` to
    override the probe.
    """
    import os

    if os.environ.get("OCCR_MALLOC_TUNING") != "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-4, 0)  # M_MMAP_MAX = 0: malloc never uses mmap
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: keep ≤1 GiB free top
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_allocator()
