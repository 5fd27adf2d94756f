"""Flagship pipeline: parse → enrich → route → aggregate.

The Ray-Data re-expression of the reference's APM intake path
(SURVEY.md §3.1): intake NDJSON decode (parse stage) →
elasticapmprocessor enrichment (enrich stage) → routing-connector
fan-out (route stage) → signaltometrics + lsminterval interval
aggregation (aggregate stage).  Everything is one lazy streaming
Dataset pipeline; nothing materializes on the driver.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import ray.data as rd

from ..sources import read_transcripts
from ..stages.aggregate import service_summary
from ..stages.enrich import enrich_stage
from ..stages.parse import parse_stage
from ..stages.route import RouterConfig, route_stage, write_fanout  # noqa: F401


def enriched_transcripts(
    sf_dir_or_path: str, batch_size: int = 65536
) -> rd.Dataset:
    ds = read_transcripts(sf_dir_or_path)
    ds = parse_stage(ds, batch_size=batch_size)
    return enrich_stage(ds, batch_size=batch_size)


def routed_transcripts(
    sf_dir_or_path: str,
    config: RouterConfig = RouterConfig(),
    batch_size: int = 65536,
) -> rd.Dataset:
    return route_stage(
        enriched_transcripts(sf_dir_or_path, batch_size), config, batch_size
    )


def flagship_aggregate(
    sf_dir_or_path: str,
    intervals: Sequence[str] = ("1h", "24h"),
    batch_size: int = 65536,
) -> rd.Dataset:
    """End-to-end: returns the multi-interval service_summary Dataset."""
    return service_summary(
        enriched_transcripts(sf_dir_or_path, batch_size), intervals
    )


def _flagship_shard_fn(
    intervals: Sequence[str], batch_size: int, config: RouterConfig
):
    from ..stages.parse import parse_stage as _parse
    from ..stages.enrich import enrich_stage as _enrich
    from ..stages.route import route_stage as _route

    def shard_fn(ds: rd.Dataset, shard_dir: str) -> Dict:
        routed = _route(
            _enrich(_parse(ds, batch_size), batch_size), config, batch_size
        )
        # ONE pass over the raw shard: materialize the routed blocks in
        # the object store, then BOTH consumers (fan-out write +
        # aggregation) read the materialized blocks — no parse/enrich
        # recompute and, unlike the round-1 read-the-parquet-back
        # design, no disk round-trip either.  A materialized shard is
        # input_size / num_shards — pick num_shards so it fits the
        # store (it spills gracefully past that).
        routed_m = routed.materialize()
        write_fanout(routed_m, f"{shard_dir}/sinks", config)
        # sink counts come from parquet footers — no Ray execution
        import glob as _g

        import pyarrow.parquet as _pq

        counts: Dict[str, int] = {}
        for sink in config.sinks:
            files = _g.glob(f"{shard_dir}/sinks/sink={sink}/*.parquet")
            if files:
                counts[sink] = sum(
                    _pq.ParquetFile(f).metadata.num_rows for f in files
                )
        import pandas as _pd

        sink_counts = _pd.DataFrame(
            {"sink": list(counts), "n": list(counts.values())}
        )
        agg = service_summary(routed_m, intervals)
        agg.write_parquet(f"{shard_dir}/agg_partial")
        # per-stage execution stats (wall/cpu/rows per operator) go into
        # the shard manifest alongside lineage — the metrics half of the
        # "per-partition lineage + metrics" requirement
        stats_txt = ""
        stages: Dict = {}
        try:
            stats_txt = agg.stats()
            from ..functions.metrics import stage_metrics

            stages = stage_metrics(stats_txt)
        except Exception:
            pass
        metrics: Dict = {
            "sinks": dict(
                zip(sink_counts["sink"], sink_counts["n"].astype(int))
            ),
            "rows_in": int(sink_counts["n"].sum()),
            # structured per-operator wall/tasks/rows (functions/metrics)
            # plus the raw tail for eyeballing
            "stages": stages,
            "agg_stage_stats": stats_txt[-2000:],
        }
        return metrics

    return shard_fn


def run_flagship_sharded(
    input_path: str,
    out_dir: str,
    intervals: Sequence[str] = ("1h", "24h"),
    num_shards: int = 16,
    batch_size: int = 65536,
    resume: bool = True,
    config: RouterConfig = RouterConfig(),
    max_concurrent: int = 4,
) -> str:
    """Checkpointed flagship run: shard → (route-fanout + partial agg)
    with per-shard manifests, then a final merge of the commutative
    partials (state/checkpoint.py).  Returns the final aggregate path."""
    from ..stages.aggregate import (
        SERVICE_SUMMARY_KEYS,
        SERVICE_SUMMARY_MERGE,
        merge_partials,
    )
    from ..state.checkpoint import completed_shard_dirs, run_sharded

    run_sharded(
        input_path,
        out_dir,
        _flagship_shard_fn(intervals, batch_size, config),
        num_shards=num_shards,
        resume=resume,
        max_concurrent=max_concurrent,
    )
    import glob as _glob

    partial_paths = [
        f
        for d in completed_shard_dirs(out_dir)
        for f in sorted(_glob.glob(f"{d}/agg_partial/*.parquet"))
    ]
    from ..sources.parquet import read_parquet_clean

    partials = read_parquet_clean(partial_paths)
    final = merge_partials(
        partials, SERVICE_SUMMARY_KEYS, SERVICE_SUMMARY_MERGE
    )
    final_path = f"{out_dir}/service_summary"
    import shutil

    if os.path.exists(final_path):
        shutil.rmtree(final_path)
    final.write_parquet(final_path)
    return final_path


def _estimate_input_bytes(path: str) -> int:
    """Sum of parquet file sizes under ``path`` (file or dir)."""
    import glob as _g

    if os.path.isfile(path):
        return os.path.getsize(path)
    return sum(
        os.path.getsize(p)
        for p in _g.glob(os.path.join(path, "**", "*.parquet"),
                         recursive=True)
    )


def _should_materialize(input_path: str) -> bool:
    """Materialize the routed set only when its decoded size clearly
    fits the object store.  Decoded Arrow runs ~2-3× the parquet
    bytes; past ~50% of the store the materialized blocks thrash the
    spill path and the disk-backed mode wins outright (measured: 48M
    turns materialized 12.6 s vs 15.7 disk-backed; 96M turns 88 s
    materialized [spilling] vs 29.7 disk-backed)."""
    import ray

    try:
        store = ray.cluster_resources().get("object_store_memory", 0)
    except Exception:
        return False
    est_decoded = _estimate_input_bytes(input_path) * 3
    return bool(store) and est_decoded < 0.5 * store


def run_flagship(
    sf_dir_or_path: str,
    out_dir: str,
    intervals: Sequence[str] = ("1h", "24h"),
    batch_size: int = 65536,
    materialize_routed: bool | None = None,
) -> Dict[str, str]:
    """Full run with physical sinks: per-sink routed parquet + aggregate.

    One pass over the raw input, two modes:

    - ``materialize_routed=True`` (single-node latency mode): the
      routed dataset is materialized once in the object store and
      feeds BOTH consumers — no parse/enrich recompute, no disk
      round-trip.  ~30% faster at 12M turns, but the object-store
      copies are memory-bandwidth-bound (8→32-core efficiency ~0.76)
      and past ~50% store occupancy the spill path makes it SLOWER
      than disk-backed (96M turns: 88 s vs 29.7 s).
    - ``materialize_routed=False`` (cluster mode): aggregate reads the
      just-written sink parquet back.  The right shape when the routed
      set exceeds object-store memory (any multi-TB run) — and it
      strong-scales at ~1.0 (BASELINE.md round-2 measurements).
    - ``None`` (default): auto-select from the input size estimate vs
      the object store (:func:`_should_materialize`).

    Same shape as ``_flagship_shard_fn`` in either mode."""
    if materialize_routed is None:
        materialize_routed = _should_materialize(sf_dir_or_path)
    routed = routed_transcripts(sf_dir_or_path, batch_size=batch_size)
    if materialize_routed:
        routed = routed.materialize()
    paths = write_fanout(routed, f"{out_dir}/sinks")
    if materialize_routed:
        agg = service_summary(routed, intervals, batch_size * 2)
    else:
        from ..sources.parquet import read_parquet_clean
        from ..stages.aggregate import SERVICE_SUMMARY_INPUT_COLUMNS

        # prune the re-read to the aggregate's input columns — the
        # sink parquet carries ~25 enriched columns (text included)
        # and this disk-backed shape IS the multi-TB path
        agg = service_summary(
            read_parquet_clean(
                f"{out_dir}/sinks", columns=SERVICE_SUMMARY_INPUT_COLUMNS
            ),
            intervals,
            batch_size * 2,
        )
    agg_path = f"{out_dir}/service_summary"
    agg.write_parquet(agg_path)
    paths["service_summary"] = agg_path
    return paths
