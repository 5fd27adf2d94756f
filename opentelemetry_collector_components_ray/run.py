"""Job entry point: ``python -m opentelemetry_collector_components_ray.run``.

The batch-engine equivalent of launching a collector binary: builds the
flagship pipeline from a spec and runs it sharded with checkpoints, so
the same command resumes after a crash.  On a cluster this is the
script handed to ``ray job submit`` (the driver connects to the
existing cluster via RAY_ADDRESS); locally it starts a local session.

    python -m opentelemetry_collector_components_ray.run \
        --input /path/to/transcripts_parquet_dir \
        --out /tmp/occr_run --shards 16 --intervals 1h,24h
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="transcript parquet file/dir, or an sf dir")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument(
        "--job",
        default="flagship",
        choices=("flagship", "dedup", "cluster-dedup", "ndjson",
                 "curate", "substring-dedup", "from-config"),
        help="flagship: sharded parse→enrich→route→aggregate over "
        "parquet; dedup: exact-dedup a documents parquet; "
        "cluster-dedup: MinHash near-dup cluster dedup (distributed "
        "label propagation) writing survivors + cluster map; ndjson: "
        "flagship over NDJSON stream files; curate: the full "
        "profile→filter→dedup→substring→pack preset writing "
        "hive-partitioned training shards",
    )
    p.add_argument("--substring-k", type=int, default=0,
                   help="curate job: remove cross-doc duplicated k-word "
                   "spans (0 = off); substring-dedup job: window size "
                   "(default 8)")
    p.add_argument("--gram-index", default=None,
                   help="substring-dedup job: persistent gram index dir "
                   "for incremental dedup against prior ingests")
    p.add_argument("--run-id", default=None,
                   help="substring-dedup job: ingest id for the gram "
                   "index partition (idempotent re-runs)")
    p.add_argument("--config", default=None,
                   help="from-config job: templated pipeline YAML file")
    p.add_argument("--set", action="append", default=[],
                   metavar="VAR=VALUE", dest="template_vars",
                   help="from-config job: template variable override "
                   "(repeatable)")
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--intervals", default="1h,24h")
    p.add_argument("--batch-size", type=int, default=65536)
    p.add_argument("--no-resume", action="store_true",
                   help="recompute every shard even if checkpointed")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for local runs; ignored under ray job submit")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import os

    from .pipelines.flagship import run_flagship_sharded
    from .synth import materialize_transcripts

    inp = args.input
    if os.path.isdir(inp) and os.path.exists(
        os.path.join(inp, "events.parquet")
    ):
        inp = materialize_transcripts(inp)

    if args.job == "from-config":
        # pipeline-from-YAML (integrationreceiver README.md:17-25
        # templating over the PipelineSpec/stage registry)
        from .pipelines.config import load_pipeline_yaml
        from .sources import read_transcripts
        from .stages.route import write_fanout

        if not args.config:
            p.error("--job from-config requires --config pipeline.yaml")
        overrides = {}
        for kv in args.template_vars:
            if "=" not in kv:
                p.error(f"--set expects VAR=VALUE, got {kv!r}")
            k, _, v = kv.partition("=")
            overrides[k] = v
        spec = load_pipeline_yaml(args.config, overrides)
        routed = spec.build(read_transcripts(inp))
        write_fanout(routed, f"{args.out}/sinks")
        from .sources.parquet import read_parquet_clean

        spec.aggregate(
            read_parquet_clean(f"{args.out}/sinks")
        ).write_parquet(f"{args.out}/service_summary")
        print(
            json.dumps(
                {
                    "status": "ok",
                    "config": args.config,
                    "aggregate": f"{args.out}/service_summary",
                }
            )
        )
        ray.shutdown()
        return 0

    if args.job == "cluster-dedup":
        from .sources.parquet import read_parquet_clean
        from .stages.dedup import minhash_clusters

        src = (
            os.path.join(args.input, "documents.parquet")
            if os.path.isdir(args.input)
            and os.path.exists(
                os.path.join(args.input, "documents.parquet")
            )
            else args.input
        )
        docs = read_parquet_clean(src)
        clusters = minhash_clusters(docs, distributed=True).materialize()
        clusters.write_parquet(f"{args.out}/clusters")
        survivors = clusters.filter(expr="doc_id == cluster_id")
        survivors.write_parquet(f"{args.out}/survivors")
        print(
            json.dumps(
                {
                    "status": "ok",
                    "clusters": f"{args.out}/clusters",
                    "survivors": f"{args.out}/survivors",
                    "n_docs": clusters.count(),
                    "n_survivors": survivors.count(),
                }
            )
        )
        ray.shutdown()
        return 0

    if args.job == "substring-dedup":
        from .sources.parquet import read_parquet_clean
        from .stages.substr import (
            incremental_substring_dedup,
            substring_dedup,
        )

        src = (
            os.path.join(args.input, "documents.parquet")
            if os.path.isdir(args.input)
            and os.path.exists(
                os.path.join(args.input, "documents.parquet")
            )
            else args.input
        )
        docs = read_parquet_clean(src)
        k = args.substring_k or 8
        if args.gram_index:
            # an implicit shared default run id would make two
            # different un-named ingests overwrite each other's index
            # partition (round-3 advice finding)
            if not args.run_id:
                p.error("--gram-index requires an explicit --run-id "
                        "(each ingest needs its own index partition)")
            out_ds = incremental_substring_dedup(
                docs, args.gram_index, args.run_id, k=k
            )
        else:
            out_ds = substring_dedup(docs, k=k)
        out_path = f"{args.out}/substring_deduped"
        out_ds.write_parquet(out_path)
        print(json.dumps({"status": "ok", "deduped": out_path}))
        ray.shutdown()
        return 0

    if args.job == "curate":
        from .sources.parquet import read_parquet_clean
        from .stages.curation import CurationConfig, curate

        src = (
            os.path.join(args.input, "documents.parquet")
            if os.path.isdir(args.input)
            and os.path.exists(
                os.path.join(args.input, "documents.parquet")
            )
            else args.input
        )
        cfg = CurationConfig(
            substring_k=args.substring_k or None
        )
        out_dir = f"{args.out}/shards"
        curate(read_parquet_clean(src), out_dir=out_dir, cfg=cfg)
        print(json.dumps({"status": "ok", "shards": out_dir}))
        ray.shutdown()
        return 0

    if args.job == "dedup":
        import ray.data as rd

        from .stages.dedup import exact_dedup

        src = (
            os.path.join(args.input, "documents.parquet")
            if os.path.isdir(args.input)
            and os.path.exists(
                os.path.join(args.input, "documents.parquet")
            )
            else args.input
        )
        out_path = f"{args.out}/deduped"
        exact_dedup(rd.read_parquet(src)).write_parquet(out_path)
        print(json.dumps({"status": "ok", "deduped": out_path}))
        ray.shutdown()
        return 0

    if args.job == "ndjson":
        from .pipelines.flagship import flagship_aggregate
        from .sources.ndjson import read_ndjson_transcripts
        from .stages.enrich import enrich_stage
        from .stages.parse import parse_stage
        from .stages.route import route_stage, write_fanout
        from .stages.aggregate import service_summary

        from .sources.ndjson import read_ndjson_errors

        ds = read_ndjson_transcripts(args.input)
        routed = route_stage(
            enrich_stage(parse_stage(ds, args.batch_size), args.batch_size)
        )
        write_fanout(routed, f"{args.out}/sinks")
        # parallel error sink: malformed lines survive even when a
        # whole stream decodes to zero valid turns
        read_ndjson_errors(args.input).write_parquet(
            f"{args.out}/decode_errors"
        )
        import ray.data as rd

        from .sources.parquet import read_parquet_clean

        from .stages.aggregate import SERVICE_SUMMARY_INPUT_COLUMNS

        service_summary(
            read_parquet_clean(
                f"{args.out}/sinks",
                columns=SERVICE_SUMMARY_INPUT_COLUMNS,
            ),
            tuple(args.intervals.split(",")),
        ).write_parquet(f"{args.out}/service_summary")
        print(
            json.dumps(
                {
                    "status": "ok",
                    "aggregate": f"{args.out}/service_summary",
                    "decode_errors": f"{args.out}/decode_errors",
                }
            )
        )
        ray.shutdown()
        return 0

    final = run_flagship_sharded(
        inp,
        args.out,
        intervals=tuple(args.intervals.split(",")),
        num_shards=args.shards,
        batch_size=args.batch_size,
        resume=not args.no_resume,
    )
    print(json.dumps({"status": "ok", "aggregate": final, "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
