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
