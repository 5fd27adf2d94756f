"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

The LAST stdout line is ONE compact JSON object (kept under the
driver's 2000-char tail-capture budget — round 4's artifact outgrew
it and recorded ``parsed: null``):
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}
Everything that doesn't fit that budget (per-query sample arrays,
group allocator probes, pressure/spill info, malloc tuning, RSS
high-water marks) goes to ``BENCH_DETAIL.json`` next to this file and
is also printed as an earlier stdout line.

``--scaling`` runs the headline pipeline in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the same input and reports both throughputs
plus scaling efficiency (the sandbox evidence for the north rule's
N-vs-4N-node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from shutil import which as shutil_which

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# scale factor for the bench input: replicate conversations so the run
# measures throughput, not fixed overhead (sf0.1 → 100k turns × 120 = 12M)
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "120"))
OUT = os.environ.get("GRAFT_BENCH_OUT", "/tmp/occr_bench_out")

# Round-4/5 artifact-trust protocol (rounds 3-4 verdict items): the
# shared host's memory throughput swings ~10x over minutes, so (a)
# EVERY cross-round-comparable query is min-of-N (default 3), (b)
# an allocator-probe health reading is stamped immediately before each
# query GROUP — when it reads degraded the run sleeps and retries the
# probe instead of recording garbage, and the per-group readings land
# in the artifact so any residual outlier is explainable, and (c) the
# sampling policy is UNIFORM (round-4 item #3 closed): every query —
# headline included — gets the same min-of-N plus the same
# spread-triggered top-up (while max/min of samples > TOPUP_SPREAD,
# buy up to TOPUP_MAX extra samples after a short sleep), and ALL raw
# samples land in BENCH_DETAIL.json so a reader can re-derive any
# statistic.  No query's protocol differs from its neighbors'.
MIN_RUNS = int(os.environ.get("GRAFT_BENCH_MIN_RUNS", "3"))
TOPUP_SPREAD = float(os.environ.get("GRAFT_BENCH_TOPUP_SPREAD", "1.5"))
TOPUP_MAX = int(os.environ.get("GRAFT_BENCH_TOPUP_MAX", "2"))
TOPUP_SLEEP_S = float(os.environ.get("GRAFT_BENCH_TOPUP_SLEEP", "10"))
PROBE_MIN_GBPS = float(os.environ.get("GRAFT_BENCH_PROBE_MIN", "0.8"))
PROBE_RETRIES = int(os.environ.get("GRAFT_BENCH_PROBE_RETRIES", "4"))
PROBE_SLEEP_S = float(os.environ.get("GRAFT_BENCH_PROBE_SLEEP", "20"))

probes: dict = {}  # group -> {"gbps": x, "retries": n}
samples: dict = {}  # query -> [sec, sec, ...] (every raw sample)


def _timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


def _timed_min(name, fn, n: int | None = None):
    """Uniform-policy timing: min-of-N plus a spread-triggered top-up
    applied identically to EVERY query (round-4 verdict item #3 — the
    headline-only adaptive re-sampling was selection-biased).  All raw
    samples are recorded in ``samples[name]``.  Returns (min_sec,
    result of the last run)."""
    n = MIN_RUNS if n is None else n
    runs, res = [], None
    for _ in range(max(n, 1)):
        sec, res = _timed(fn)
        runs.append(sec)
    extra = 0
    while (
        len(runs) >= 2
        and max(runs) / max(min(runs), 1e-9) > TOPUP_SPREAD
        and extra < TOPUP_MAX
    ):
        time.sleep(TOPUP_SLEEP_S)
        sec, res = _timed(fn)
        runs.append(sec)
        extra += 1
    samples[name] = [round(s, 3) for s in runs]
    return min(runs), res


def _timed_ratio(base_name, test_name, base_fn, test_fn, n=None):
    """Paired same-window skew ratio (round 5): alternate BASE and
    TEST samples so the two sides sample the same sequence of host
    windows, then report ``min(test) / min(base)`` — the steady-state
    estimator the whole bench uses (min-of-N), made fair by the
    interleaving.  Two failure modes drove this design: (a) separately
    timed sides let a min/min ratio track the drift BETWEEN the two
    measurement windows (the identical aggregate job read 3.5 s in the
    counts group and 13.4-19.4 s as the skew group's base minutes
    later, both probes healthy); interleaving removes that.  (b) the
    median of per-pair ratios — the first round-5 design — inherits
    the ±2x WITHIN-pair drift of this host's 4-18 s windows: the r5
    canonical run recorded pair ratios [0.90, 1.63, 2.18, 1.08, 1.49]
    for an aggregate whose group keys don't even include the skewed
    conv_id, i.e. pure measurement noise.  Every raw pair ratio is
    still recorded in ``samples[test_name + "_pair_ratios"]`` so a
    reader can re-derive either estimator."""
    import statistics

    n = MIN_RUNS if n is None else n
    base_runs, test_runs = [], []

    def one_pair():
        sb, _ = _timed(base_fn)
        st, _ = _timed(test_fn)
        base_runs.append(sb)
        test_runs.append(st)

    for _ in range(max(n, 1)):
        one_pair()
    ratios = [t / max(b, 1e-9) for b, t in zip(base_runs, test_runs)]
    extra = 0
    while (
        len(ratios) >= 2
        and max(ratios) / max(min(ratios), 1e-9) > TOPUP_SPREAD
        and extra < TOPUP_MAX
    ):
        time.sleep(TOPUP_SLEEP_S)
        one_pair()
        ratios.append(test_runs[-1] / max(base_runs[-1], 1e-9))
        extra += 1
    samples[base_name] = [round(s, 3) for s in base_runs]
    samples[test_name] = [round(s, 3) for s in test_runs]
    samples[test_name + "_pair_ratios"] = [round(r, 3) for r in ratios]
    samples[test_name + "_ratio_median_pairs"] = [
        round(statistics.median(ratios), 3)
    ]
    return (
        min(base_runs),
        min(test_runs),
        min(test_runs) / max(min(base_runs), 1e-9),
    )


def emit_artifact(head: dict, detail: dict) -> None:
    """Emit the bench artifact in two parts (round-4 verdict item #1 —
    the r4 JSON outgrew the driver's 2000-char tail capture and graded
    as ``parsed: null``):

    1. the FULL artifact (head + detail: sample arrays, group probes,
       pressure info, malloc tuning, RSS) written to
       ``BENCH_DETAIL.json`` next to this file and printed as an
       earlier stdout line, and
    2. the compact headline object printed as the LAST stdout line,
       shedding optional fields if it ever nears the capture budget —
       the driver parses the tail's last line, so this line is the
       grade line and must always be complete JSON."""
    full = dict(head)
    full.update(detail)
    print(json.dumps(full, separators=(",", ":")))
    # headline-only children (the --scaling levels) must not clobber
    # the full run's detail file
    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        try:
            detail_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAIL.json",
            )
            with open(detail_path, "w") as f:
                f.write(json.dumps(full, indent=1))
            head = dict(head, detail="BENCH_DETAIL.json")
        except OSError:
            pass
    line = json.dumps(head, separators=(",", ":"))
    if len(line) > 1900:
        for drop in ("detail", "min_runs", "unit", "metric"):
            head.pop(drop, None)
            line = json.dumps(head, separators=(",", ":"))
            if len(line) <= 1900:
                break
    print(line)


def group_probe(name: str) -> float:
    """Stamp the current effective memory throughput for a query group
    into ``probes[name]``; sleep+retry while the host window is
    degraded (below PROBE_MIN_GBPS) so the group's numbers aren't
    recorded in a collapsed window."""
    from opentelemetry_collector_components_ray.functions.allocprobe import (
        effective_fill_rate,
    )

    gbps = 0.0
    for attempt in range(PROBE_RETRIES + 1):
        gbps = effective_fill_rate()
        if gbps >= PROBE_MIN_GBPS or attempt == PROBE_RETRIES:
            probes[name] = {"gbps": round(gbps, 3), "retries": attempt}
            return gbps
        time.sleep(PROBE_SLEEP_S)
    return gbps


def main() -> None:
    import shutil

    import ray

    # host-adaptive allocator decision (BEFORE ray.init so workers
    # inherit the exported env; see functions/allocprobe.py)
    from opentelemetry_collector_components_ray.functions.allocprobe import (
        resolve_malloc_tuning,
    )

    malloc_tuning = resolve_malloc_tuning()

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from opentelemetry_collector_components_ray.pipelines.flagship import (
        flagship_aggregate,
        routed_transcripts,
        enriched_transcripts,
    )
    from opentelemetry_collector_components_ray.stages import aggregate as agg
    from opentelemetry_collector_components_ray.stages.parse import parse_stage
    from opentelemetry_collector_components_ray.stages.route import write_fanout
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.synth import (
        materialize_scaled_transcripts,
    )

    inp = materialize_scaled_transcripts(SF_DIR, REPEAT)
    n_turns = read_transcripts(inp).count()  # also warms the page cache

    queries = {}

    # headline: full parse→enrich→route→fanout-write + aggregate write;
    # run twice (fresh output dir each time), report steady-state (min)
    # and keep the cold run visible
    def headline():
        import ray.data as rd

        from opentelemetry_collector_components_ray.stages.aggregate import (
            service_summary,
        )

        shutil.rmtree(OUT, ignore_errors=True)
        if os.environ.get("GRAFT_BENCH_DISKBACK"):
            # cluster-representative configuration: the routed set is
            # written once and the aggregation reads the parquet back.
            # At 100 TB the routed dataset cannot live in the object
            # store, so THIS is the shape a multi-node run executes —
            # and it strong-scales at ~1.0 (see BASELINE.md).
            from opentelemetry_collector_components_ray.sources import (
                read_parquet_clean,
            )

            from opentelemetry_collector_components_ray.stages.aggregate import (
                SERVICE_SUMMARY_INPUT_COLUMNS,
            )

            routed = routed_transcripts(inp)
            write_fanout(routed, f"{OUT}/sinks")
            service_summary(
                read_parquet_clean(
                    f"{OUT}/sinks", columns=SERVICE_SUMMARY_INPUT_COLUMNS
                ),
                ("1h", "24h"),
            ).write_parquet(f"{OUT}/service_summary")
        else:
            # single-node latency mode: materialize once; both
            # consumers read the object-store blocks (fastest at every
            # CPU count measured, but memory-bandwidth-bound — its
            # 8→32-core efficiency is ~0.76 vs ~1.0 disk-backed)
            routed = routed_transcripts(inp).materialize()
            write_fanout(routed, f"{OUT}/sinks")
            service_summary(routed, ("1h", "24h")).write_parquet(
                f"{OUT}/service_summary"
            )

    group_probe("flagship")
    # cold run recorded separately (page-cache + codegen effects),
    # then the SAME min-of-N + spread-top-up policy as every other
    # query — the round-4 headline-only floor-based re-sampling was
    # asymmetric and is gone (verdict item #3)
    cold, _ = _timed(headline)
    queries["flagship_e2e_cold"] = cold
    samples["flagship_e2e_cold"] = [round(cold, 3)]
    queries["flagship_e2e"], _ = _timed_min("flagship_e2e", headline)

    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") and not os.environ.get(
        "GRAFT_BENCH_DISKBACK"
    ):
        # also record the cluster-representative configuration (the
        # shape --scaling measures; see headline() for the trade)
        os.environ["GRAFT_BENCH_DISKBACK"] = "1"
        try:
            queries["flagship_e2e_diskback"], _ = _timed_min(
                "flagship_e2e_diskback", headline
            )
        finally:
            del os.environ["GRAFT_BENCH_DISKBACK"]

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        val = queries["flagship_e2e"]
        # shutdown BEFORE printing: stops worker log streaming so no
        # stray stderr/stdout line can land after the grade line (the
        # driver parses the tail's last line)
        ray.shutdown()
        emit_artifact(
            {
                "metric": "flagship parse→enrich→route→aggregate e2e",
                "value": round(val, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in queries.items()},
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / val, 1),
            },
            {
                "samples": samples,
                "group_probes_gbps": probes,
                "malloc_tuning": malloc_tuning,
            },
        )
        return

    group_probe("counts")
    queries["parse_count"], _ = _timed_min(
        "parse_count",
        lambda: parse_stage(read_transcripts(inp)).count()
    )
    queries["enrich_count"], _ = _timed_min(
        "enrich_count",
        lambda: enriched_transcripts(inp).count()
    )
    queries["service_summary"], _ = _timed_min(
        "service_summary",
        lambda: flagship_aggregate(inp, ("1h", "24h")).count()
    )
    queries["latest_state"], _ = _timed_min(
        "latest_state",
        lambda: agg.latest_state(enriched_transcripts(inp)).count()
    )
    # bucketed expo-histogram finish over the full 12M-turn input
    # (round-5: the final reduce no longer funnels through one worker)
    queries["expo_histogram"], _ = _timed_min(
        "expo_histogram",
        lambda: agg.expo_latency_histogram(
            enriched_transcripts(inp), "1h"
        ).count(),
    )

    # checkpointed sharded runner (per-shard manifests + resume)
    def sharded():
        from opentelemetry_collector_components_ray.pipelines.flagship import (
            run_flagship_sharded,
        )

        shutil.rmtree(f"{OUT}_sharded", ignore_errors=True)
        run_flagship_sharded(
            inp, f"{OUT}_sharded", num_shards=16, max_concurrent=4
        )

    group_probe("sharded")
    queries["flagship_sharded"], _ = _timed_min("flagship_sharded", sharded)

    # training-data ops over the documents/embeddings tables (sf-sized)
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages import (
        ann as ann_mod,
        dedup as dedup_mod,
        text as text_mod,
    )

    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )

    docs = read_parquet_clean(f"{SF_DIR}/documents.parquet")
    embs = read_parquet_clean(f"{SF_DIR}/embeddings.parquet")
    group_probe("docs")
    queries["doc_token_counts"], _ = _timed_min(
        "doc_token_counts",
        lambda: text_mod.token_counts(docs).count()
    )
    queries["doc_exact_dedup"], _ = _timed_min(
        "doc_exact_dedup",
        lambda: dedup_mod.exact_dedup(docs).count()
    )

    # exact substring dedup at 500k genuinely-diverse docs (~13M
    # rolling 8-word windows): planted passages are the duplicated
    # spans; broadcast finish (the estimator default at this size) and
    # the fully-bucketed scale path benched side by side, like
    # doc_minhash_pairs
    def _substr_corpus():
        from opentelemetry_collector_components_ray.stages import substr
        from opentelemetry_collector_components_ray.synth import (
            synth_random_documents,
        )

        return substr.plant_passages(
            synth_random_documents(500_000)
        ).materialize()

    sub_docs = _substr_corpus()
    from opentelemetry_collector_components_ray.stages import (
        substr as substr_mod,
    )

    group_probe("substr")
    queries["doc_substring_dedup_500k"], _ = _timed_min(
        "doc_substring_dedup_500k",
        lambda: substr_mod.substring_dedup(
            sub_docs, k=8, distributed=False
        ).count()
    )
    queries["doc_substring_dedup_500k_distributed"], _ = _timed_min(
        "doc_substring_dedup_500k_distributed",
        lambda: substr_mod.substring_dedup(
            sub_docs, k=8, distributed=True, num_buckets=256
        ).count()
    )
    del sub_docs

    def decontam_run():
        from opentelemetry_collector_components_ray.stages import decontam

        snips = decontam.benchmark_snippets(docs)
        return decontam.decontaminate(docs, snips).count()

    group_probe("decontam_lm")
    queries["doc_decontaminate"], _ = _timed_min("doc_decontaminate", decontam_run)

    def lm_run():
        from opentelemetry_collector_components_ray.stages import lm

        # caps active, as in the driver gate (bounded broadcast model)
        return lm.lm_stats(docs, k=20, min_count=2, min_df=2).count()

    queries["doc_lm_stats"], _ = _timed_min("doc_lm_stats", lm_run)
    # full curation composition: profile → quality filter → exact +
    # near-dup dedup → prefix-scan packing, one streaming pipeline
    def curation_run():
        from opentelemetry_collector_components_ray.stages.curation import (
            CurationConfig,
            curate,
        )

        return curate(
            docs, cfg=CurationConfig(pack_budget=2048)
        ).count()

    queries["docs_curation_e2e"], _ = _timed_min("docs_curation_e2e", curation_run)

    group_probe("minhash")
    queries["doc_minhash_pairs"], _ = _timed_min(
        "doc_minhash_pairs",
        lambda: dedup_mod.minhash_near_dups(docs, threshold=0.8).count()
    )
    queries["doc_minhash_pairs_broadcast"], _ = _timed_min(
        "doc_minhash_pairs_broadcast",
        lambda: dedup_mod.minhash_near_dups(
            docs, threshold=0.8, verify="broadcast"
        ).count()
    )

    # distributed cluster dedup at >=5M docs (round-2 review criterion):
    # replicate the docs table with fresh ids, then the full
    # minhash -> LSH -> distributed label propagation path — the edge
    # table and every propagation round stay in the object store
    def cluster_5m():
        import numpy as np
        import pyarrow as pa

        n_docs = docs.count()
        reps = -(-5_000_000 // n_docs)
        stride = 10_000_000

        def replicate(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.concat_tables(
                [
                    pa.table(
                        {
                            "doc_id": pa.array(ids + r * stride),
                            "text": batch["text"],
                        }
                    )
                    for r in range(reps)
                ]
            )

        big = docs.map_batches(
            replicate, batch_format="pyarrow"
        ).materialize()
        return dedup_mod.minhash_clusters(
            big, distributed=True, coarse_buckets=256
        ).count()

    group_probe("cluster_5m")
    queries["doc_cluster_dedup_5m"], _ = _timed_min("doc_cluster_dedup_5m", cluster_5m)

    # capped unigram-LM scoring at 5M docs (round-4 item: the broadcast
    # model is BOUNDED — min_count floor + top-V cap, trimmed tail in
    # one OOV bucket — so driver RSS stays flat no matter the corpus);
    # the driver max-RSS high-water mark lands in the artifact
    def lm_5m():
        import numpy as np
        import pyarrow as pa

        from opentelemetry_collector_components_ray.stages import lm

        n_docs = docs.count()
        reps = -(-5_000_000 // n_docs)

        def replicate(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.concat_tables(
                [
                    pa.table(
                        {
                            "doc_id": pa.array(ids + r * 10_000_000),
                            "text": batch["text"],
                        }
                    )
                    for r in range(reps)
                ]
            )

        big = docs.map_batches(replicate, batch_format="pyarrow")
        return lm.unigram_logprob(
            big, min_count=5, max_vocab=200_000
        ).count()

    group_probe("lm_5m")
    queries["doc_unigram_5m"], _ = _timed_min("doc_unigram_5m", lm_5m, n=1)
    import resource as _resource

    driver_max_rss_mb = (
        _resource.getrusage(_resource.RUSAGE_SELF).ru_maxrss // 1024
    )

    # bloom-prefiltered vs bucketed anti-join over the 12M-turn input
    # (decontamination shape: small dirty-id right side, huge left) —
    # the bloom path settles definite misses from the broadcast filter
    # so the exchange moves candidates only
    def _turns_with_ids():
        import pyarrow as _pa

        def add_key(t: _pa.Table) -> _pa.Table:
            import pyarrow.compute as _pc

            key = _pc.binary_join_element_wise(
                _pc.cast(t["conv_id"], _pa.string()),
                _pc.cast(t["turn_idx"], _pa.string()),
                "#",
            )
            return _pa.table({"key": key, "role": t["role"]})

        return read_transcripts(inp).map_batches(
            add_key, batch_format="pyarrow", zero_copy_batch=True
        )

    left = _turns_with_ids()
    dirty = left.limit(20000).select_columns(["key"]).materialize()
    from opentelemetry_collector_components_ray.functions.join import (
        filter_join,
    )

    group_probe("anti_join")
    # "bucketed" stays pinned to the full-row exchange for cross-round
    # comparability; "keyexchange" is the round-5 default distributed
    # path (matched-key intersection + broadcast is_in — wide rows
    # never enter the all-to-all)
    queries["turns_anti_join_bucketed"], _ = _timed_min(
        "turns_anti_join_bucketed",
        lambda: filter_join(
            left, dirty, on="key", mode="anti", broadcast=False,
            exchange="rows",
        ).count()
    )
    queries["turns_anti_join_keyexchange"], _ = _timed_min(
        "turns_anti_join_keyexchange",
        lambda: filter_join(
            left, dirty, on="key", mode="anti", broadcast=False
        ).count()
    )
    queries["turns_anti_join_bloom"], _ = _timed_min(
        "turns_anti_join_bloom",
        lambda: filter_join(
            left, dirty, on="key", mode="anti", broadcast=False,
            prefilter="bloom",
        ).count()
    )

    group_probe("ann")
    queries["emb_cosine_topk"], _ = _timed_min(
        "emb_cosine_topk",
        lambda: ann_mod.cosine_topk(
            embs, embs.filter(expr="vec_id < 5"), k=10
        ).count()
    )

    # PQ at 500k vectors: encode throughput + IVFPQ probe-pruned search
    # over the codes-only partitioned index
    def _embs_500k():
        import pyarrow as _pa

        def rep(batch: _pa.Table) -> _pa.Table:
            import numpy as _np2

            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
                _np2.int64
            )
            reps_e = -(-500_000 // n_embs)
            return _pa.concat_tables(
                [
                    _pa.table(
                        {
                            "vec_id": _pa.array(ids + r * 1_000_000),
                            "embedding": batch["embedding"],
                        }
                    )
                    for r in range(reps_e)
                ]
            )

        return embs.map_batches(
            rep, batch_format="pyarrow"
        ).materialize()

    n_embs = embs.count()
    big_embs = _embs_500k()
    pq_cb = ann_mod.pq_train_codebook(embs, m=8, n_codes=256)
    queries["emb_pq_encode_500k"], _ = _timed_min(
        "emb_pq_encode_500k",
        lambda: ann_mod.pq_encode(big_embs, pq_cb).count()
    )
    import tempfile as _tf

    ivfpq_dir = _tf.mkdtemp(prefix="occr_bench_ivfpq_")
    # n_centroids pinned (the √N rule would train 707 driver-side and
    # dominate the timing; centroid-training scale is ivf_build's story)
    def build_ivfpq():
        # write_parquet appends: min-of-N reruns must start from an
        # empty dir or the index doubles per run
        shutil.rmtree(ivfpq_dir, ignore_errors=True)
        return ann_mod.ivfpq_build_index(
            big_embs, ivfpq_dir, n_centroids=64, codebook=pq_cb
        )

    queries["emb_ivfpq_build_500k"], _ = _timed_min("emb_ivfpq_build_500k", build_ivfpq)
    queries["emb_ivfpq_search_pruned"], _ = _timed_min(
        "emb_ivfpq_search_pruned",
        lambda: ann_mod.ivfpq_search_index(
            ivfpq_dir, embs.filter(expr="vec_id < 3"), k=10, nprobe=8
        ).count()
    )
    shutil.rmtree(ivfpq_dir, ignore_errors=True)

    # IVF persistent index: build once, then probe-pruned search — the
    # evidence that probing prunes at the READ (bytes touched =
    # probed-partition bytes, not the corpus)
    import glob as _glob
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix="occr_bench_ivf_")
    n_cent = ann_mod.auto_n_centroids(embs)
    nprobe = max(1, n_cent // 8)
    def build_ivf():
        shutil.rmtree(idx_dir, ignore_errors=True)  # append-safe rerun
        return ann_mod.ivf_build_index(embs, idx_dir, n_centroids=n_cent)

    queries["emb_ivf_build"], _ = _timed_min("emb_ivf_build", build_ivf)
    # few queries = the point-lookup shape where probing prunes;
    # a 50-query batch's probe union covers most partitions
    qset = embs.filter(expr="vec_id < 3")
    queries["emb_ivf_search_pruned"], _ = _timed_min(
        "emb_ivf_search_pruned",
        lambda: ann_mod.ivf_search_index(
            idx_dir, qset, k=10, nprobe=nprobe
        ).count()
    )
    # pruned-read fraction: bytes under the probed partitions vs all
    import numpy as _np

    cent = _np.load(f"{idx_dir}/centroids.npy")
    qdf = qset.to_pandas().sort_values("vec_id", kind="mergesort")
    qm = _np.stack(qdf["embedding"].to_numpy()).astype(_np.float64)
    qm = qm / _np.linalg.norm(qm, axis=1, keepdims=True)
    probe_rows = _np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    needed = {int(c) for row in probe_rows for c in row}

    def _dir_bytes(paths):
        return sum(os.path.getsize(p) for p in paths)

    all_parts = _glob.glob(f"{idx_dir}/vectors/centroid_id=*/*.parquet")
    probed = [
        p for p in all_parts
        if int(p.split("centroid_id=")[1].split("/")[0]) in needed
    ]
    ivf_read_fraction = round(
        _dir_bytes(probed) / max(_dir_bytes(all_parts), 1), 4
    )
    import shutil as _shutil

    _shutil.rmtree(idx_dir, ignore_errors=True)

    # --- skew stress (round-4 item): one conv_id holds 1/10 of all
    # turns; the combiner-first aggregate and the hash-bucketed
    # sessionize must stay ~flat vs the unskewed input (the
    # reference's cardinality-overflow concern,
    # merger/limits/tracker.go:68-84).  Same row count / text / ts as
    # the unskewed input, so the pair isolates key distribution.
    from opentelemetry_collector_components_ray.stages.conversation import (
        sessionize,
    )
    from opentelemetry_collector_components_ray.synth import (
        materialize_skewed_transcripts,
    )

    group_probe("skew")
    skew_inp = materialize_skewed_transcripts(SF_DIR, REPEAT)
    read_transcripts(skew_inp).count()  # warm page cache like inp
    # the skew claim is a RATIO from interleaved (base, skew) PAIRS —
    # each pair shares one host window, and the reported ratio is the
    # median pair ratio, so it measures key distribution rather than
    # the drift between two separately-min'd sides (see _timed_ratio)
    (
        queries["service_summary_skew_base"],
        queries["service_summary_skew"],
        ss_ratio,
    ) = _timed_ratio(
        "service_summary_skew_base", "service_summary_skew",
        lambda: flagship_aggregate(inp, ("1h", "24h")).count(),
        lambda: flagship_aggregate(skew_inp, ("1h", "24h")).count(),
    )
    queries["service_summary_skew_ratio"] = round(ss_ratio, 3)
    (
        queries["sessionize"],
        queries["sessionize_skew"],
        sz_ratio,
    ) = _timed_ratio(
        "sessionize", "sessionize_skew",
        lambda: sessionize(read_transcripts(inp)).count(),
        lambda: sessionize(read_transcripts(skew_inp)).count(),
    )
    queries["sessionize_skew_ratio"] = round(sz_ratio, 3)

    # --- block-size envelope (round-4 item #8): the disk-backed
    # flagship swept across target_max_block_size ∈ {16,64,128} MiB —
    # the knob a 100 TB cluster tunes first (block = the unit of
    # scheduling, shuffle granularity and spill).  Same uniform
    # min-of-N policy; default restored afterwards.
    group_probe("blocksweep")
    default_block = ctx.target_max_block_size
    os.environ["GRAFT_BENCH_DISKBACK"] = "1"
    try:
        for mib in (16, 64, 128):
            ctx.target_max_block_size = mib * 1024 * 1024
            queries[f"flagship_block_{mib}m"], _ = _timed_min(
                f"flagship_block_{mib}m", headline
            )
    finally:
        del os.environ["GRAFT_BENCH_DISKBACK"]
        ctx.target_max_block_size = default_block

    # --- object-store-pressure artifact (round-4 item): a fresh
    # process with the store pinned to ~25% of the routed set's
    # decoded size runs the full flagship — the closest single-node
    # proxy for multi-node object movement.  The auto mode selector
    # must pick the disk-backed shape and complete; spill counters
    # land in the artifact.
    group_probe("pressure")
    pressure_info = None
    try:
        penv = dict(os.environ, RAY_GRAFT_CPUS=str(NUM_CPUS))
        pout = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pressure"],
            env=penv, capture_output=True, text=True, check=True,
            timeout=int(os.environ.get("GRAFT_BENCH_PRESSURE_TIMEOUT",
                                       "1800")),
        ).stdout
        pressure_info = json.loads(pout.strip().splitlines()[-1])
        queries["flagship_e2e_pressure"] = pressure_info["sec"]
    except Exception as exc:  # record the failure, don't lose the run
        pressure_info = {"error": str(exc)[-500:]}

    val = queries["flagship_e2e"]
    # shutdown BEFORE printing (same rationale as the headline-only
    # branch: the grade line must be the last thing on stdout)
    ray.shutdown()
    emit_artifact(
        {
            "metric": "flagship parse→enrich→route→aggregate e2e",
            "value": round(val, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in queries.items()},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_turns": n_turns,
            "turns_per_sec": round(n_turns / val, 1),
            "min_runs": MIN_RUNS,
        },
        {
            "samples": samples,
            "group_probes_gbps": probes,
            "pressure": pressure_info,
            "driver_max_rss_mb": driver_max_rss_mb,
            "ivf_n_centroids": n_cent,
            "ivf_nprobe": nprobe,
            "ivf_pruned_read_fraction": ivf_read_fraction,
            "malloc_tuning": malloc_tuning,
        },
    )


def pressure() -> None:
    """Fresh-process flagship run with the object store pinned to ~25%
    of the routed set's decoded size — the single-node proxy for
    multi-node object movement.  Proves the store-aware mode selection
    (disk-backed under starvation) and that execution completes by
    streaming instead of thrashing; prints one JSON line with the
    runtime, the chosen mode and the spill counters.

    Uses 4× the full-bench input (48M turns by default) so the 25%
    store is a meaningful few-GB figure, and shrinks the block-size
    target so ``concurrency × block`` fits the starved store — with
    the default 128 MB blocks a starved store holds fewer blocks than
    there are workers and backpressure degenerates to thrash (measured:
    a 512 MB store at 32 CPUs churned for 15+ minutes)."""
    import re
    import shutil

    import ray

    from opentelemetry_collector_components_ray.functions.allocprobe import (
        resolve_malloc_tuning,
    )

    resolve_malloc_tuning()
    from opentelemetry_collector_components_ray.pipelines.flagship import (
        _estimate_input_bytes,
        _should_materialize,
        run_flagship,
    )
    from opentelemetry_collector_components_ray.synth import (
        materialize_scaled_transcripts,
    )

    repeat = int(os.environ.get("GRAFT_BENCH_PRESSURE_REPEAT",
                                str(REPEAT * 4)))
    inp = materialize_scaled_transcripts(SF_DIR, repeat)
    est_decoded = _estimate_input_bytes(inp) * 3
    store = max(int(est_decoded * 0.25), 1 << 30)
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        object_store_memory=store,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # keep concurrency × block well inside the starved store
    ctx.target_max_block_size = 16 * 1024 * 1024
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    auto_materialize = _should_materialize(inp)
    out = OUT + "_pressure"
    shutil.rmtree(out, ignore_errors=True)
    sec, _ = _timed(lambda: run_flagship(inp, out))
    # spill accounting: grpc (memory_summary) is absent in this
    # container, so read the session's spill artifacts directly —
    # spilled objects land as files under <session>/ray_spilled_objects
    # and the raylet log records the cumulative "Spilled N MiB" line
    spilled_mib, spilled_objects = 0, 0
    try:
        import glob as _glob

        sess = ray._private.worker._global_node.get_session_dir_path()
        spill_files = _glob.glob(
            os.path.join(sess, "ray_spilled_objects*", "*")
        )
        spilled_objects = len(spill_files)
        spilled_mib = sum(os.path.getsize(p) for p in spill_files) // (
            1 << 20
        )
        raylet_log = os.path.join(sess, "logs", "raylet.out")
        if os.path.exists(raylet_log):
            with open(raylet_log, errors="replace") as f:
                hits = re.findall(r"Spilled (\d+) MiB, (\d+) objects",
                                  f.read())
            if hits:
                spilled_mib = max(spilled_mib, int(hits[-1][0]))
                spilled_objects = max(spilled_objects, int(hits[-1][1]))
    except Exception:
        spilled_mib, spilled_objects = -1, -1
    ray.shutdown()  # before printing: the parent parses the last line
    print(
        json.dumps(
            {
                "sec": round(sec, 3),
                "repeat": repeat,
                "object_store_mb": store // (1 << 20),
                "est_routed_decoded_mb": est_decoded // (1 << 20),
                "auto_materialize": auto_materialize,
                "spilled_mib": spilled_mib,
                "spilled_objects": spilled_objects,
            }
        )
    )


def scaling() -> None:
    """Two fresh-process parallelism levels on the same input.

    Levels run INTERLEAVED in (lo, hi) pairs — the same-window-pair
    lesson the skew ratios learned in round 5: sequential level blocks
    let host-window drift between the blocks masquerade as (or mask)
    scaling loss; alternating them makes both levels sample the same
    window sequence.  Efficiency is min(lo)/min(hi) normalized by the
    level ratio (the steady-state estimator the whole bench uses), and
    every raw sample plus per-pair ratio is printed so a reader can
    re-derive either statistic.  Cross-process runs vary ±20% with
    filesystem/page-cache state, hence ≥2 pairs.

    The scaling input defaults to 4× the full-bench input (48M turns):
    after the round-2 materialize optimization the 32-cpu headline
    dropped to ~4 s, where the ~1.5 s of fixed driver/scheduling cost
    masquerades as scaling loss.  Throughput scaling must be measured
    in the throughput regime — runtime ≫ fixed cost at BOTH levels;
    the input is still identical across the two levels (strong
    scaling).  Override with GRAFT_BENCH_REPEAT.

    Levels default to 8→32 and can be overridden with
    GRAFT_SCALING_LEVELS="4,16" — the round-5 finding that motivates
    the knob: this box's MEMORY system itself strong-scales at only
    ~0.62 from 8 to 32 concurrent fill processes (58 → 144 GB/s
    aggregate, allocprobe), so a 4× CPU pair on ONE box embeds a
    hardware ceiling a real N→4N NODE cluster does not have (each
    node brings its own memory controllers).  The artifact therefore
    also stamps the measured fill-bandwidth ceiling for the chosen
    pair so the engine's scaling can be read against the box's.
    """
    scale_repeat = os.environ.get("GRAFT_BENCH_REPEAT", str(REPEAT * 4))

    # one allocator decision for BOTH levels (exported → children inherit)
    from opentelemetry_collector_components_ray.functions.allocprobe import (
        resolve_malloc_tuning,
    )

    malloc_tuning = resolve_malloc_tuning()

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_HEADLINE_ONLY="1",
            GRAFT_BENCH_REPEAT=scale_repeat,
            # scaling measures the cluster-representative (disk-backed)
            # flagship configuration; the materialized latency mode is
            # reported separately in the full bench (see headline())
            GRAFT_BENCH_DISKBACK="1",
        )
        cmd = [sys.executable, os.path.abspath(__file__)]
        # OS-level pinning: ray.init(num_cpus=N) does NOT bound
        # pyarrow/Acero worker threads, so an unpinned "8-cpu" level
        # borrows the whole machine's cores for Arrow kernels and
        # overstates small-cluster throughput.  taskset makes the
        # simulated N-core node honest.
        if ncpu < os.cpu_count() and shutil_which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    levels = os.environ.get("GRAFT_SCALING_LEVELS", "8,32")
    lo, hi = (int(x) for x in levels.split(","))
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "2"))

    lo_runs, hi_runs = [], []
    for _ in range(n_pairs):  # interleaved: both levels see the same
        lo_runs.append(run_once(lo))  # window sequence
        hi_runs.append(run_once(hi))
    r_lo = min(lo_runs, key=lambda r: r["value"])
    r_hi = min(hi_runs, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)

    # the box's own memory-system scaling for this pair (fresh-alloc
    # fill aggregate at lo vs hi concurrent processes) — the hardware
    # ceiling any memory-bound fraction of the job inherits on a
    # single box, which a real N→4N NODE cluster does not
    from opentelemetry_collector_components_ray.functions.allocprobe import (
        effective_fill_rate,
    )

    fill_lo = effective_fill_rate(nproc=lo) * lo
    fill_hi = effective_fill_rate(nproc=hi) * hi
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency ({lo}→{hi} cpus)",
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"turns_per_sec_{lo}": r_lo["turns_per_sec"],
                f"turns_per_sec_{hi}": r_hi["turns_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "samples_lo": [r["value"] for r in lo_runs],
                "samples_hi": [r["value"] for r in hi_runs],
                "pair_ratios": [
                    round((a["value"] / b["value"]) / (hi / lo), 3)
                    for a, b in zip(lo_runs, hi_runs)
                ],
                "membw_fill_aggregate_gbps": {
                    str(lo): round(fill_lo, 1), str(hi): round(fill_hi, 1)
                },
                "membw_fill_scaling": round(
                    (fill_hi / fill_lo) / (hi / lo), 3
                ),
                "n_turns": r_hi["n_turns"],
                "malloc_tuning": malloc_tuning,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--pressure" in sys.argv:
        pressure()
    else:
        main()
