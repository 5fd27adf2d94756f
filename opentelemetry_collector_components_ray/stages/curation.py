"""End-to-end training-data curation: the composition every public
LLM data pipeline runs (C4 / Gopher / RefinedWeb shape), assembled
from this engine's gated primitives so one call takes a raw document
table to packed, deduplicated, quality-filtered training shards —
and an incremental variant that dedups a NEW crawl against the
fingerprint index of everything already ingested.

Stages (each individually value-gated elsewhere; the composition adds
no new math, only plumbing):

1. profile   — fused token/quality/language/fingerprint/repetition
               pass (stages/text.py)
2. filter    — vectorized Arrow mask over the profile columns
               (language allow-list, quality + repetition thresholds)
3. dedup     — exact (hash-bucketed min-id survivor), then MinHash
               near-dup clusters (distributed label propagation),
               keeping each cluster's min-id doc
4. pack      — ordered prefix-scan → concat-and-chunk sample ids
5. write     — hive-partitioned parquet by pack chunk range so a
               failed run resumes per partition

Everything streams; the only materializations are the two the
underlying ops document (the sort output inside the packing scan and
the propagation rounds inside minhash clustering).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


@dataclass
class CurationConfig:
    langs: Sequence[str] = ("en",)
    min_tokens: int = 5
    max_tokens: int = 100_000
    min_alpha_ratio: float = 0.5
    max_dup_word_frac: float = 0.5
    near_dup: bool = True
    minhash_kwargs: dict = field(default_factory=dict)
    # when set, remove cross-doc duplicated k-word spans (exact
    # substring dedup) after doc-level dedup, then RE-profile the
    # rewritten text so packing budgets see the post-removal counts
    substring_k: Optional[int] = None
    pack_budget: int = 512
    partition_chunks: int = 1024  # pack chunks per output partition


def quality_mask(
    batch: pa.Table, cfg: CurationConfig, check_lang: bool = True
) -> pa.Array:
    """The filter predicate over profile columns — one vectorized
    boolean expression, no Python rows.  ``check_lang=False`` applies
    only the numeric bounds (the post-rewrite re-check: the n-gram
    language heuristic is unreliable on span-shortened text, and the
    language decision was already made on the full document)."""
    m = pc.greater_equal(batch["n_tokens"], cfg.min_tokens)
    if check_lang:
        m = pc.and_(
            m,
            pc.is_in(
                batch["lang_detected"],
                value_set=pa.array(list(cfg.langs), pa.string()),
            ),
        )
    m = pc.and_(m, pc.less_equal(batch["n_tokens"], cfg.max_tokens))
    m = pc.and_(
        m, pc.greater_equal(batch["alpha_ratio"], cfg.min_alpha_ratio)
    )
    return pc.and_(
        m, pc.less_equal(batch["dup_word_frac"], cfg.max_dup_word_frac)
    )


def curate(
    docs: rd.Dataset,
    out_dir: Optional[str] = None,
    cfg: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Profile → filter → exact dedup → near-dup dedup → pack; write
    hive-partitioned shards when ``out_dir`` is given, else return the
    packed Dataset."""
    from ..functions.join import semi_join
    from .dedup import exact_dedup, minhash_dedup_keep
    from .packing import concat_chunk_packing
    from .text import text_profile

    profiled = text_profile(docs, text_col)
    kept = profiled.map_batches(
        lambda t: t.filter(quality_mask(t, cfg)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # dedup selects survivor IDS; the profiled rows rejoin by id so the
    # packing stage still sees n_tokens and the quality columns ride
    # through to the shards
    exact_ids = exact_dedup(
        kept, text_col=text_col, id_col=id_col
    ).select_columns([id_col])
    deduped = semi_join(kept, exact_ids, on=id_col)
    if cfg.near_dup:
        survivors = minhash_dedup_keep(
            deduped, text_col=text_col, id_col=id_col,
            **cfg.minhash_kwargs,
        )
        deduped = semi_join(deduped, survivors, on=id_col)
    if cfg.substring_k:
        # span-level pass AFTER doc-level dedup (doc dups are gone, so
        # only genuinely partial overlaps remain to rewrite); the text
        # changes, so the profile is recomputed before packing
        from .substr import substring_dedup

        cleaned = substring_dedup(
            deduped.select_columns([id_col, text_col]),
            k=cfg.substring_k, text_col=text_col, id_col=id_col,
        ).filter(expr="n_removed < n_words")

        def swap_text(t: pa.Table) -> pa.Table:
            return pa.table(
                {id_col: t["doc_id"], text_col: t["clean_text"]}
            )

        deduped = text_profile(
            cleaned.map_batches(
                swap_text, batch_format="pyarrow", zero_copy_batch=True
            ),
            text_col,
        )
        # span removal can drop a doc below the quality thresholds
        # (fewer tokens, lower alpha ratio) — re-apply the numeric
        # bounds to the re-profiled text so packing never sees a doc
        # the filter stage would have rejected (round-3 advice
        # finding); the language decision stays with the full document
        deduped = deduped.map_batches(
            lambda t: t.filter(quality_mask(t, cfg, check_lang=False)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    packed = concat_chunk_packing(
        deduped, budget=cfg.pack_budget, value_col="n_tokens",
        order_col=id_col,
    )
    if out_dir is None:
        return packed

    part = cfg.partition_chunks

    def add_partition(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pack_partition",
            pc.cast(
                pc.divide(t["pack_first_chunk"], part), pa.int64()
            ),
        )

    packed.map_batches(
        add_partition, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out_dir, partition_cols=["pack_partition"])
    return packed


def incremental_dedup(
    new_docs: rd.Dataset,
    index_dir: str,
    run_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Dedup a NEW batch against the persistent fingerprint index of
    every prior ingest, then register the fresh fingerprints.

    - within-batch: exact_dedup (hash-bucketed min-id survivor);
    - against history: Bloom-prefiltered anti-join on the md5
      fingerprint — the index side never broadcasts whole, only its
      ~1.25 bytes/key filter (functions/bloom.py), and only candidate
      collisions enter the exact verify;
    - the survivors' fingerprints land in ``index_dir/run=<run_id>/``
      (one hive partition per ingest, so a re-run of the same run_id
      overwrites its own partition instead of double-registering).
    """
    import glob
    import os

    from ..functions.join import anti_join
    from .dedup import exact_dedup
    from .text import fingerprints

    run_dir = f"{index_dir}/run={run_id}"
    if os.path.isdir(run_dir):  # idempotent re-run: drop own partition
        import shutil            # BEFORE building the lazy history read

        shutil.rmtree(run_dir)
    fresh = exact_dedup(new_docs, text_col=text_col, id_col=id_col)
    fresh = fingerprints(fresh, text_col)
    history = sorted(
        p
        for p in glob.glob(f"{index_dir}/run=*/*.parquet")
        if f"/run={run_id}/" not in p
    )
    if history:
        seen = rd.read_parquet(history).select_columns(["fingerprint"])
        fresh = anti_join(
            fresh, seen, on="fingerprint", prefilter="bloom"
        )
    fresh.select_columns(["fingerprint"]).write_parquet(run_dir)
    return fresh
