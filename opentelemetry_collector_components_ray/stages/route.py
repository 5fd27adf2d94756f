"""Route stage: first-match-wins fan-out to named sinks.

Ray-Data analogue of the dynamic routing connector: an ordered rule
list is evaluated first-match-wins (reference
connector/dynamicroutingconnector/router.go:334-356), rows matching no
rule go to the default sink (router.go:299-306), and routing NEVER
mutates the payload (logs.go:69-71 — MutatesData false): we only append
a ``sink`` column.

The reference routes whole batches on out-of-band client metadata; a
batch engine has no side channel, so the routing key is ordinary row
data (SURVEY.md §1.2) and the split is a vectorized predicate cascade
inside one ``map_batches`` — one pass, no shuffle.  The physical
fan-out is one filtered ``write_parquet`` per sink; sinks partition the
input exactly (routed-row equality invariant).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

Predicate = Callable[[pa.Table], pa.ChunkedArray]


@dataclass(frozen=True)
class RouteRule:
    sink: str
    predicate: Predicate
    sql: str  # the same predicate in DuckDB SQL (oracle parity)


def _p_failure(t: pa.Table):
    return pc.equal(t["event_outcome"], "failure")


def _p_tool(t: pa.Table):
    return pc.equal(t["role"], "tool")


def _p_http(t: pa.Table):
    return pc.is_valid(t["method"])


DEFAULT_RULES: Tuple[RouteRule, ...] = (
    RouteRule("errors", _p_failure, "event_outcome = 'failure'"),
    RouteRule("tools", _p_tool, "role = 'tool'"),
    RouteRule("http", _p_http, "method IS NOT NULL"),
)
DEFAULT_SINK = "general"


@dataclass(frozen=True)
class RouterConfig:
    """Validated routing config (mirrors the reference's config rules:
    README.md:128-134 — ordered rules, explicit default)."""

    rules: Tuple[RouteRule, ...] = DEFAULT_RULES
    default_sink: str = DEFAULT_SINK

    def __post_init__(self):
        names = [r.sink for r in self.rules] + [self.default_sink]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate sink names: {names}")
        if not self.default_sink:
            raise ValueError("default sink required")

    @property
    def sinks(self) -> Tuple[str, ...]:
        return tuple(r.sink for r in self.rules) + (self.default_sink,)

    def sql_case(self) -> str:
        parts = ["CASE"]
        for r in self.rules:
            parts.append(f"WHEN {r.sql} THEN '{r.sink}'")
        parts.append(f"ELSE '{self.default_sink}' END")
        return " ".join(parts)


def make_route_batch(config: RouterConfig):
    def route_batch(batch: pa.Table) -> pa.Table:
        # build from the last rule backwards so earlier rules win
        sink = pa.nulls(batch.num_rows, pa.string())
        sink = pc.fill_null(sink, config.default_sink)
        for rule in reversed(config.rules):
            mask = pc.fill_null(rule.predicate(batch), False)
            sink = pc.if_else(mask, pa.scalar(rule.sink), sink)
        return batch.append_column("sink", sink)

    return route_batch


def route_stage(
    ds: rd.Dataset,
    config: RouterConfig = RouterConfig(),
    batch_size: int = 65536,
) -> rd.Dataset:
    return ds.map_batches(
        make_route_batch(config),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def write_fanout(
    ds: rd.Dataset,
    out_dir: str,
    config: RouterConfig = RouterConfig(),
    columns: Sequence[str] | None = None,
    num_output_blocks: int | None = None,
    **write_kwargs,
) -> Dict[str, str]:
    """One parquet directory per sink (SURVEY.md §2.2).

    SINGLE-PASS fan-out: one hive-partitioned ``write_parquet`` on the
    ``sink`` column — every routed dataset batch is computed exactly
    once and split at write time (``out/sink=<name>/``).  A per-sink
    filtered write would re-execute the whole upstream pipeline once
    per sink, which is wrong at scale.

    ``num_output_blocks`` coalesces before the write: each write task
    emits one file per sink it sees, so N input blocks × S sinks files
    — with many small input blocks that produces a swarm of tiny files
    that slows every later read.  Pick it so output files land near
    the ~100 MB+ range at your data size — but note ``repartition``
    moves the whole dataset through the object store (measured ~27 s on
    a 6M-row × 25-col dataset); prefer sizing the INPUT blocks (file
    count / target_max_block_size) and leave this unset.
    """
    if columns:
        cols = list(columns)
        if "sink" not in cols:
            cols.append("sink")
        ds = ds.select_columns(cols)
    if num_output_blocks:
        ds = ds.repartition(num_output_blocks)
    base = out_dir.rstrip("/")
    ds.write_parquet(base, partition_cols=["sink"], **write_kwargs)
    return {sink: f"{base}/sink={sink}" for sink in config.sinks}


ROUTED_SQL = (
    "SELECT enriched.*, "
    + RouterConfig().sql_case()
    + " AS sink FROM enriched"
)


# ---------------------------------------------------------------------------
# Cardinality-based routing — the dynamic routing connector's actual
# decision rule: estimate the cardinality of measure_by combinations per
# partition key, route to the FIRST pipeline whose max_cardinality ≥
# estimate, thresholds ascending with a final catch-all
# (router.go:287-297 HLL recording, 334-356 first-threshold selection,
# config rules README.md:128-134).  Batch translation: the TTL decision
# cache disappears (decisions are a pure function of the bounded input,
# SURVEY.md §2.10) and the per-key estimate is an exact two-phase
# distinct at test scale / a mergeable HLL at large key counts.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CardinalityRouterConfig:
    """Ascending (threshold, sink) pairs; last threshold must be the
    catch-all (None = .inf, README.md:128-134)."""

    key: str = "conv_id"
    measure_by: Tuple[str, ...] = ("role", "tool")
    rules: Tuple[Tuple[int | None, str], ...] = (
        (2, "low_card"),
        (6, "mid_card"),
        (None, "high_card"),
    )

    def __post_init__(self):
        ts = [t for t, _ in self.rules]
        if ts[-1] is not None:
            raise ValueError("last threshold must be the catch-all (None)")
        finite = [t for t in ts if t is not None]
        if finite != sorted(finite) or len(set(finite)) != len(finite):
            raise ValueError(f"thresholds must be ascending/unique: {ts}")
        sinks = [s for _, s in self.rules]
        if len(set(sinks)) != len(sinks):
            raise ValueError(f"duplicate sinks: {sinks}")

    def sink_for(self, card: int) -> str:
        for t, sink in self.rules:
            if t is None or card <= t:
                return sink
        raise AssertionError("unreachable (catch-all)")

    def sql_case(self, card_expr: str) -> str:
        parts = ["CASE"]
        for t, sink in self.rules:
            if t is None:
                parts.append(f"ELSE '{sink}' END")
            else:
                parts.append(f"WHEN {card_expr} <= {t} THEN '{sink}'")
        return " ".join(parts)


def cardinality_route(
    ds: rd.Dataset,
    config: CardinalityRouterConfig = CardinalityRouterConfig(),
    batch_size: int = 131072,
    distributed: bool | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-key routing decisions: (key, combo_card, sink).

    Two-phase exact distinct: per-batch dedup of (key, measure_by…)
    combos (the combiner — the shuffle only moves distinct combos),
    then by default a hash-partitioned finish: combos bucket by
    ``hash64(key) % num_buckets`` (all combos of a key share its
    bucket, so the per-key distinct count is exact) and each bucket
    dedups + counts independently — no single worker holds the global
    combo set.  ``distributed=False`` coalesces to one worker (lower
    fixed cost at known-small key spaces).  For combo sets too large
    even per bucket, the estimate swaps to the mergeable HLL
    (functions/sketches.py) — the reference's own scale rule
    (router.go:287-297)."""
    import numpy as np
    import pandas as pd

    from ..functions.sketches import hash64

    from .aggregate import resolve_distributed

    distributed = resolve_distributed(ds, distributed)
    cols = [config.key, *config.measure_by]

    def dedup_batch(df: "pd.DataFrame") -> "pd.DataFrame":
        return df[cols].drop_duplicates()

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        combos = df.drop_duplicates()
        card = (
            combos.groupby(config.key, as_index=False)
            .size()
            .rename(columns={"size": "combo_card"})
        )
        card["combo_card"] = card["combo_card"].astype("int64")
        card["sink"] = card["combo_card"].map(config.sink_for)
        return card

    partials = ds.map_batches(
        dedup_batch, batch_format="pandas", batch_size=batch_size
    )
    if not distributed:
        return partials.repartition(1).map_batches(
            finish, batch_format="pandas", batch_size=None
        )

    from ..functions.blocks import to_clean_arrow

    def bucketize(df: "pd.DataFrame"):
        df = df.copy()
        df["_bucket"] = (
            hash64(df[config.key].to_numpy(dtype=object))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(df)

    def finish_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        return finish(df.drop(columns=["_bucket"]))

    return (
        partials.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(finish_bucket, batch_format="pandas")
    )


def cardinality_route_sql(
    config: CardinalityRouterConfig = CardinalityRouterConfig(),
) -> str:
    combo = ", ".join(config.measure_by)
    case = config.sql_case("combo_card")
    return f"""
SELECT {config.key}, combo_card, {case} AS sink FROM (
  SELECT {config.key}, CAST(COUNT(*) AS BIGINT) AS combo_card
  FROM (SELECT DISTINCT {config.key}, {combo} FROM enriched)
  GROUP BY {config.key}
)
"""


def cardinality_route_hll(
    ds: rd.Dataset,
    config: CardinalityRouterConfig = CardinalityRouterConfig(),
    batch_size: int = 131072,
    num_buckets: int = 64,
    precision: int = 14,
) -> rd.Dataset:
    """Cardinality routing with MERGEABLE HLL sketches — the scale path
    the reference itself uses for its estimates (router.go:287-297
    records combos into a precision-14 HLL; thresholds compare against
    the estimate, dynamicroutingconnector/README.md:272-278).

    Use when even one key's distinct-combo set is too large to dedup
    exactly per bucket: each batch folds its combos into one sketch
    per key (16 KiB, fixed), sketches merge per key in a key-hash
    bucketed reduce, and the threshold compares the ±0.8% estimate.
    Decisions near a threshold can differ from the exact path —
    exactly as they can in the reference; rows-only checked, accuracy
    asserted in tests.  Output: (key, combo_card, sink) with
    combo_card = HLL estimate (int64).
    """
    import numpy as np
    import pandas as pd

    from ..functions.blocks import to_clean_arrow
    from ..functions.sketches import HyperLogLog, hash64

    cols = [config.key, *config.measure_by]

    def partial(df: "pd.DataFrame"):
        # one sketch per key per batch, combo hashed as joined string
        combo = df[cols[0]].astype(str)
        for c in cols[1:]:
            combo = combo + "\x1f" + df[c].astype(str)
        h = hash64(combo.to_numpy(dtype=object))
        keys = df[config.key].to_numpy(dtype=object)
        out_k, out_s = [], []
        order = np.argsort(keys, kind="stable")
        sk, sh = keys[order], h[order]
        start = 0
        for i in range(1, len(sk) + 1):
            if i == len(sk) or sk[i] != sk[start]:
                hll = HyperLogLog(precision).add_hashes(sh[start:i])
                out_k.append(sk[start])
                out_s.append(hll.to_bytes())
                start = i
        g = pd.DataFrame({config.key: out_k, "_sketch": out_s})
        g["_bucket"] = (
            hash64(g[config.key].to_numpy(dtype=object))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(g)

    def reduce_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for key_val, grp in df.groupby(config.key, sort=True):
            hll = HyperLogLog(precision)
            for b in grp["_sketch"]:
                hll.merge(HyperLogLog.from_bytes(bytes(b), precision))
            est = int(round(hll.estimate()))
            rows.append((key_val, est, config.sink_for(est)))
        return pd.DataFrame(
            rows, columns=[config.key, "combo_card", "sink"]
        )

    return (
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=batch_size)
        .groupby("_bucket")
        .map_groups(
            lambda df: reduce_bucket(df.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
