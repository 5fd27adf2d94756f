"""Aggregate stage: signaltometrics/lsminterval-style interval aggregation.

Semantics reproduced from the reference, re-expressed for Ray Data:

- **Event-time tumbling windows.** The reference aggregates by
  *processing* time with a harvest timer
  (processor/lsmintervalprocessor/processor.go:181-208); a batch engine
  derives ``window_start = floor(ts, interval)`` from the data so runs
  are deterministic — a deliberate, documented deviation (SURVEY.md
  §2.10).  Multiple intervals must be multiples of the smallest
  (config validation mirrors lsminterval config.go:110-117).
- **Delta merges are commutative adds** (internal/data/add.go:58-68) →
  safe under Ray's unordered task completion; implemented as TWO-PHASE
  aggregation: per-batch partials via Arrow ``Table.group_by`` inside
  ``map_batches`` (combiner), then a small ``groupby().aggregate()``
  over partials — the all-to-all shuffle only moves pre-aggregated
  rows, not the raw input (SURVEY.md §4.3).
- **Cumulative = latest-timestamp-wins** (internal/merger/
  datapoints.go:65-79): per-group argmax by (ts, turn_idx), same
  two-phase shape with a take-latest reducer.
- **Cardinality limits + overflow**: first-K-distinct keys kept in a
  deterministic first-seen order, the rest folded into an ``_other``
  bucket with a dropped-unique count (merger/value.go:311-362,
  limits/tracker.go:40-101; APM ``_other`` attrs
  elasticapmconnector/config.go:193-226).  Exact at test scale; the
  scale path uses the mergeable HLL in functions/sketches.py.
- **Per-interval decoration** after aggregation (the OTTL statements
  ``metricset.interval`` / ``data_stream.dataset``,
  elasticapmconnector/config.go:171-183).
- **Skew**: optional key salting — partial-aggregate on
  ``(key, salt)`` then re-aggregate on ``key`` — for hot groups
  (SURVEY.md §4.2).  With the batch-combiner phase, partials are
  already one row per (batch, group), so salting matters only for the
  final shuffle of very hot group keys.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

INTERVALS_US: Dict[str, int] = {
    "1m": 60_000_000,
    "10m": 600_000_000,
    "1h": 3_600_000_000,
    "24h": 86_400_000_000,
}


def validate_intervals(intervals: Sequence[str]) -> None:
    """Intervals must be known and multiples of the smallest
    (lsminterval config.go:110-117)."""
    if not intervals:
        raise ValueError("at least one interval required")
    us = []
    for i in intervals:
        if i not in INTERVALS_US:
            raise ValueError(f"unknown interval {i!r}")
        us.append(INTERVALS_US[i])
    smallest = min(us)
    for v in us:
        if v % smallest:
            raise ValueError(
                f"interval {v}us is not a multiple of smallest {smallest}us"
            )


def window_start(ts: pa.ChunkedArray | pa.Array, interval_us: int) -> pa.Array:
    """floor(ts, interval) as timestamp[us] — pure int64 arithmetic."""
    us = pc.cast(ts, pa.int64())
    floored = pc.multiply(pc.divide(us, interval_us), interval_us)
    return pc.cast(floored, pa.timestamp("us"))


def window_start_sql(interval: str) -> str:
    us = INTERVALS_US[interval]
    return f"make_timestamp((epoch_us(ts) // {us}) * {us})"


# ---------------------------------------------------------------------------
# service_summary: windowed delta counts/sums per (window, role, tool)
# (the service_summary + transaction-metrics specs,
#  connector/elasticapmconnector/config.go:354-414)
# ---------------------------------------------------------------------------


def _partial_service_summary(interval_us: int):
    def partial(batch: pa.Table) -> pa.Table:
        w = window_start(batch["ts"], interval_us)
        fail = pc.cast(
            pc.equal(batch["event_outcome"], "failure"), pa.int64()
        )
        t = pa.table(
            {
                "window_start": w,
                "role": batch["role"],
                "tool": batch["tool"],
                "fail": fail,
                "latency_ms": batch["latency_ms"],
            }
        )
        g = t.group_by(["window_start", "role", "tool"]).aggregate(
            [
                ([], "count_all"),
                ("fail", "sum"),
                ("latency_ms", "sum"),
                ("latency_ms", "min"),
                ("latency_ms", "max"),
            ]
        )
        return g.rename_columns(
            [
                "window_start",
                "role",
                "tool",
                "turn_count",
                "failure_count",
                "latency_sum",
                "latency_min",
                "latency_max",
            ]
        )

    return partial


def _decorate(interval: str):
    def deco(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column(
            "interval", pa.array([interval] * n, pa.string())
        )
        # OTTL-style decoration (config.go:171-183):
        #   data_stream.dataset = Concat([metricset.name, interval], ".")
        return batch.append_column(
            "dataset",
            pa.array([f"service_summary.{interval}"] * n, pa.string()),
        )

    return deco


def service_summary(
    ds: rd.Dataset,
    intervals: Sequence[str] = ("1h", "24h"),
    batch_size: int = 131072,
) -> rd.Dataset:
    """Multi-interval windowed aggregate over the enriched dataset.

    Returns one row per (interval, window_start, role, tool).
    """
    validate_intervals(intervals)
    outs: List[rd.Dataset] = []
    for interval in intervals:
        partial = ds.map_batches(
            _partial_service_summary(INTERVALS_US[interval]),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
        final = partial.groupby(["window_start", "role", "tool"]).aggregate(
            Sum("turn_count", alias_name="turn_count"),
            Sum("failure_count", alias_name="failure_count"),
            Sum("latency_sum", alias_name="latency_sum"),
            Min("latency_min", alias_name="latency_min"),
            Max("latency_max", alias_name="latency_max"),
        )
        outs.append(
            final.map_batches(
                _decorate(interval), batch_format="pyarrow"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def service_summary_sql(intervals: Sequence[str] = ("1h", "24h")) -> str:
    parts = []
    for interval in intervals:
        w = window_start_sql(interval)
        parts.append(
            f"""
SELECT {w} AS window_start, role, tool,
       COUNT(*) AS turn_count,
       CAST(SUM(CASE WHEN event_outcome = 'failure' THEN 1 ELSE 0 END)
            AS BIGINT) AS failure_count,
       CAST(SUM(latency_ms) AS BIGINT) AS latency_sum,
       MIN(latency_ms) AS latency_min,
       MAX(latency_ms) AS latency_max,
       '{interval}' AS interval,
       'service_summary.{interval}' AS dataset
FROM enriched GROUP BY 1, 2, 3"""
        )
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Cumulative latest-timestamp-wins (merger/datapoints.go:65-79): per
# conversation, the newest turn replaces older ones; out-of-order input
# cannot win because the reducer is an argmax, hence order-insensitive.
# ---------------------------------------------------------------------------

_LATEST_COLS = ["conv_id", "turn_idx", "ts", "status", "event_outcome"]


def _take_latest(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    return df.drop_duplicates("conv_id", keep="last")


def latest_state(ds: rd.Dataset, batch_size: int = 131072) -> rd.Dataset:
    """Per-conversation latest turn (two-phase argmax by (ts, turn_idx))."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _take_latest(df[_LATEST_COLS])

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )
    final = partials.groupby("conv_id").map_groups(
        _take_latest, batch_format="pandas"
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["conv_id", "last_turn_idx", "last_ts", "last_status", "last_outcome"]
        )

    return final.map_batches(rename, batch_format="pyarrow")


LATEST_STATE_SQL = """
SELECT conv_id, turn_idx AS last_turn_idx, ts AS last_ts,
       status AS last_status, event_outcome AS last_outcome
FROM (
  SELECT conv_id, turn_idx, ts, status, event_outcome,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY ts DESC, turn_idx DESC) AS rn
  FROM enriched
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Cardinality-capped aggregate with _other overflow
# ---------------------------------------------------------------------------


def capped_tool_summary(
    ds: rd.Dataset, limit: int = 4, batch_size: int = 131072
) -> pd.DataFrame:
    """Per-role turn counts by tool with a cardinality cap.

    Keeps the first ``limit`` distinct tools per role in deterministic
    first-seen order (min first_ts, then tool name — the batch-mode
    replacement for the reference's arrival-order tracker,
    limits/tracker.go:68-84, SURVEY.md §7.4); the rest fold into an
    ``_other`` row decorated with the count of dropped distinct tools
    (merger/value.go:311-362; ``_other`` naming config.go:193-226).

    The (role, tool) key space is structurally tiny so the fold runs on
    the driver over the aggregated table; for large key spaces the
    dropped-unique count comes from the mergeable HLL
    (functions/sketches.py) instead of an exact distinct.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"role": batch["role"], "tool": batch["tool"], "ts": batch["ts"]}
        )
        g = t.group_by(["role", "tool"]).aggregate(
            [([], "count_all"), ("ts", "min")]
        )
        return g.rename_columns(["role", "tool", "n", "first_ts"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    agg = (
        partials.groupby(["role", "tool"])
        .aggregate(
            Sum("n", alias_name="n"), Min("first_ts", alias_name="first_ts")
        )
        .to_pandas()
    )
    agg = agg.sort_values(["role", "first_ts", "tool"], kind="mergesort")
    agg["rk"] = agg.groupby("role").cumcount() + 1
    agg["tool_out"] = agg["tool"].where(agg["rk"] <= limit, "_other")
    out = (
        agg.groupby(["role", "tool_out"], as_index=False)
        .agg(
            turn_count=("n", "sum"),
            overflow_tools=("rk", lambda r: int((r > limit).sum())),
        )
        .rename(columns={"tool_out": "tool"})
    )
    out["turn_count"] = out["turn_count"].astype("int64")
    out["overflow_tools"] = out["overflow_tools"].astype("int64")
    return out.sort_values(["role", "tool"]).reset_index(drop=True)


def capped_tool_summary_sql(limit: int = 4) -> str:
    # nested subqueries (not CTEs) so this composes after the shared
    # WITH-prefix the oracle queries are built from
    return f"""
SELECT role,
       CASE WHEN rk <= {limit} THEN tool ELSE '_other' END AS tool,
       CAST(SUM(n) AS BIGINT) AS turn_count,
       CAST(COUNT(DISTINCT CASE WHEN rk > {limit} THEN tool END) AS BIGINT)
         AS overflow_tools
FROM (
  SELECT *, row_number() OVER (PARTITION BY role
                               ORDER BY first_ts, tool) AS rk
  FROM (
    SELECT role, tool, min(ts) AS first_ts, count(*) AS n
    FROM enriched GROUP BY role, tool
  ) firsts
) ranked GROUP BY 1, 2
"""
