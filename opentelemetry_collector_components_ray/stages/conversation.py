"""Conversation-level (sessionization) operators.

Transcript-native analogues of the reference's per-stream state: the
stable ``(conv_id, turn_idx)`` ordering invariant (north rule) is
exercised by order-DEPENDENT aggregates — a head-concatenation and
first/last values — not just order-insensitive counts.

Pattern: per-batch partial (vectorized pandas, one row per conv per
batch, keeping only what the reducer needs), hash-bucket the convs,
reduce each bucket with one vectorized call (same shape as
aggregate.latest_state — never one Python call per conversation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.sketches import HyperLogLog, hash64


def conv_stats(
    ds: rd.Dataset, batch_size: int = 131072, num_buckets: int = 64
) -> rd.Dataset:
    """Per-conversation stats: n_turns, first/last ts, span_seconds,
    n_tool_turns.  Commutative merges (sum/min/max) ⇒ order-safe."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", sort=False)
        out = pd.DataFrame(
            {
                "n_turns": g.size(),
                "first_ts": g["ts"].min(),
                "last_ts": g["ts"].max(),
                "n_tool_turns": (df["role"] == "tool")
                .groupby(df["conv_id"])
                .sum(),
            }
        ).reset_index()
        return out

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", sort=True)
        out = pd.DataFrame(
            {
                "n_turns": g["n_turns"].sum().astype("int64"),
                "first_ts": g["first_ts"].min(),
                "last_ts": g["last_ts"].max(),
                "n_tool_turns": g["n_tool_turns"].sum().astype("int64"),
            }
        ).reset_index()
        # SQL date_diff('second', a, b) counts second-BOUNDARY
        # crossings: floor(epoch b) - floor(epoch a), not truncated
        # elapsed time — integer µs arithmetic, no float seconds
        last_us = out["last_ts"].to_numpy().astype(
            "datetime64[us]"
        ).astype(np.int64)
        first_us = out["first_ts"].to_numpy().astype(
            "datetime64[us]"
        ).astype(np.int64)
        out["span_seconds"] = (last_us // 1_000_000) - (
            first_us // 1_000_000
        )
        return out

    return _bucketed(ds, partial, reduce_bucket, batch_size, num_buckets)


CONV_STATS_SQL = """
SELECT conv_id,
       COUNT(*) AS n_turns,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_turns,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_seconds
FROM transcripts GROUP BY conv_id
"""


def conv_head(
    ds: rd.Dataset,
    k: int = 3,
    sep: str = " | ",
    batch_size: int = 131072,
    num_buckets: int = 64,
) -> rd.Dataset:
    """First-k-turn concatenation per conversation, in turn_idx order —
    an order-DEPENDENT aggregate that fails loudly if the engine ever
    breaks the (conv_id, turn_idx) ordering contract."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df[df["turn_idx"] < k][["conv_id", "turn_idx", "text"]]
        return h

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        df = df.drop_duplicates(["conv_id", "turn_idx"])
        out = (
            df.groupby("conv_id", sort=True)["text"]
            .agg(lambda s: sep.join(s))
            .reset_index()
            .rename(columns={"text": "head_text"})
        )
        return out

    return _bucketed(ds, partial, reduce_bucket, batch_size, num_buckets)


def conv_head_sql(k: int = 3, sep: str = " | ") -> str:
    return f"""
SELECT conv_id,
       string_agg(text, '{sep}' ORDER BY turn_idx) AS head_text
FROM transcripts WHERE turn_idx < {k} GROUP BY conv_id
"""


def sessionize(
    ds: rd.Dataset,
    gap_seconds: int = 1800,
    batch_size: int = 131072,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Split conversations into sessions at inactivity gaps > gap.

    The streaming-window translation (SURVEY.md §2.10): treat each
    conversation as an ordered log, sort within its hash bucket, and
    compute session boundaries vectorized (a gap opens a new session).
    Appends ``session_idx`` (0-based per conversation).  Ordering
    contract: (conv_id, ts, turn_idx) is the total order, matching the
    SQL window specification.
    """
    gap_us = gap_seconds * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["conv_id", "turn_idx", "ts"]]

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # numpy lexsort over factorized conv codes instead of a pandas
        # string sort: the bucket holding a hot conversation (skew
        # stress) is dominated by this sort, and integer lexsort keeps
        # the skewed bucket within ~1.2x of its fair-share cost.
        # factorize codes follow first-appearance order, so codes are
        # sorted as a proxy for conv_id only alongside an explicit
        # conv grouping — session_idx never compares ACROSS convs, so
        # any total order that keeps each conv contiguous and (ts,
        # turn_idx)-sorted within is correct.
        codes, _ = pd.factorize(df["conv_id"], sort=True)
        ts_np = df["ts"].to_numpy().astype("datetime64[us]")
        ts_all = ts_np.astype(np.int64)
        # pandas sort_values puts NaT LAST (the gate-validated order);
        # int64-cast NaT is i64 min, so the SORT key maps it to +max
        # while the gap computation keeps the original cast value
        ts_sort = np.where(
            np.isnat(ts_np), np.iinfo(np.int64).max, ts_all
        )
        order = np.lexsort(
            (df["turn_idx"].to_numpy(), ts_sort, codes)
        )
        df = df.iloc[order].reset_index(drop=True)
        ts_us = ts_all[order]
        conv = codes[order]
        new_conv = np.empty(len(df), dtype=bool)
        new_conv[0:1] = True
        new_conv[1:] = conv[1:] != conv[:-1]
        gap = np.empty(len(df), dtype=bool)
        gap[0:1] = False
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        boundary = (~new_conv) & gap
        # session_idx = cumulative boundaries within conv
        cum = np.cumsum(boundary.astype(np.int64))
        conv_start_cum = np.where(new_conv, cum, 0)
        conv_start_cum = np.maximum.accumulate(conv_start_cum)
        df["session_idx"] = cum - conv_start_cum
        return df

    return _bucketed(ds, partial, reduce_bucket, batch_size, num_buckets)


SESSIONIZE_SQL = """
SELECT conv_id, turn_idx, ts,
       CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                      AND epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM (
  SELECT conv_id, turn_idx, ts,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
           AS prev_ts
  FROM transcripts
)
"""


def sessionize_sql(gap_seconds: int = 1800) -> str:
    return SESSIONIZE_SQL.replace("{gap_us}", str(gap_seconds * 1_000_000))


def approx_distinct_convs(
    ds: rd.Dataset, batch_size: int = 131072
) -> pd.DataFrame:
    """HLL-estimated distinct conversations per role — the mergeable
    precision-14 sketch from the reference's overflow tracker
    (limits/tracker.go:76): one serialized sketch per (batch, role),
    OR-merged in a tiny final stage.  ~1% error; exact twin returned
    alongside for the accuracy check."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for role, g in df.groupby("role", sort=False):
            h = HyperLogLog()
            h.add(g["conv_id"].to_numpy(dtype=object))
            rows.append((role, h.to_bytes()))
        return pd.DataFrame(rows, columns=["role", "sketch"])

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for role, g in df.groupby("role", sort=True):
            h = HyperLogLog()
            for b in g["sketch"]:
                h.merge(HyperLogLog.from_bytes(b))
            rows.append((role, int(round(h.estimate()))))
        return pd.DataFrame(rows, columns=["role", "approx_convs"])

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )
    return (
        partials.repartition(1)
        .map_batches(reduce_all, batch_format="pandas", batch_size=None)
        .to_pandas()
    )


def _bucketed(ds, partial, reduce_bucket, batch_size, num_buckets):
    def partial_with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = partial(df)
        out = out.copy()
        out["_bucket"] = (
            hash64(out["conv_id"].to_numpy(dtype=object))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def reduce_drop(df: pd.DataFrame) -> pd.DataFrame:
        return reduce_bucket(df.drop(columns=["_bucket"]))

    partials = ds.map_batches(
        partial_with_bucket, batch_format="pandas", batch_size=batch_size
    )
    return partials.groupby("_bucket").map_groups(
        reduce_drop, batch_format="pandas"
    )
