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


def _detect_hot_convs(
    ds: rd.Dataset, hot_threshold: int, batch_size: int
) -> pd.DataFrame:
    """Cheap pre-pass for :func:`sessionize` skew handling: per-conv
    (row count, min ts, max ts) via a per-batch Arrow combiner + tree
    merge, filtered to conversations holding more than
    ``hot_threshold`` rows.  The result is bounded by construction
    (at most total_rows / hot_threshold conversations qualify), so the
    driver-side collect is safe at any input scale."""
    import pyarrow as pa

    from .aggregate import merge_partials

    def cnt(batch: pa.Table) -> pa.Table:
        t = pa.table({"conv_id": batch["conv_id"], "ts": batch["ts"]})
        g = t.group_by(["conv_id"]).aggregate(
            [([], "count_all"), ("ts", "min"), ("ts", "max"),
             ("ts", "count")]
        )
        return g.rename_columns(["conv_id", "n", "tmin", "tmax", "nn"])

    partials = ds.map_batches(
        cnt, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    merged = merge_partials(
        partials, ["conv_id"],
        [("n", "sum"), ("tmin", "min"), ("tmax", "max"), ("nn", "sum")],
    )
    out = merged.filter(expr=f"n > {hot_threshold}").to_pandas()
    if out.empty:  # zero-row to_pandas may drop the schema entirely
        return pd.DataFrame(columns=["conv_id", "n", "tmin", "tmax"])
    # a conv with ANY null ts keeps the single-bucket path (the NaT
    # sort-last contract is bucket-local); shard = f(ts) needs real ts
    return out[out["n"] == out["nn"]].reset_index(drop=True)


def _sessionize_hot(
    ds: rd.Dataset,
    hot: pd.DataFrame,
    gap_us: int,
    batch_size: int,
    num_buckets: int,
    hot_shard_rows: int,
) -> rd.Dataset:
    """Two-phase sessionization for the oversized conversations in
    ``hot`` (cols: conv_id, n, tmin, tmax — all ts non-null).

    Phase 1: rows of hot convs are ts-range-sharded (shard = a pure
    function of ts, so equal timestamps never straddle shards), each
    (conv, shard) group is locally sessionized in parallel, and the
    labeled hot rows — bounded by the hot fraction of the input — are
    materialized once.  Phase 2: a tiny per-(conv, shard) summary
    (min/max ts, local boundary count) is combined on the driver into
    per-shard session offsets (a shard junction is a boundary iff the
    cross-shard ts gap exceeds ``gap_us``), and one streaming pass adds
    the offsets.  This is the ``stages/packing.py`` block-scan pattern
    applied to session boundaries."""
    import math

    import pyarrow as pa

    from .aggregate import merge_partials

    golden = np.uint64(0x9E3779B97F4A7C15)
    tmin_d, width_d, nshard_d = {}, {}, {}
    for cid, n, tmin, tmax in zip(
        hot["conv_id"], hot["n"], hot["tmin"], hot["tmax"]
    ):
        ns = max(1, math.ceil(int(n) / hot_shard_rows))
        t0 = int(np.datetime64(tmin, "us").astype(np.int64))
        t1 = int(np.datetime64(tmax, "us").astype(np.int64))
        tmin_d[cid] = t0
        width_d[cid] = max(1, -(-(t1 - t0 + 1) // ns))
        nshard_d[cid] = ns

    def hot_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["conv_id"].isin(tmin_d)]
        df = df[["conv_id", "turn_idx", "ts"]].reset_index(drop=True)
        if df.empty:
            out = df.copy()
            out["_shard"] = np.array([], dtype=np.int64)
            out["_bucket"] = np.array([], dtype=np.int64)
            return out
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        shard = np.zeros(len(df), dtype=np.int64)
        conv = df["conv_id"].to_numpy(dtype=object)
        for cid in tmin_d:  # few hot convs by construction
            m = conv == cid
            if m.any():
                s = (ts_us[m] - tmin_d[cid]) // width_d[cid]
                shard[m] = np.clip(s, 0, nshard_d[cid] - 1)
        out = df.copy()
        out["_shard"] = shard
        out["_bucket"] = (
            (hash64(conv) ^ (shard.view(np.uint64) * golden))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # same factorized lexsort as the single-bucket path, with the
        # group key widened to (conv, shard): local session boundaries
        # restart at every shard edge and are stitched in phase 2
        df = df.drop(columns=["_bucket"]).reset_index(drop=True)
        codes, _ = pd.factorize(df["conv_id"], sort=True)
        shard = df["_shard"].to_numpy()
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        order = np.lexsort(
            (df["turn_idx"].to_numpy(), ts_us, shard, codes)
        )
        df = df.iloc[order].reset_index(drop=True)
        ts_s = ts_us[order]
        grp_conv = codes[order]
        grp_shard = shard[order]
        new_grp = np.empty(len(df), dtype=bool)
        new_grp[0:1] = True
        new_grp[1:] = (grp_conv[1:] != grp_conv[:-1]) | (
            grp_shard[1:] != grp_shard[:-1]
        )
        gap = np.empty(len(df), dtype=bool)
        gap[0:1] = False
        gap[1:] = (ts_s[1:] - ts_s[:-1]) > gap_us
        boundary = (~new_grp) & gap
        cum = np.cumsum(boundary.astype(np.int64))
        start_cum = np.maximum.accumulate(np.where(new_grp, cum, 0))
        df["_local"] = cum - start_cum
        return df

    partials = ds.map_batches(
        hot_partial, batch_format="pandas", batch_size=batch_size
    )
    labeled = partials.groupby("_bucket").map_groups(
        reduce_bucket, batch_format="pandas"
    ).materialize()

    def summ(t: pa.Table) -> pa.Table:
        g = t.group_by(["conv_id", "_shard"]).aggregate(
            [("ts", "min"), ("ts", "max"), ("_local", "max")]
        )
        return g.rename_columns(
            ["conv_id", "_shard", "tmin", "tmax", "nb"]
        )

    summary = merge_partials(
        labeled.map_batches(
            summ, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        ),
        ["conv_id", "_shard"],
        [("tmin", "min"), ("tmax", "max"), ("nb", "max")],
    ).to_pandas()

    # per-conv prefix scan over the (tiny, ≤ n/hot_shard_rows-row)
    # shard summary: offset(s) = offset(prev) + boundaries(prev)
    # + [junction gap > gap]
    off_arrays: dict[object, np.ndarray] = {
        cid: np.zeros(ns, dtype=np.int64) for cid, ns in nshard_d.items()
    }
    for cid, g in summary.groupby("conv_id", sort=False):
        g = g.sort_values("_shard")
        shards = g["_shard"].to_numpy()
        tmins = g["tmin"].to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        tmaxs = g["tmax"].to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        nbs = g["nb"].to_numpy().astype(np.int64)
        arr = off_arrays[cid]
        off = 0
        for i in range(len(g)):
            if i > 0:
                off += nbs[i - 1] + int(
                    (tmins[i] - tmaxs[i - 1]) > gap_us
                )
            arr[shards[i]] = off

    def add_offsets(df: pd.DataFrame) -> pd.DataFrame:
        off = np.zeros(len(df), dtype=np.int64)
        conv = df["conv_id"].to_numpy(dtype=object)
        shard = df["_shard"].to_numpy()
        for cid, arr in off_arrays.items():
            m = conv == cid
            if m.any():
                off[m] = arr[shard[m]]
        out = df[["conv_id", "turn_idx", "ts"]].copy()
        out["session_idx"] = df["_local"].to_numpy() + off
        return out

    return labeled.map_batches(
        add_offsets, batch_format="pandas", batch_size=batch_size
    )


def sessionize(
    ds: rd.Dataset,
    gap_seconds: int = 1800,
    batch_size: int = 131072,
    num_buckets: int = 64,
    hot_threshold: int | None = 262144,
    hot_shard_rows: int = 65536,
) -> rd.Dataset:
    """Split conversations into sessions at inactivity gaps > gap.

    The streaming-window translation (SURVEY.md §2.10): treat each
    conversation as an ordered log, sort within its hash bucket, and
    compute session boundaries vectorized (a gap opens a new session).
    Appends ``session_idx`` (0-based per conversation).  Ordering
    contract: (conv_id, ts, turn_idx) is the total order, matching the
    SQL window specification.

    **Skew (round-5 fix)**: hash-bucketing whole conversations puts a
    hot conversation (one conv holding ~10% of all rows) on one worker
    — the round-4 driver artifact measured a 1.48× skew straggler.
    Session boundaries only need the PREVIOUS ts within a conversation,
    so conversations larger than ``hot_threshold`` rows (detected by a
    cheap combiner pre-pass) are ts-range-partitioned into
    ``ceil(n / hot_shard_rows)`` shards that scan in parallel, then
    stitched with the two-phase prefix pattern of
    ``stages/packing.py``: each shard reports (first_ts, last_ts,
    n_boundaries), the driver computes per-shard session offsets from
    that tiny table (a junction is a boundary iff the cross-shard ts
    gap exceeds ``gap``), and one streaming pass adds the offsets.
    Shard assignment is a pure function of ts, so equal timestamps can
    never straddle shards and the stitched total order equals the
    single-bucket (ts, turn_idx) order.  ``hot_threshold=None``
    disables detection (single-phase path, no pre-pass).

    Scale notes: the pre-pass streams one combiner over the input; the
    hot branch re-executes the input once more (streaming filters, no
    full-dataset materialization) and materializes only the HOT rows
    (bounded by the hot fraction) for the summary + offset pass.
    """
    gap_us = gap_seconds * 1_000_000

    hot = pd.DataFrame()
    if hot_threshold is not None:
        hot = _detect_hot_convs(ds, hot_threshold, batch_size)

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

    if hot.empty:
        return _bucketed(
            ds, partial, reduce_bucket, batch_size, num_buckets
        )

    hot_ids = set(hot["conv_id"])

    def cold_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[
            ~df["conv_id"].isin(hot_ids), ["conv_id", "turn_idx", "ts"]
        ]

    cold = _bucketed(
        ds, cold_partial, reduce_bucket, batch_size, num_buckets
    )
    hot_out = _sessionize_hot(
        ds, hot, gap_us, batch_size, num_buckets, hot_shard_rows
    )
    return cold.union(hot_out)


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
