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
import ray
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
    ds: rd.Dataset, hot_threshold: int, batch_size: int, gap_us: int
) -> dict:
    """Pre-pass for :func:`sessionize` skew handling.

    The bin insight: with bins of exactly ``gap_us``, two timestamps
    inside one bin can never differ by more than the gap, so every
    session boundary falls BETWEEN bins — consecutive nonempty bins
    ``b < b'`` of a conversation open a new session iff
    ``min_ts[b'] - max_ts[b] > gap_us``.  Per-bin (count, min, max) —
    cheap mergeable combiner state — therefore reconstructs the EXACT
    session segmentation of a conversation without ever co-locating
    its rows.  The hot path needs no shuffle at all: sessionize
    broadcasts each hot conv's session-start array and labels rows
    with one vectorized ``searchsorted``.

    Cost discipline (round-5 measurement): the first cut of this
    pre-pass ran per-(conv, bin) stats over the FULL-COLUMN dataset
    for EVERY conv and merged the result distributed — 8.8 s of a
    15.5 s query at 12M turns, tripling the unskewed base case; a
    second cut split detection (conv_id-only scan) from exact bin
    stats (second scan over candidates) and still paid two full
    input reads on the skewed side (measured skew ratio 1.26 vs the
    ≤1.2 bar).  Now ONE fused scan over the ``(conv_id, ts)``
    projection emits three tiers per batch:

    1. **Tier-1 lower-bound counts** (cutoff ``batch_len // 1024``):
       a pigeonhole guarantee, not a sample — a conv above
       ``max(hot_threshold, total_rows / 1024)`` rows MUST exceed
       that cutoff in at least one batch, and truncation only shrinks
       the summed lower bound, which the ``threshold // 2``
       comparison absorbs.  ≤1024 rows per batch regardless of conv
       cardinality.
    2. **Speculative exact bin stats + a coverage marker** for
       batch-local heavies (cutoff ``batch_len // 64``): group_by
       (conv, bin) over just those convs' rows.  The unskewed base
       case (many small convs, none near 1.6% of a batch) emits
       nothing here and pays only the tier-1 group_by.
    3. **One sentinel row per nonempty batch**, so the driver knows
       the total batch count.

    Driver-side soundness: a candidate whose coverage markers equal
    the total batch count was captured as a local heavy in EVERY
    batch, so its merged bin stats are provably complete — no second
    scan.  Any candidate with partial coverage (possible under
    adversarial row placement) gets the exact second pass over its
    ids alone; a conv a tier could miss entirely just keeps the
    (correct) bucketed path.

    Returns ``{conv_id: np.ndarray of session-start ts (int64 us,
    ascending)}`` for conversations holding more than
    ``hot_threshold`` rows and no null ts (a conv with ANY null ts
    keeps the single-bucket path — the NaT sort-last contract is
    bucket-local, and ``bin = f(ts)`` needs real ts).  Timestamps are
    assumed non-negative (epoch us): integer division == floor.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    tier1_divisor = 1024
    tier2_divisor = 64
    K_BIN, K_COUNT, K_COVER, K_SENTINEL = 0, 1, 2, 3

    def _bin_table(sub: pa.Table) -> pa.Table:
        """Exact per-(conv, bin) stats over the given rows."""
        ts_us = pc.cast(
            pc.cast(sub["ts"], pa.timestamp("us"), safe=False), pa.int64()
        )
        t = pa.table(
            {
                "conv_id": sub["conv_id"],
                "bin": pc.divide(ts_us, gap_us),
                "ts_us": ts_us,
            }
        )
        g = t.group_by(["conv_id", "bin"]).aggregate(
            [([], "count_all"), ("ts_us", "min"), ("ts_us", "max"),
             ("ts_us", "count")]
        )
        return g.rename_columns(
            ["conv_id", "bin", "n", "tmin", "tmax", "nn"]
        )

    def _rows(kind, conv, bins=None, n=None, tmin=None, tmax=None, nn=None):
        m = len(conv)
        zero = pa.nulls(m, pa.int64()) if m else pa.array([], pa.int64())
        return pa.table(
            {
                "kind": pa.array([kind] * m, pa.int64()),
                "conv_id": conv,
                "bin": bins if bins is not None else zero,
                "n": n if n is not None else zero,
                "tmin": tmin if tmin is not None else zero,
                "tmax": tmax if tmax is not None else zero,
                "nn": nn if nn is not None else zero,
            }
        )

    def fused(batch: pa.Table) -> pa.Table:
        cid_type = batch["conv_id"].type
        parts = []
        if len(batch):
            g = batch.group_by(["conv_id"]).aggregate([([], "count_all")])
            counts = pc.cast(g.column(1), pa.int64())
            t1 = g.filter(
                pc.greater_equal(counts, max(2, len(batch) // tier1_divisor))
            )
            if len(t1):
                parts.append(
                    _rows(K_COUNT, t1.column(0),
                          n=pc.cast(t1.column(1), pa.int64()))
                )
            t2_mask = pc.greater_equal(
                counts, max(2, len(batch) // tier2_divisor)
            )
            if pc.any(t2_mask).as_py():
                heavy_ids = g.filter(t2_mask).column(0)
                sub = batch.filter(
                    pc.is_in(batch["conv_id"],
                             value_set=heavy_ids.combine_chunks())
                )
                parts.append(_rows(K_BIN, *_bin_table(sub).columns))
                parts.append(_rows(K_COVER, heavy_ids))
            parts.append(
                _rows(K_SENTINEL, pa.nulls(1, cid_type),
                      n=pa.array([1], pa.int64()))
            )
        if not parts:
            parts.append(_rows(K_SENTINEL, pa.nulls(0, cid_type)))
        return pa.concat_tables(parts, promote_options="default")

    meta = (
        ds.select_columns(["conv_id", "ts"])
        .map_batches(
            fused, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    if meta.empty:
        return {}
    total_batches = int(meta.loc[meta["kind"] == K_SENTINEL, "n"].sum())
    lower = (
        meta[meta["kind"] == K_COUNT]
        .groupby("conv_id", sort=False)["n"].sum()
    )
    cand_ids = lower.index[lower.to_numpy() > hot_threshold // 2]
    if not len(cand_ids):
        return {}
    cover = (
        meta[meta["kind"] == K_COVER]
        .groupby("conv_id", sort=False).size()
    )
    complete = [
        c for c in cand_ids if cover.get(c, 0) == total_batches
    ]
    incomplete = [c for c in cand_ids if cover.get(c, 0) != total_batches]

    bins_raw = meta[meta["kind"] == K_BIN]
    bin_parts = []
    if complete:
        bin_parts.append(
            bins_raw[bins_raw["conv_id"].isin(complete)]
        )
    if incomplete:
        # adversarial placement (a candidate below the tier-2 cutoff
        # or absent in some batch): exact second pass over its ids only
        cand_arr = pa.array(np.asarray(incomplete, dtype=object))

        def bin_stats(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch["conv_id"], value_set=cand_arr)
            if not pc.any(mask).as_py():
                return pa.table(
                    {
                        "conv_id": pa.array([], batch["conv_id"].type),
                        "bin": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "tmin": pa.array([], pa.int64()),
                        "tmax": pa.array([], pa.int64()),
                        "nn": pa.array([], pa.int64()),
                    }
                )
            return _bin_table(batch.filter(mask))

        bin_parts.append(
            ds.select_columns(["conv_id", "ts"])
            .map_batches(
                bin_stats, batch_format="pyarrow", batch_size=batch_size,
                zero_copy_batch=True,
            )
            .to_pandas()
        )
    bins = pd.concat(
        [p[["conv_id", "bin", "n", "tmin", "tmax", "nn"]]
         for p in bin_parts],
        ignore_index=True,
    )
    if bins.empty:
        return {}
    # dropna=False: a null-ts row lands in a null bin; dropping that
    # group would silently restore n == nn and defeat the null gate
    merged = (
        bins.groupby(["conv_id", "bin"], sort=False, dropna=False)
        .agg(n=("n", "sum"), tmin=("tmin", "min"),
             tmax=("tmax", "max"), nn=("nn", "sum"))
        .reset_index()
    )
    totals = merged.groupby("conv_id", sort=False)[["n", "nn"]].sum()
    hot_ids = set(
        totals.index[
            (totals["n"] > hot_threshold) & (totals["n"] == totals["nn"])
        ]
    )
    if not hot_ids:
        return {}
    starts: dict = {}
    for cid, grp in merged.groupby("conv_id"):  # few hot convs
        if cid not in hot_ids:
            continue
        grp = grp.sort_values("bin")
        tmin = grp["tmin"].to_numpy()
        tmax = grp["tmax"].to_numpy()
        newseg = np.empty(len(grp), dtype=bool)
        newseg[0] = True
        newseg[1:] = (tmin[1:] - tmax[:-1]) > gap_us
        starts[cid] = tmin[newseg].astype(np.int64)
    return starts


def sessionize(
    ds: rd.Dataset,
    gap_seconds: int = 1800,
    batch_size: int = 131072,
    num_buckets: int = 64,
    hot_threshold: int | None = 262144,
) -> rd.Dataset:
    """Split conversations into sessions at inactivity gaps > gap.

    The streaming-window translation (SURVEY.md §2.10): treat each
    conversation as an ordered log, sort within its hash bucket, and
    compute session boundaries vectorized (a gap opens a new session).
    Appends ``session_idx`` (0-based per conversation).  Ordering
    contract: (conv_id, ts, turn_idx) is the total order, matching the
    SQL window specification.

    **Skew (round-5 design)**: hash-bucketing whole conversations puts
    a hot conversation (one conv holding ~10% of all rows) on one
    worker — the round-4 driver artifact measured a 1.48x skew
    straggler, and the round-4 fix (ts-range-shard + two-phase
    stitch) still paid an extra full input scan (~1.5x total).  Now a
    cheap per-(conv, gap-width ts bin) combiner pre-pass
    (:func:`_detect_hot_convs`) reconstructs each oversized
    conversation's exact session segmentation from per-bin
    (count, min, max) alone — a boundary can only fall between bins —
    so hot rows are labeled DIRECTLY in the partial map via one
    broadcast ``searchsorted`` against the conv's session-start array
    and flow through the shuffle as uniformly-salted passthrough rows.
    One scan, one balanced shuffle, no stitching.
    ``hot_threshold=None`` disables detection (single-phase path, no
    pre-pass).
    """
    gap_us = gap_seconds * 1_000_000

    hot_starts: dict = {}
    if hot_threshold is not None:
        hot_starts = _detect_hot_convs(ds, hot_threshold, batch_size, gap_us)

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

    if not hot_starts:
        return _bucketed(
            ds, partial, reduce_bucket, batch_size, num_buckets
        )

    starts_ref = ray.put(hot_starts)

    def partial_with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = partial(df).copy()
        starts = ray.get(starts_ref)
        sess = np.full(len(out), -1, dtype=np.int64)
        bucket = (
            hash64(out["conv_id"].to_numpy(dtype=object))
            % np.uint64(num_buckets)
        ).astype(np.int64)
        hot_mask = out["conv_id"].isin(starts.keys()).to_numpy()
        if hot_mask.any():
            sub_conv = out.loc[hot_mask, "conv_id"]
            keys = list(starts)
            codes = pd.Categorical(sub_conv, categories=keys).codes
            ts_us = (
                out.loc[hot_mask, "ts"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            sub_sess = np.empty(len(codes), dtype=np.int64)
            for k in np.unique(codes):  # few hot convs by construction
                m = codes == k
                sub_sess[m] = (
                    np.searchsorted(starts[keys[k]], ts_us[m], side="right")
                    - 1
                )
            sess[hot_mask] = sub_sess
            # pre-labeled rows are reducer passthrough: spread them
            # uniformly so no bucket inherits the hot conv's mass
            bucket[hot_mask] = (
                hash64(
                    ts_us * np.int64(1_000_003)
                    + out.loc[hot_mask, "turn_idx"].to_numpy(np.int64)
                )
                % np.uint64(num_buckets)
            ).astype(np.int64)
        out["session_idx"] = sess
        out["_bucket"] = bucket
        return out

    def reduce_dispatch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"])
        done = df["session_idx"].to_numpy() >= 0
        if done.all():
            return df
        rest = reduce_bucket(
            df.loc[~done, ["conv_id", "turn_idx", "ts"]]
        )
        if not done.any():
            return rest
        return pd.concat(
            [rest, df.loc[done, rest.columns]], ignore_index=True
        )

    partials = ds.map_batches(
        partial_with_bucket, batch_format="pandas", batch_size=batch_size
    )
    return partials.groupby("_bucket").map_groups(
        reduce_dispatch, batch_format="pandas"
    )


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
