"""Rate limiting — batch translation of the ratelimitprocessor.

The reference throttles a live stream with per-key token buckets
(processor/ratelimitprocessor/README.md: ``rate`` tokens/sec refill,
``burst`` cap, per-metadata-key buckets, ordered first-match
``overrides``).  A bounded batch engine re-expresses the DECISION as a
pure function of event time (SURVEY.md §2.10 streaming→batch rules):

- :func:`rate_limit_quota` — the windowed-quota form: at most
  ``limit`` records per (key, throttle_interval window), the rest
  marked throttled.  Deterministic (ordered by (ts, tie-break)),
  SQL-expressible (row_number ≤ limit), and exactly the reference's
  behavior when rate×interval = limit and burst = limit.
- :func:`token_bucket_decisions` — the exact token-bucket recurrence
  replayed over event time per key (refill min(burst, tokens + rate·Δt),
  consume 1 per accepted record, ``error`` behavior: throttled records
  consume nothing).  The recurrence feeds back into itself, so it has
  no closed SQL form — unit-tested against hand-computed goldens
  instead.

Both are key-hash-bucketed Dataset ops; per-key state never leaves its
bucket.  Overrides: ordered (match_value → limit) pairs on the key
column, first match wins, fallback to the default (README "Overrides").
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.blocks import to_clean_arrow
from ..functions.sketches import hash64


def _limit_for(key_val: str, default: int,
               overrides: Sequence[Tuple[str, int]]) -> int:
    for match, lim in overrides:
        if key_val == match:
            return lim
    return default


def rate_limit_quota(
    ds: rd.Dataset,
    key: str = "role",
    ts_col: str = "ts",
    interval: str = "1h",
    limit: int = 100,
    overrides: Sequence[Tuple[str, int]] = (),
    order_cols: Sequence[str] = ("conv_id", "turn_idx"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Append ``rl_decision`` ('accepted' | 'throttled'): at most
    ``limit`` (or the key's override) records per (key, window),
    first-come by (ts, order_cols)."""
    from .aggregate import INTERVALS_US, validate_intervals

    validate_intervals([interval])
    us = INTERVALS_US[interval]
    overrides = list(overrides)
    order = [ts_col, *order_cols]

    def bucketize(df: pd.DataFrame):
        df = df.copy()
        df["_bucket"] = (
            hash64(df[key].to_numpy(dtype=object)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(df)

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).copy()
        w = (
            df[ts_col].astype("datetime64[us]").astype("int64") // us
        ) * us
        df["_w"] = w
        df = df.sort_values([key, "_w", *order], kind="mergesort")
        rk = df.groupby([key, "_w"]).cumcount()
        lims = df[key].map(
            lambda v: _limit_for(v, limit, overrides)
        ).to_numpy()
        df["rl_decision"] = np.where(
            rk.to_numpy() < lims, "accepted", "throttled"
        )
        return df.drop(columns=["_w"])

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(decide, batch_format="pandas")
    )


def rate_limit_quota_sql(
    key: str = "role",
    interval: str = "1h",
    limit: int = 100,
    overrides: Sequence[Tuple[str, int]] = (),
    table: str = "transcripts",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("conv_id", "turn_idx"),
) -> str:
    from .aggregate import INTERVALS_US

    us = INTERVALS_US[interval]
    lim_expr = "CASE "
    for match, lim in overrides:
        lim_expr += f"WHEN {key} = '{match}' THEN {lim} "
    lim_expr += f"ELSE {limit} END"
    order = ", ".join([ts_col, *order_cols])
    return f"""
SELECT * EXCLUDE (_rk) ,
       CASE WHEN _rk <= {lim_expr} THEN 'accepted'
            ELSE 'throttled' END AS rl_decision
FROM (
  SELECT {table}.*,
         row_number() OVER (
           PARTITION BY {key}, epoch_us({ts_col}) // {us}
           ORDER BY {order}) AS _rk
  FROM {table}
)
"""


def token_bucket_decisions(
    ds: rd.Dataset,
    key: str = "role",
    ts_col: str = "ts",
    rate: float = 1.0,
    burst: int = 10,
    overrides: Sequence[Tuple[str, float, int]] = (),
    order_cols: Sequence[str] = ("conv_id", "turn_idx"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact per-key token-bucket replay over event time (``error``
    behavior: a throttled record consumes no tokens).  ``overrides`` =
    ordered (match_value, rate, burst).  Appends ``rl_decision`` and
    ``rl_tokens_before`` (the README's tokens_before telemetry)."""
    overrides = list(overrides)

    def params_for(v: str) -> Tuple[float, int]:
        for match, r, b in overrides:
            if v == match:
                return r, b
        return rate, burst

    def bucketize(df: pd.DataFrame):
        df = df.copy()
        df["_bucket"] = (
            hash64(df[key].to_numpy(dtype=object)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(df)

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).copy()
        df = df.sort_values([key, ts_col, *order_cols], kind="mergesort")
        t_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = df[key].to_numpy()
        decisions = np.empty(len(df), dtype=object)
        tokens_before = np.empty(len(df), dtype=np.float64)
        i = 0
        n = len(df)
        while i < n:
            j = i
            while j < n and keys[j] == keys[i]:
                j += 1
            r, b = params_for(keys[i])
            tokens = float(b)
            prev_t = t_us[i]
            # per-key sequential replay — the recurrence (accept
            # decisions feed the bucket level) cannot be vectorized
            for k in range(i, j):
                tokens = min(float(b), tokens + r * (t_us[k] - prev_t) / 1e6)
                prev_t = t_us[k]
                tokens_before[k] = tokens
                if tokens >= 1.0:
                    tokens -= 1.0
                    decisions[k] = "accepted"
                else:
                    decisions[k] = "throttled"
            i = j
        df["rl_decision"] = decisions
        df["rl_tokens_before"] = np.round(tokens_before, 6)
        return df

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(decide, batch_format="pandas")
    )
