"""Deterministic, layout-independent sampling & dataset splitting.

``Dataset.random_sample`` depends on block layout and RNG state; a
training-data pipeline needs samples and train/val/test splits that are
REPRODUCIBLE across runs, partitionings and cluster sizes, and that
keep whole groups (conversations) together.  Both ops here key off
``md5(key)`` — a pure function of the row — so any two runs agree row
for row, and both have exact DuckDB twins.

The hex-prefix trick: the first 8 hex chars of md5 are uniform in
[0, 16^8); comparing them LEXICOGRAPHICALLY against a hex threshold
implements `u < fraction` with zero float math, identically in Python
and SQL.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd
import ray.data as rd

_SPACE = 16 ** 8


def _hex_threshold(fraction: float) -> str:
    return format(min(_SPACE, int(round(fraction * _SPACE))), "08x")


def _md5_prefix(values: np.ndarray) -> np.ndarray:
    from ..functions.md5vec import md5_hex_np

    uniq, inv = np.unique(values.astype(object), return_inverse=True)
    # vectorized MD5 (functions/md5vec.py); '<U32' → '<U8' astype is a
    # vectorized prefix-truncate
    h = md5_hex_np(uniq).astype("U8").astype(object)
    return h[inv]


def deterministic_sample(
    ds: rd.Dataset, key: str, fraction: float
) -> rd.Dataset:
    """Keep rows whose md5(key) prefix < fraction — group-preserving
    (every row of a kept key is kept) and layout-independent."""
    thr = _hex_threshold(fraction)
    from ..functions.blocks import to_clean_arrow

    def fn(df: pd.DataFrame):
        pref = _md5_prefix(df[key].to_numpy())
        # arrow out: empty pandas blocks trip Ray's size estimator
        return to_clean_arrow(df[pref < thr])

    return ds.map_batches(fn, batch_format="pandas")


def deterministic_sample_sql(
    key: str, fraction: float, relation: str = "transcripts"
) -> str:
    thr = _hex_threshold(fraction)
    return (
        f"SELECT * FROM {relation} "
        f"WHERE substr(md5({key}), 1, 8) < '{thr}'"
    )


DEFAULT_SPLITS: Tuple[Tuple[str, float], ...] = (
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
)


def assign_split(
    ds: rd.Dataset,
    key: str,
    splits: Sequence[Tuple[str, float]] = DEFAULT_SPLITS,
) -> rd.Dataset:
    """Append a ``split`` column: whole groups land in one split, with
    the requested proportions, stable across runs and layouts."""
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bounds = []
    acc = 0.0
    for name, frac in splits:
        acc += frac
        bounds.append((name, _hex_threshold(acc)))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        pref = _md5_prefix(df[key].to_numpy())
        out = np.empty(len(df), dtype=object)
        remaining = np.ones(len(df), dtype=bool)
        for name, hi in bounds:
            m = remaining & (pref < hi)
            out[m] = name
            remaining &= ~m
        out[remaining] = bounds[-1][0]  # float-edge stragglers
        df = df.copy()
        df["split"] = out
        return df

    return ds.map_batches(fn, batch_format="pandas")


def assign_split_sql(
    key: str,
    splits: Sequence[Tuple[str, float]] = DEFAULT_SPLITS,
    relation: str = "transcripts",
) -> str:
    acc = 0.0
    cases = []
    for name, frac in splits[:-1]:
        acc += frac
        cases.append(
            f"WHEN substr(md5({key}), 1, 8) < '{_hex_threshold(acc)}' "
            f"THEN '{name}'"
        )
    last = splits[-1][0]
    case = "CASE " + " ".join(cases) + f" ELSE '{last}' END"
    return f"SELECT {relation}.*, {case} AS split FROM {relation}"


def stratified_sample(
    ds: rd.Dataset,
    key: str,
    n_per_key: int,
    id_expr_cols: Sequence[str] = ("conv_id", "turn_idx"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Deterministic per-key quota sample: keep the ``n_per_key`` rows
    of each key with the smallest md5(row identity) — a pure function
    of the data, so reruns and the SQL oracle agree, and every key gets
    a balanced quota (the stratified split training pipelines use to
    cap over-represented sources).

    Hash-partitioned: keys bucket by ``hash64(key)``; each bucket ranks
    its keys' rows vectorized — no global sort, no coalesce."""
    from ..functions.blocks import to_clean_arrow
    from ..functions.md5vec import md5_hex_np
    from ..functions.sketches import hash64

    cols = list(id_expr_cols)

    def bucketize(df: pd.DataFrame):
        df = df.copy()
        df["_bucket"] = (
            hash64(df[key].to_numpy(dtype=object)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(df)

    def take_quota(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).copy()
        ident = df[cols[0]].astype(str)
        for c in cols[1:]:
            ident = ident + ":" + df[c].astype(str)
        df["_h"] = md5_hex_np(ident.to_numpy(dtype=object))
        df = df.sort_values([key, "_h"], kind="mergesort")
        df["_rk"] = df.groupby(key).cumcount()
        out = df[df["_rk"] < n_per_key].drop(columns=["_h", "_rk"])
        return out

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(take_quota, batch_format="pandas")
    )


def stratified_sample_sql(
    key: str, n_per_key: int,
    id_expr: str = "conv_id || ':' || CAST(turn_idx AS VARCHAR)",
    table: str = "transcripts",
) -> str:
    return f"""
SELECT * EXCLUDE (_rk) FROM (
  SELECT {table}.*,
         row_number() OVER (PARTITION BY {key}
                            ORDER BY md5({id_expr})) AS _rk
  FROM {table}
) WHERE _rk <= {n_per_key}
"""


def quota_mix_sample(
    ds: rd.Dataset,
    key: str,
    quotas: dict,
    id_expr_cols: Sequence[str] = ("conv_id", "turn_idx"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Domain-mix rebalancing: keep at most ``quotas[k]`` rows of each
    key value (keys absent from ``quotas`` are dropped), selecting the
    rows with the smallest md5(row identity) — the deterministic
    per-domain token-budget cap a training-data pipeline uses to hit a
    target source mix.  Same bucketed machinery as
    ``stratified_sample`` (per-key quota rank inside a hash bucket, no
    global sort); the quota table is a plain broadcast-by-closure dict
    (small by definition: one entry per domain)."""
    from ..functions.blocks import to_clean_arrow
    from ..functions.md5vec import md5_hex_np
    from ..functions.sketches import hash64

    cols = list(id_expr_cols)
    q = dict(quotas)

    def bucketize(df: pd.DataFrame):
        df = df[df[key].isin(q.keys())].reset_index(drop=True).copy()
        df["_bucket"] = (
            hash64(df[key].to_numpy(dtype=object)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return to_clean_arrow(df)

    def take_quota(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).copy()
        ident = df[cols[0]].astype(str)
        for c in cols[1:]:
            ident = ident + ":" + df[c].astype(str)
        df["_h"] = md5_hex_np(ident.to_numpy(dtype=object))
        df = df.sort_values([key, "_h"], kind="mergesort")
        df["_rk"] = df.groupby(key).cumcount()
        quota = df[key].map(q).to_numpy()
        out = df[df["_rk"].to_numpy() < quota]
        return out.drop(columns=["_h", "_rk"])

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(take_quota, batch_format="pandas")
    )


def quota_mix_sample_sql(
    key: str, quotas: dict,
    id_expr: str = "conv_id || ':' || CAST(turn_idx AS VARCHAR)",
    table: str = "transcripts",
) -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(quotas.items())
    )
    keys = ", ".join(f"'{k}'" for k in sorted(quotas))
    return f"""
SELECT * EXCLUDE (_rk) FROM (
  SELECT {table}.*,
         row_number() OVER (PARTITION BY {key}
                            ORDER BY md5({id_expr})) AS _rk
  FROM {table} WHERE {key} IN ({keys})
) WHERE _rk <= CASE {key} {cases} ELSE 0 END
"""


def epoch_shuffle(
    ds: rd.Dataset,
    id_cols: Sequence[str],
    epoch: int = 0,
) -> rd.Dataset:
    """Deterministic global shuffle for training epochs: order rows by
    ``hash64(id ⊕ epoch)`` — a seeded pseudorandom permutation that is
    reproducible across runs and cluster layouts (``random_shuffle``
    is not), changes completely per epoch, and costs exactly one sort
    shuffle.  The id tuple must be unique per row."""
    from ..functions.sketches import hash64

    def key(df: pd.DataFrame) -> pd.DataFrame:
        k = df[id_cols[0]].astype(str)
        for c in id_cols[1:]:
            k = k + "\x1f" + df[c].astype(str)
        k = k + f"\x1fepoch={epoch}"
        df = df.copy()
        df["_shuffle_key"] = hash64(k.to_numpy(dtype=object)).astype(
            np.int64
        )
        return df

    return (
        ds.map_batches(key, batch_format="pandas")
        .sort("_shuffle_key")
        .drop_columns(["_shuffle_key"])
    )
