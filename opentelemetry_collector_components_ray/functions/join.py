"""Join primitives.

The reference has no relational joins (SURVEY.md §2.7) — its lookups
are broadcast dicts — but a complete engine needs them for the
beyond-reference ops (joining derived per-key tables back to rows,
candidate-pair verification at scale).  Three tiers:

1. **Broadcast join** (small side): `ray.put` the small table once,
   vectorized `index_in`/`merge` per batch — no shuffle.  This is the
   default for dimension-table-sized sides (functions/lookups.py is
   the dict special case).
2. **Hash-partitioned join** (both large): `Dataset.join` — Ray's
   built-in hash-shuffle join; pick ``num_partitions`` ≈ 2–4 ×
   cluster cores, more under memory pressure.
3. **Bucket join** (portable fallback / custom merge logic): tag both
   sides, explode into `hash(key) % B` buckets, one `groupby(bucket)`,
   pandas merge within each bucket.  Used when the merge itself needs
   custom semantics (as-of, range, similarity-verify).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .sketches import hash64


def broadcast_join(
    left: rd.Dataset,
    right_df: pd.DataFrame,
    on: str,
    how: str = "left",
    batch_size: int = 65536,
) -> rd.Dataset:
    """Join a Dataset against a driver-side small table (broadcast once
    via ``ray.put``, resolved per task)."""
    ref = ray.put(right_df)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return df.merge(small, on=on, how=how)

    return left.map_batches(fn, batch_format="pandas", batch_size=batch_size)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    how: str = "inner",
    num_partitions: Optional[int] = None,
) -> rd.Dataset:
    """Both-sides-large join via Ray's hash-partitioned Dataset.join."""
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            num_partitions = 16
    type_map = {"inner": "inner", "left": "left_outer",
                "right": "right_outer", "outer": "full_outer"}
    return left.join(
        right,
        join_type=type_map.get(how, how),
        num_partitions=num_partitions,
        on=(on,),
    )


def bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    num_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """Explicit partitioned hash join: tag sides, bucket by
    ``hash64(key) % B``, pandas-merge inside each bucket.  The portable
    pattern from the Ray guide; bucket count bounds per-worker memory
    (raise it for bigger keys; salt hot keys into sub-buckets when one
    key dominates)."""

    # union needs one schema: pad each side with the other's columns
    left_cols = [f for f in left.schema().names]
    right_cols = [f for f in right.schema().names]
    l_only = [c for c in left_cols if c != on and c not in right_cols]
    r_only = [c for c in right_cols if c != on and c not in left_cols]
    all_cols = [on] + l_only + r_only

    def tag(side: str, pad: Sequence[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in pad:
                df[c] = None
            df["_side"] = side
            df["_bucket"] = (
                hash64(df[on].to_numpy()) % np.uint64(num_buckets)
            ).astype(np.int64)
            return df[all_cols + ["_side", "_bucket"]]

        return fn

    both = left.map_batches(
        tag("l", r_only), batch_format="pandas"
    ).union(right.map_batches(tag("r", l_only), batch_format="pandas"))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "l"][[on] + l_only]
        r = df[df["_side"] == "r"][[on] + r_only]
        return l.merge(r, on=on, how=how)

    return both.groupby("_bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    on: str,
    direction: str = "backward",
    num_buckets: int = 64,
    suffixes: Tuple[str, str] = ("", "_r"),
) -> rd.Dataset:
    """As-of (event-time nearest) join: for each left row, the right
    row with the greatest ``on`` ≤ left's (direction="backward"; or the
    least ≥ for "forward") within the same ``by`` key.  The reference
    has no such operator; training-data pipelines need it for
    "state at event time" lookups (latest config/session/checkpoint
    before each event).

    Ray-Data-first shape: both sides bucket by ``hash64(by) %
    num_buckets`` (all rows of a key co-locate), and each bucket runs
    one vectorized ``pd.merge_asof`` (sorted by ``on``) — no global
    sort, no coalesce; per-bucket memory is the two sides' key slices.
    Oracle twin: DuckDB ``ASOF LEFT JOIN`` with the same key/time
    columns.
    """
    def _pa_type(t):
        import pyarrow as _pa

        if isinstance(t, _pa.DataType):
            return t
        try:
            dt = np.dtype(t)
        except TypeError:
            return _pa.string()
        if dt == np.dtype("O"):
            return _pa.string()
        return _pa.from_numpy_dtype(dt)

    left_cols = list(left.schema().names)
    l_types = {
        c: _pa_type(t)
        for c, t in zip(left.schema().names, left.schema().types)
    }
    right_cols = list(right.schema().names)
    r_types = {
        c: _pa_type(t)
        for c, t in zip(right.schema().names, right.schema().types)
    }
    r_payload = [c for c in right_cols if c not in (by, on)]
    l_only = [c for c in left_cols if c not in right_cols]
    r_only = [c for c in right_cols if c not in left_cols]
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]
    types = {**r_types, **l_types}

    import pyarrow as pa

    def tag(side: int, own: List[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for c in all_cols:
                cols[c] = (
                    t[c] if c in own else pa.nulls(t.num_rows, types[c])
                )
            cols["_side"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8)
            )
            key = t[by].to_numpy(zero_copy_only=False)
            cols["_bucket"] = pa.array(
                (hash64(key.astype(object)) % np.uint64(num_buckets)).astype(
                    np.int64
                )
            )
            return pa.table(cols)

        return fn

    both = left.map_batches(
        tag(0, left_cols), batch_format="pyarrow"
    ).union(right.map_batches(tag(1, right_cols), batch_format="pyarrow"))

    # pandas dtypes each side SHOULD have (the union nulls the other
    # side's columns, which floats integer columns in the bucket frame)
    exp_dtypes = dict(
        pa.schema([(c, types[c]) for c in all_cols])
        .empty_table()
        .to_pandas()
        .dtypes
    )

    def _restore(frame: pd.DataFrame) -> pd.DataFrame:
        for c in frame.columns:
            dt = exp_dtypes.get(c)
            if dt is not None and frame[c].dtype != dt:
                try:
                    frame[c] = frame[c].astype(dt)
                except (ValueError, TypeError):
                    pass  # genuine nulls in the data — keep as-is
        return frame

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_r = df["_side"].to_numpy() == 1
        l = _restore(df[~is_r][left_cols].copy()).sort_values(
            on, kind="mergesort"
        )
        r = _restore(df[is_r][[by, on] + r_payload].copy()).sort_values(
            on, kind="mergesort"
        )
        out = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, suffixes=suffixes
        )
        # unmatched string payloads come back as float NaN — normalize
        # to None so Arrow/oracle see a real null, not the text 'nan'
        for c in out.columns:
            if out[c].dtype == object:
                out[c] = out[c].where(out[c].notna(), None)
        return out

    return both.groupby("_bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )


def _isin_filter(
    left: rd.Dataset, on: str, keys: np.ndarray, keep_matches: bool
) -> rd.Dataset:
    """Filter ``left`` by broadcast key-set membership with Arrow's
    hash-based ``is_in`` kernel (``np.isin`` on object-dtype string
    columns sorts Python objects per batch — 17× slower at 12M rows).
    Null left keys never match: semi drops them, anti keeps them."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        key_arr = pa.array(keys)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        key_arr = pa.array(keys, pa.string(), from_pandas=True)
    ref = ray.put(key_arr)

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hit = pc.is_in(
            col, value_set=ks.cast(col.type) if ks.type != col.type else ks
        )
        hit = pc.fill_null(hit, False)
        return t.filter(hit if keep_matches else pc.invert(hit))

    return left.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _matched_keys(
    left: rd.Dataset, right: rd.Dataset, on: str, num_buckets: int
) -> rd.Dataset:
    """Distinct ``on`` keys present in BOTH datasets, via a key-only
    bucketed exchange: each batch dedups its keys before the shuffle
    (combiner), each bucket intersects its two sides.  Buckets are
    disjoint by key hash, so the union of per-bucket intersections is
    globally distinct."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            keys = pc.unique(
                t[on].combine_chunks()
                if isinstance(t[on], pa.ChunkedArray)
                else t[on]
            )
            return pa.table(
                {
                    on: keys,
                    "_side": pa.array([side] * len(keys), pa.string()),
                    "_bucket": pa.array(
                        (hash64(keys) % np.uint64(num_buckets)).astype(
                            np.int64
                        )
                    ),
                }
            )

        return fn

    both = left.select_columns([on]).map_batches(
        tag("l"), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([on]).map_batches(
            tag("r"), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def intersect(df: pd.DataFrame) -> pd.DataFrame:
        is_r = df["_side"].to_numpy() == "r"
        lkeys = pd.unique(df.loc[~is_r, on].to_numpy())
        rkeys = pd.unique(df.loc[is_r, on].to_numpy())
        return pd.DataFrame({on: lkeys[np.isin(lkeys, rkeys)]})

    return both.groupby("_bucket").map_groups(
        intersect, batch_format="pandas"
    )


def filter_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    mode: str = "semi",
    broadcast: bool | None = None,
    num_buckets: int = 64,
    prefilter: str | None = None,
    bloom_bits_per_key: int = 10,
    exchange: str = "keys",
) -> rd.Dataset:
    """Semi / anti join: keep left rows whose ``on`` key does (semi) or
    does not (anti) appear in ``right`` — the filter joins a
    training-data pipeline uses for decontamination (drop documents
    matching a benchmark set) and allow-list selection.

    ``broadcast=None`` → estimator decides (same polarity as
    resolve_distributed): a right side that clearly fits one worker is
    collected once, ``ray.put``, and each left batch filters with a
    vectorized ``np.isin`` — no shuffle.  Otherwise a KEY-ONLY
    bucketed exchange computes the distinct matched-key set (keys in
    both sides) and one broadcast ``isin`` settles every left row —
    the wide left rows never move.  Only when the matched set itself
    exceeds the broadcast bound (semi-join where most of left matches)
    does the full-row exchange run: both sides bucket by
    ``hash64(on) % num_buckets`` and each bucket filters its slice —
    no worker ever holds the full key set.  ``exchange="rows"`` forces
    that fallback directly (tests; pathological key distributions).

    ``prefilter="bloom"`` (the 100 TB polarity): build a mergeable
    Bloom filter over the right keys (functions/bloom.py), broadcast
    it, and settle every left row whose membership the filter decides
    outright — a semi-join miss is dropped, an anti-join miss is kept
    with no further work.  Only the bloom HITS (true matches + ~1%
    false positives) enter the exact bucketed verify, so the all-to-all
    exchange moves the candidate subset instead of the whole left side.
    The result is exactly the plain semi/anti join (the filter prunes,
    never decides positives) — same oracle.
    """
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    keep_matches = mode == "semi"

    if prefilter is not None:
        if prefilter != "bloom":
            raise ValueError(f"unknown prefilter {prefilter!r}")
        from .bloom import bloom_prefilter, build_bloom

        bf = build_bloom(
            right.select_columns([on]), on, bits_per_key=bloom_bits_per_key
        )
        candidates = bloom_prefilter(left, bf, on, keep_hits=True)
        verified = filter_join(
            candidates, right, on,
            mode=mode, broadcast=broadcast, num_buckets=num_buckets,
            exchange=exchange,
        )
        if keep_matches:
            return verified
        definite_keep = bloom_prefilter(left, bf, on, keep_hits=False)
        return definite_keep.union(verified)

    if broadcast is None:
        from ..stages.aggregate import AUTO_DISTRIBUTED_BYTES, estimate_input_bytes

        est = estimate_input_bytes(right)
        broadcast = est is not None and est <= AUTO_DISTRIBUTED_BYTES

    left_schema = left.schema()
    if left_schema is None:  # fully-empty left: semi/anti of ∅ is ∅
        return left
    left_cols = list(left_schema.names)

    if broadcast:
        keys_df = right.select_columns([on]).to_pandas()  # bounded side
        # a fully-empty Dataset drops its schema → no key column
        keys = (
            np.unique(keys_df[on].to_numpy())
            if on in keys_df.columns
            else np.empty(0, dtype=object)
        )
        return _isin_filter(left, on, keys, keep_matches)

    import pyarrow as pa

    # Key-only exchange (round 5): membership is decided by the key
    # alone, so the all-to-all needs to move ONLY key columns.  Compute
    # the distinct matched-key set (keys present in BOTH sides) via a
    # bucketed intersection with per-batch dedup before the shuffle,
    # then settle every left row with one broadcast ``isin`` — the wide
    # left rows (text payloads) never enter the exchange.  The matched
    # set is bounded by min(distinct-left, distinct-right); only when
    # it exceeds the broadcast bound (semi-join where most of left
    # matches) does the full-row exchange below run.
    from ..stages.aggregate import AUTO_DISTRIBUTED_BYTES as _BCAST_BYTES

    if exchange not in ("keys", "rows"):
        raise ValueError(f"unknown exchange {exchange!r}")
    matched = (
        _matched_keys(left, right, on, num_buckets).materialize()
        if exchange == "keys"
        else None
    )
    if matched is not None and (matched.size_bytes() or 0) <= _BCAST_BYTES:
        mdf = matched.to_pandas()
        keys = (
            mdf[on].to_numpy()
            if on in mdf.columns
            else np.empty(0, dtype=object)
        )
        return _isin_filter(left, on, keys, keep_matches)

    pad_cols = [c for c in left_cols if c != on]

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            dt = np.dtype(t)
        except TypeError:
            return pa.string()
        return pa.string() if dt == np.dtype("O") else pa.from_numpy_dtype(dt)

    pad_types = {
        c: _pa_type(t)
        for c, t in zip(left.schema().names, left.schema().types)
    }

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {on: t[on]}
            for c in pad_cols:
                cols[c] = (
                    t[c] if side == "l"
                    else pa.nulls(t.num_rows, pad_types[c])
                )
            cols["_side"] = pa.array([side] * t.num_rows, pa.string())
            cols["_bucket"] = pa.array(
                (hash64(t[on]) % np.uint64(num_buckets)).astype(np.int64)
            )
            return pa.table(cols)

        return fn

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.select_columns([on]).map_batches(
            tag("r"), batch_format="pyarrow"
        )
    )

    def filter_bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_r = df["_side"].to_numpy() == "r"
        l = df[~is_r]
        rkeys = df[is_r][on].unique()
        hit = l[on].isin(rkeys).to_numpy()
        return l[hit if keep_matches else ~hit][left_cols]

    return both.groupby("_bucket").map_groups(
        filter_bucket, batch_format="pandas"
    )


def semi_join(left: rd.Dataset, right: rd.Dataset, on: str, **kw) -> rd.Dataset:
    return filter_join(left, right, on, mode="semi", **kw)


def anti_join(left: rd.Dataset, right: rd.Dataset, on: str, **kw) -> rd.Dataset:
    return filter_join(left, right, on, mode="anti", **kw)


def range_join_broadcast(
    left: rd.Dataset,
    bands: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    batch_size: int = 65536,
) -> rd.Dataset:
    """Range (interval) join against a SMALL banding table: each left
    row matches the band with ``lo ≤ value < hi`` (``hi`` null = +inf).
    Bands must be sorted, non-overlapping and gapless from their first
    ``lo`` (validated) — the common case for latency/size/score bands —
    so the match is one vectorized ``np.searchsorted`` per batch
    against the broadcast boundary array; rows below the first ``lo``
    match nothing (payload nulls).  For a LARGE right side, co-locate
    by a shared coarse key and run the same searchsorted per bucket
    (bucket_join machinery)."""
    bands = bands.sort_values(lo_col).reset_index(drop=True)
    los = bands[lo_col].to_numpy(dtype=np.float64)
    his = bands[hi_col].to_numpy(dtype=np.float64)  # NaN = +inf
    his = np.where(np.isnan(his), np.inf, his)
    if not (los[1:] == his[:-1]).all():
        raise ValueError("bands must be non-overlapping and gapless")
    payload_cols = [c for c in bands.columns if c not in (lo_col, hi_col)]
    payload = {c: bands[c].to_numpy() for c in payload_cols}
    ref = ray.put({"los": los, "payload": payload})

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)
        v = df[value_col].to_numpy(dtype=np.float64)
        idx = np.searchsorted(b["los"], v, side="right") - 1
        ok = (idx >= 0) & ~np.isnan(v)
        df = df.copy()
        for c, vals in b["payload"].items():
            col = np.where(ok, vals[np.clip(idx, 0, len(vals) - 1)], None)
            df[c] = col
        return df

    return left.map_batches(fn, batch_format="pandas", batch_size=batch_size)
