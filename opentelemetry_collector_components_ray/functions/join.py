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

from typing import List, Optional, Sequence

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
