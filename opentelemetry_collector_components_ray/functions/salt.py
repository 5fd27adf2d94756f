"""Salted two-phase aggregation for skewed group keys.

North-rule requirement: a few conversations are orders of magnitude
longer than the rest (Zipf skew), and a naive ``groupby(conv_id)``
ships every row of a hot key to one reducer.  Salting splits each hot
key across ``salt`` sub-groups: partial-aggregate on ``(key, salt)``,
then re-aggregate on ``key`` — both shuffles are balanced.

Note the engine's default aggregation paths (stages/aggregate.py) are
combiner-first (per-BATCH partials), which bounds any key's
contribution to one row per block and makes salting unnecessary; this
utility is for the ``distributed=True`` paths where raw rows (or heavy
per-key state) must shuffle.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

_AGG = {"sum": Sum, "min": Min, "max": Max}


def add_salt(
    batch: pa.Table, key: str, salt: int, col: str = "_salt"
) -> pa.Table:
    """Deterministic per-row salt: rows of one key spread uniformly
    across ``salt`` sub-groups (row-index based, cheap, no RNG)."""
    n = batch.num_rows
    vals = (np.arange(n, dtype=np.int64) % salt).astype(np.int64)
    return batch.append_column(col, pa.array(vals))


def salted_groupby_agg(
    ds: rd.Dataset,
    keys: Sequence[str],
    specs: Sequence[Tuple[str, str, str]],
    salt: int = 16,
) -> rd.Dataset:
    """groupby(keys).aggregate(sum/min/max…) with salt-and-merge.

    ``specs``: (out_name, column, fn) with fn ∈ {sum, min, max}.
    Phase 1: groupby (keys…, _salt) — a hot key's rows split into
    ``salt`` balanced sub-groups.  Phase 2: groupby (keys…) over the
    tiny phase-1 output.  All fns must be commutative, which is what
    makes the split sound (add.go:58-68 semantics).
    """
    keys = list(keys)

    def salt_batch(t: pa.Table) -> pa.Table:
        return add_salt(t, keys[0], salt)

    salted = ds.map_batches(
        salt_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    phase1_aggs = [
        _AGG[f](col, alias_name=out) for out, col, f in specs
    ]
    p1 = salted.groupby(keys + ["_salt"]).aggregate(*phase1_aggs)
    # a phase-1 Sum is re-summed; Min/Max idempotent under re-reduce
    phase2_aggs = [
        _AGG[f](out, alias_name=out) for out, _, f in specs
    ]
    return p1.groupby(keys).aggregate(*phase2_aggs)
