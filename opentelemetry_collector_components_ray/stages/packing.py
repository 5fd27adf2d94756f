"""Distributed ordered prefix-scan and GPT-style sequence packing.

Every LLM training pipeline ends with *concatenate-and-chunk*: lay the
tokenized corpus end to end in a canonical order and cut a training
sample every ``budget`` tokens (GPT-3 §2.3 — documents are joined and
split with no respect for boundaries).  The primitive underneath is an
ORDERED EXCLUSIVE PREFIX SUM over a distributed dataset — a scan, the
one collective Ray Data has no built-in for.

``ordered_prefix_sum`` implements the textbook two-phase scan on
Dataset blocks:

1. sort by the order column (the unavoidable shuffle — packing is
   order-DEFINED, so this cost is inherent to the semantics, not the
   implementation) and materialize, pinning the block layout;
2. one cheap stats pass emits (block_min_order, block_sum) per block —
   thousands of rows, not data-sized;
3. the driver computes the per-block exclusive prefix (tiny cumsum)
   and broadcasts a base-offset lookup keyed by block_min_order;
4. a second pass adds each block's base to its within-block exclusive
   cumsum.  Sorted blocks hold disjoint order ranges, so
   ``min(order)`` identifies a block unambiguously.

Chunk assignment is then integer arithmetic per row:
``first_chunk = offset // budget``, ``last_chunk = (offset + n - 1) //
budget`` (empty docs sit wholly in ``first_chunk``), which a SQL
window ``SUM(...) OVER (ORDER BY ...)`` reproduces bit-exactly — the
driver's d_text_profile gate covers the whole scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def ordered_prefix_sum(
    ds: rd.Dataset,
    value_col: str,
    order_col: str,
    out_col: str = "offset",
) -> rd.Dataset:
    """Append ``out_col`` = exclusive prefix sum of ``value_col`` in
    ``order_col`` order.  ``order_col`` values must be distinct (they
    key the block lookup); int64 in/out."""
    sds = ds.sort(order_col).materialize()

    def block_stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "block_min": pa.array(
                    [pc.min(t[order_col]).as_py()], pa.int64()
                ),
                "block_sum": pa.array(
                    [pc.sum(t[value_col]).as_py() or 0], pa.int64()
                ),
            }
        )

    stats = (
        sds.map_batches(
            block_stats, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values("block_min")
    )
    sums = stats["block_sum"].to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]])
    base_by_min = dict(
        zip(stats["block_min"].to_numpy(dtype=np.int64), bases)
    )
    ref = ray.put(base_by_min)

    def add_offsets(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        order = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # the sorted block arrives sorted, but keep it order-robust
        srt = np.argsort(order, kind="stable")
        within = np.empty(len(vals), dtype=np.int64)
        within[srt] = np.concatenate(
            [[0], np.cumsum(vals[srt])[:-1]]
        )
        base = lookup[int(order.min())]
        return t.append_column(
            out_col, pa.array(base + within, pa.int64())
        )

    return sds.map_batches(
        add_offsets, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def concat_chunk_packing(
    ds: rd.Dataset,
    budget: int,
    value_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> rd.Dataset:
    """Concatenate-and-chunk assignment: appends ``pack_offset`` (the
    document's position in the concatenated token stream),
    ``pack_first_chunk`` / ``pack_last_chunk`` (the training samples it
    lands in; a document may span several) and ``pack_n_chunks``."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    out = ordered_prefix_sum(ds, value_col, order_col, "pack_offset")

    def chunks(t: pa.Table) -> pa.Table:
        off = t["pack_offset"].to_numpy(zero_copy_only=False)
        n = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        first = off // budget
        last = np.where(n > 0, (off + n - 1) // budget, first)
        return (
            t.append_column("pack_first_chunk", pa.array(first, pa.int64()))
            .append_column("pack_last_chunk", pa.array(last, pa.int64()))
            .append_column(
                "pack_n_chunks", pa.array(last - first + 1, pa.int64())
            )
        )

    return out.map_batches(
        chunks, batch_format="pyarrow", zero_copy_batch=True
    )


def packing_sql(
    inner: str,
    budget: int,
    value_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> str:
    """Wrap ``inner`` (any SELECT producing value/order columns) with
    the window-scan twin of :func:`concat_chunk_packing`."""
    return f"""
SELECT p.*,
       pack_offset // {budget} AS pack_first_chunk,
       CASE WHEN {value_col} > 0
            THEN (pack_offset + {value_col} - 1) // {budget}
            ELSE pack_offset // {budget} END AS pack_last_chunk,
       CASE WHEN {value_col} > 0
            THEN (pack_offset + {value_col} - 1) // {budget}
            ELSE pack_offset // {budget} END
         - pack_offset // {budget} + 1 AS pack_n_chunks
FROM (
  SELECT q.*, CAST(COALESCE(SUM({value_col}) OVER (
           ORDER BY {order_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS pack_offset
  FROM ({inner}) q
) p
"""
