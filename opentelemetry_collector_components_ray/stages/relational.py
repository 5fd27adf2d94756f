"""Relational demo queries over the TPC-H-ish tables.

Not part of the reference's surface (the collector has no relational
layer) — these exist to show the same engine primitives (column-pruned
reads, filter pushdown, per-batch combiners, tree merge) express
classic analytics directly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .aggregate import merge_partials


def pricing_summary(sf_dir: str, batch_size: int = 131072) -> rd.Dataset:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/counts with
    derived disc_price and charge; reads only the six needed columns."""
    from ..sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        charge = pc.multiply(disc_price, pc.add(1.0, batch["l_tax"]))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": batch["l_quantity"],
                "price": batch["l_extendedprice"],
                "disc_price": disc_price,
                "charge": charge,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"),
                ("price", "sum"),
                ("disc_price", "sum"),
                ("charge", "sum"),
                ([], "count_all"),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "sum_charge",
                "count_order",
            ]
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    merged = merge_partials(
        partials,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "sum"),
            ("sum_base_price", "sum"),
            ("sum_disc_price", "sum"),
            ("sum_charge", "sum"),
            ("count_order", "sum"),
        ],
    )

    def round6(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
            i = t.schema.get_field_index(c)
            t = t.set_column(
                i, c, pc.round(t[c], ndigits=2,
                               round_mode="half_towards_infinity")
            )
        return t

    return merged.map_batches(round6, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice), 2) AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_year(sf_dir: str, batch_size: int = 131072) -> rd.Dataset:
    """Q6-ish: filtered revenue with the predicate pushed into the
    parquet read (row-group pruning), grouped by ship year."""
    from ..sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_discount") >= 0.05),
    )

    def partial(batch: pa.Table) -> pa.Table:
        year = pc.year(batch["l_shipdate"])
        rev = pc.multiply(batch["l_extendedprice"], batch["l_discount"])
        t = pa.table({"ship_year": pc.cast(year, pa.int64()), "rev": rev})
        g = t.group_by(["ship_year"]).aggregate([("rev", "sum")])
        return g.rename_columns(["ship_year", "revenue"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    merged = merge_partials(partials, ["ship_year"], [("revenue", "sum")])
    return merged.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("revenue"),
            "revenue",
            pc.round(t["revenue"], ndigits=2,
                     round_mode="half_towards_infinity"),
        ),
        batch_format="pyarrow",
    )


REVENUE_BY_YEAR_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       round(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem WHERE l_discount >= 0.05 GROUP BY 1
"""

def relational_union(sf_dir: str) -> rd.Dataset:
    """Both relational demos in one long-format tag-union result
    (round 5 — keeps every registered query inside the driver's
    50-slot correctness budget, the ``t_sampling`` precedent):
    :func:`pricing_summary` melted to one row per (group, metric) and
    :func:`revenue_by_year` appended with its year as the group key,
    distinguished by a ``query`` column."""

    def melt_pricing(t: pa.Table) -> pa.Table:
        metrics = [
            "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
            "count_order",
        ]
        n = len(t)
        parts = []
        for m in metrics:
            parts.append(
                pa.table(
                    {
                        "query": pa.array(["pricing_summary"] * n),
                        "k1": t["l_returnflag"],
                        "k2": t["l_linestatus"],
                        "metric": pa.array([m] * n),
                        "value": pc.cast(t[m], pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else pa.table({})

    def melt_revenue(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "query": pa.array(["revenue_by_year"] * n),
                "k1": pc.cast(t["ship_year"], pa.string()),
                "k2": pa.array([""] * n),
                "metric": pa.array(["revenue"] * n),
                "value": pc.cast(t["revenue"], pa.float64()),
            }
        )

    pricing = pricing_summary(sf_dir).map_batches(
        melt_pricing, batch_format="pyarrow"
    )
    revenue = revenue_by_year(sf_dir).map_batches(
        melt_revenue, batch_format="pyarrow"
    )
    return pricing.union(revenue)


RELATIONAL_UNION_SQL = """
WITH p AS (
  SELECT l_returnflag AS k1, l_linestatus AS k2,
         round(SUM(l_quantity), 2) AS sum_qty,
         round(SUM(l_extendedprice), 2) AS sum_base_price,
         round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS sum_charge,
         CAST(COUNT(*) AS DOUBLE) AS count_order
  FROM lineitem GROUP BY 1, 2
)
SELECT 'pricing_summary' AS query, k1, k2, m.metric, m.value
FROM p, LATERAL (VALUES
  ('sum_qty', sum_qty), ('sum_base_price', sum_base_price),
  ('sum_disc_price', sum_disc_price), ('sum_charge', sum_charge),
  ('count_order', count_order)) AS m(metric, value)
UNION ALL
SELECT 'revenue_by_year' AS query,
       CAST(year(l_shipdate) AS VARCHAR) AS k1, '' AS k2,
       'revenue' AS metric,
       round(SUM(l_extendedprice * l_discount), 2) AS value
FROM lineitem WHERE l_discount >= 0.05 GROUP BY 2
"""
