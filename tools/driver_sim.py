"""Driver-sim: run every __ray_entry__ query against the DuckDB oracle.

Replicates what the grading driver does at sf=0.01: execute
``queries()[name](sf_dir)``, execute ``oracle_sql()[name]`` over DuckDB
views of the same parquet tables, sort columns by name and rows by all
columns, and compare values with dtype coercion.  Rows-only entries
(no oracle SQL) just report their row count.

Run:  python tools/driver_sim.py [sf_dir] [query ...]
      (default sf_dir /root/testdata/sf0.01; default all queries)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    sortable = [
        c for c in df.columns
        if not df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
    ]
    return df.sort_values(sortable, kind="mergesort").reset_index(drop=True)


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> str | None:
    if len(ray_df) != len(ora_df):
        return f"rows {len(ray_df)} != {len(ora_df)}"
    a, b = _canon(ray_df), _canon(ora_df)
    if list(a.columns) != list(b.columns):
        return f"schema {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = av.equals(bv)
        if not ok:
            neq = (av != bv) if not pd.api.types.is_float_dtype(av) else ~np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
            i = int(np.argmax(neq.to_numpy())) if neq.any() else 0
            return f"col {c} differs at row {i}: {av.iloc[i]!r} != {bv.iloc[i]!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )

    qs, osql = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            ray_df = (
                res.to_pandas() if hasattr(res, "to_pandas") else
                (res if isinstance(res, pd.DataFrame) else res.to_pandas())
            )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"rows  {name}: {len(ray_df)} rows ({dt:.1f}s, no oracle)")
            if len(ray_df) == 0:
                print(f"      WARNING {name} returned 0 rows")
            continue
        try:
            ora_df = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {e}")
            continue
        err = compare(ray_df, ora_df)
        if err:
            failures.append(name)
            print(f"FAIL  {name}: {err} ({dt:.1f}s)")
        else:
            print(f"OK    {name}: {len(ray_df)} rows ({dt:.1f}s)")
    print(
        f"\n{len(failures)} failures"
        + (f": {failures}" if failures else " — all green")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
