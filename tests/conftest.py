import logging
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    """DuckDB connection with the driver-style table views registered."""
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.fixture(scope="session")
def cte_prefix():
    from opentelemetry_collector_components_ray.stages.enrich import ENRICHED_SQL
    from opentelemetry_collector_components_ray.stages.parse import PARSED_SQL
    from opentelemetry_collector_components_ray.synth import TRANSCRIPTS_SQL

    return (
        f"WITH transcripts AS ({TRANSCRIPTS_SQL}), "
        f"parsed AS ({PARSED_SQL}), enriched AS ({ENRICHED_SQL})"
    )


@pytest.fixture(scope="session")
def enriched_ds(ray_session, sf_dir):
    """Enriched transcript Dataset, materialized once per test session."""
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    return enriched_transcripts(sf_dir).materialize()


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, keys):
    """Order-insensitive comparison (sorted by keys), dtype-lenient."""
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    assert set(a.columns) == set(b.columns), (a.columns, b.columns)
    a = a.sort_values(list(keys), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(list(keys), kind="mergesort").reset_index(drop=True)
    b = b[list(a.columns)]
    for c in a.columns:
        ac, bc = a[c], b[c]
        if ac.dtype != bc.dtype:
            try:
                bc = bc.astype(ac.dtype)
            except (TypeError, ValueError):
                pass
        fa = -999 if ac.dtype.kind in "ifu" else "__null__"
        fb = -999 if bc.dtype.kind in "ifu" else "__null__"
        pd.testing.assert_series_equal(
            ac.fillna(fa), bc.fillna(fb), check_names=False,
            check_dtype=False, obj=f"column {c}"
        )
