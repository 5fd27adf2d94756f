"""prometheusremotewritev1receiver translate port (sources/promrw.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.sources import promrw as W


def _series_table(rows):
    """rows: list of (series_id, [(name, value)...], [(value, ts_ms)...])."""
    return pa.table({
        "series_id": pa.array([r[0] for r in rows], pa.int64()),
        "label_names": pa.array(
            [[l[0] for l in r[1]] for r in rows], pa.list_(pa.string())
        ),
        "label_values": pa.array(
            [[l[1] for l in r[1]] for r in rows], pa.list_(pa.string())
        ),
        "sample_values": pa.array(
            [[s[0] for s in r[2]] for r in rows], pa.list_(pa.float64())
        ),
        "sample_ts_ms": pa.array(
            [[s[1] for s in r[2]] for r in rows], pa.list_(pa.int64())
        ),
    })


def test_translate_basic():
    t = _series_table([
        (0,
         [("__name__", "http_requests_total"), ("job", "api"),
          ("instance", "h1")],
         [(1.5, 1_000), (2.5, 2_000)]),
    ])
    out = W.translate_batch(t).to_pandas()
    assert list(out["metric_name"]) == ["http_requests_total"] * 2
    # ms → engine timestamp[us] (reference multiplies to ns,
    # receiver.go:207)
    assert out["ts"].iloc[0] == pd.Timestamp("1970-01-01 00:00:01")
    assert list(out["value"]) == [1.5, 2.5]
    # job/instance kept as attrs (receiver.go:177-179), __name__ dropped
    assert out["attrs"].iloc[0] == '{"job":"api","instance":"h1"}'


def test_missing_name_dropped_and_flagged():
    t = _series_table([
        (0, [("job", "api")], [(1.0, 0)]),
        (1, [("__name__", "up"), ("job", "api")], [(2.0, 0)]),
        (2, [("__name__", ""), ("job", "x")], [(3.0, 0)]),  # empty ≡ missing
    ])
    out = W.translate_batch(t).to_pandas()
    assert list(out["metric_name"]) == ["up"]
    assert list(out["value"]) == [2.0]


def test_label_order_preserved_not_sorted():
    t = _series_table([
        (0, [("zebra", "z"), ("__name__", "m"), ("alpha", "a")],
         [(1.0, 0)]),
    ])
    out = W.translate_batch(t).to_pandas()
    assert out["attrs"].iloc[0] == '{"zebra":"z","alpha":"a"}'


def test_json_escaping():
    t = _series_table([
        (0, [("__name__", "m"), ("path", 'a"b\\c')], [(1.0, 0)]),
    ])
    out = W.translate_batch(t).to_pandas()
    assert out["attrs"].iloc[0] == '{"path":"a\\"b\\\\c"}'


def test_no_labels_series_dropped():
    t = _series_table([(0, [], [(1.0, 0)])])
    assert W.translate_batch(t).num_rows == 0


def test_series_without_samples():
    t = _series_table([(0, [("__name__", "m")], [])])
    assert W.translate_batch(t).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_invalid_series_flag():
    import ray.data as rd

    t = _series_table([
        (0, [("job", "x")], [(1.0, 0)]),
        (1, [("__name__", "m")], [(1.0, 0)]),
        (2, [("__name__", "")], [(1.0, 0)]),
    ])
    ds = rd.from_arrow(t)
    bad = W.invalid_series(ds).to_pandas()
    assert sorted(bad["series_id"]) == [0, 2]


@pytest.mark.usefixtures("ray_session")
def test_translate_matches_sql_twin():
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    got = (
        W.translate_write_requests(W.read_write_requests(sf_dir))
        .to_pandas()
        .sort_values(["metric_name", "ts", "value", "attrs"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    exp = (
        con.execute(W.PROMRW_SQL).df()
        .sort_values(["metric_name", "ts", "value", "attrs"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_dtype=False
    )
