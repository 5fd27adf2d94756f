"""Windowed generic counts, latency histogram, expo histogram stages."""

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages import aggregate as agg


def test_windowed_counts_events_matches_oracle(ray_session, sf_dir, oracle):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = agg.windowed_counts(
        ds, keys=["event_type"], ts_col="ts", value_col="value",
        interval="1h",
    ).to_pandas()
    w = agg.window_start_sql("1h")
    want = oracle.execute(
        f"""SELECT {w} AS window_start, event_type,
                   COUNT(*) AS n, SUM(value) AS value_sum
            FROM events GROUP BY 1, 2"""
    ).df()
    # float sums: compare rounded (summation order differs)
    got["value_sum"] = got["value_sum"].round(6)
    want["value_sum"] = want["value_sum"].round(6)
    assert_frames_equal(got, want, ["window_start", "event_type"])


def test_latency_histogram_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = agg.latency_histogram(enriched_ds, ("24h",)).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {agg.latency_histogram_sql(('24h',))}"
    ).df()
    assert_frames_equal(
        got, want, ["interval", "window_start", "role", "bucket_idx"]
    )


def test_latency_histogram_counts_sum_to_rows(enriched_ds):
    got = agg.latency_histogram(enriched_ds, ("24h",)).to_pandas()
    n_measured = (
        enriched_ds.to_pandas()["latency_ms"].notna().sum()
    )
    assert got.bucket_count.sum() == n_measured


def test_aggregate_with_passthrough(enriched_ds):
    """Passthrough rows flow unchanged; aggregation covers the rest
    (lsminterval gauge/summary pass-through, processor.go:286-336)."""
    agg_ds, passthrough = agg.aggregate_with_passthrough(
        enriched_ds, intervals=("24h",)
    )
    pdf = enriched_ds.to_pandas()
    miss = pdf[~pdf.parse_ok]
    got_pass = (
        passthrough.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got_pass.equals(
        miss.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    got_agg = agg_ds.to_pandas()
    assert got_agg.turn_count.sum() == (len(pdf) - len(miss))


def test_expo_latency_histogram_totals(enriched_ds):
    got = agg.expo_latency_histogram(enriched_ds, "24h").to_pandas()
    pdf = enriched_ds.to_pandas()
    measured = pdf[pdf.latency_ms.notna()]
    assert got["count"].sum() == len(measured)
    assert got["hsum"].sum() == pytest.approx(measured.latency_ms.sum())
    # bucket runs hold every positive measurement
    pos = (measured.latency_ms > 0).sum()
    assert sum(sum(c) for c in got["counts"]) == pos
    # zero latencies land in zero_count
    assert got["zero_count"].sum() == (measured.latency_ms <= 0).sum()


def test_latency_quantiles_within_bucket_error(enriched_ds):
    """Expo-histogram quantiles within one bucket width (~4.4% at
    scale 4) of exact percentiles."""
    got = agg.latency_quantiles(enriched_ds, "24h", (0.5, 0.95)).to_pandas()
    pdf = enriched_ds.to_pandas()
    pdf = pdf[pdf.latency_ms.notna()]
    ts_us = pdf["ts"].astype("int64")
    pdf = pdf.assign(
        window_start=pd.to_datetime(
            (ts_us // agg.INTERVALS_US["24h"]) * agg.INTERVALS_US["24h"],
            unit="us",
        )
    )
    tol = 2 ** (2 ** -4) - 1 + 0.01  # one bucket width + slack
    checked = 0
    for _, row in got.iterrows():
        grp = pdf[
            (pdf.window_start == row.window_start) & (pdf.role == row.role)
        ].latency_ms
        if len(grp) < 10:
            continue
        svals = np.sort(grp.to_numpy())
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            # comparator = the actual order statistic the histogram CDF
            # crossing corresponds to (ceil(q*n)-th smallest)
            k = max(int(np.ceil(q * len(svals))) - 1, 0)
            exact = float(svals[k])
            if exact <= 0:
                continue
            rel = abs(row[col] - exact) / exact
            assert rel <= tol, (row.window_start, row.role, col, row[col], exact)
            checked += 1
    assert checked >= 10  # the assertion exercised real groups


def test_expo_latency_histogram_partition_invariant(ray_session, enriched_ds):
    """Same result regardless of block layout (merge commutes)."""
    a = (
        agg.expo_latency_histogram(enriched_ds, "24h")
        .to_pandas()
        .sort_values(["window_start", "role"])
        .reset_index(drop=True)
    )
    b = (
        agg.expo_latency_histogram(
            enriched_ds.repartition(7), "24h", batch_size=500
        )
        .to_pandas()
        .sort_values(["window_start", "role"])
        .reset_index(drop=True)
    )
    assert a.drop(columns=["counts"]).equals(b.drop(columns=["counts"]))
    for x, y in zip(a["counts"], b["counts"]):
        assert list(x) == list(y)


def test_hopping_counts_small(ray_session):
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.aggregate import (
        hopping_counts,
    )

    base = pd.Timestamp("2024-01-01 00:05:00")
    df = pd.DataFrame(
        {
            "ts": [base, base + pd.Timedelta(minutes=25)],
            "k": ["a", "a"],
        }
    )
    out = hopping_counts(
        rd.from_pandas(df), keys=["k"], window="1h", hop="10m"
    ).to_pandas()
    # each event lands in 6 windows; windows covering both events get 2
    assert out.n.sum() == 12
    assert out.n.max() == 2
    covered_by_both = out[out.n == 2]
    # overlap: both events' start sets intersect in {23:40, 23:50, 00:00}
    assert len(covered_by_both) == 3


def test_hopping_counts_validates_multiple(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.aggregate import (
        hopping_counts,
    )

    df = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "k": ["a"]})
    with pytest.raises(ValueError):
        hopping_counts(rd.from_pandas(df), ["k"], window="10m", hop="1h")
