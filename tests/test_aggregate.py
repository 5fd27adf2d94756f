"""Aggregate stage: oracle parity + semantic unit tests mirrored on the
reference's golden cases (sum_delta, sum_cumulative latest-wins,
overflow — processor/lsmintervalprocessor/testdata/)."""

import pandas as pd
import pyarrow as pa
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages import aggregate as agg


def test_service_summary_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = agg.service_summary(enriched_ds, ("1h", "24h")).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {agg.service_summary_sql(('1h', '24h'))}"
    ).df()
    assert_frames_equal(
        got, want, ["interval", "window_start", "role", "tool"]
    )


def test_latest_state_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = agg.latest_state(enriched_ds).to_pandas()
    want = oracle.execute(f"{cte_prefix} {agg.LATEST_STATE_SQL}").df()
    assert_frames_equal(got, want, ["conv_id"])


def test_capped_tool_summary_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = agg.capped_tool_summary(enriched_ds, limit=4).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {agg.capped_tool_summary_sql(4)}"
    ).df()
    assert_frames_equal(got, want, ["role", "tool"])


def test_validate_intervals():
    agg.validate_intervals(["1m", "10m"])  # 10m = 10 × 1m ✓
    with pytest.raises(ValueError):
        agg.validate_intervals([])
    with pytest.raises(ValueError):
        agg.validate_intervals(["5s"])  # unknown
    with pytest.raises(ValueError):
        # 1h is not a multiple-chain issue, but 24h with 10m is fine;
        # craft a genuinely invalid combo via monkeyed table
        agg.INTERVALS_US["7m"] = 7 * 60_000_000
        try:
            agg.validate_intervals(["10m", "7m"])
        finally:
            del agg.INTERVALS_US["7m"]


def test_window_start_floor():
    ts = pa.array(
        [0, 59_999_999, 60_000_000, 3_599_999_999, 3_600_000_000],
        pa.timestamp("us"),
    )
    w = agg.window_start(ts, agg.INTERVALS_US["1h"])
    assert w.to_pylist() == [
        pd.Timestamp(0),
        pd.Timestamp(0),
        pd.Timestamp(0),
        pd.Timestamp(0),
        pd.Timestamp("1970-01-01 01:00:00"),
    ]


def test_latest_wins_ignores_out_of_order(ray_session):
    """Cumulative merge is latest-timestamp-wins and order-insensitive
    (datapoints.go:65-79, golden sum_cumulative/input.yaml:28-37)."""
    import ray.data as rd

    rows = pa.table(
        {
            "conv_id": ["a", "a", "a", "b"],
            "turn_idx": pa.array([2, 0, 1, 0], pa.int32()),
            # turn 2 has the NEWEST ts but appears FIRST (out of order)
            "ts": pa.array(
                [3_000_000, 1_000_000, 2_000_000, 5], pa.timestamp("us")
            ),
            "status": pa.array([503, 200, 200, None], pa.int32()),
            "event_outcome": ["failure", "success", "success", "unknown"],
        }
    )
    out = (
        agg.latest_state(rd.from_arrow(rows))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out.last_turn_idx.tolist() == [2, 0]
    assert out.last_status.tolist()[0] == 503
    assert out.last_outcome.tolist() == ["failure", "unknown"]


def test_overflow_fold_deterministic(ray_session):
    """First-K-distinct in (first_ts, tool) order; rest -> '_other' with
    dropped-unique count (limits/tracker.go:68-84, value.go:311-362)."""
    import ray.data as rd

    n = 6
    rows = pa.table(
        {
            "role": ["tool"] * n,
            "tool": ["t1", "t2", "t3", "t4", "t5", "t5"],
            "ts": pa.array(range(1, n + 1), pa.timestamp("us")),
        }
    )
    out = agg.capped_tool_summary(rd.from_arrow(rows), limit=3).to_pandas()
    kept = out[out.tool != "_other"]
    assert sorted(kept.tool) == ["t1", "t2", "t3"]
    other = out[out.tool == "_other"].iloc[0]
    assert other.turn_count == 3  # t4 once + t5 twice
    assert other.overflow_tools == 2  # t4, t5 dropped


def test_latest_state_distributed_equals_coalesced(enriched_ds):
    dist = (
        agg.latest_state(enriched_ds, distributed=True, num_buckets=7)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    coal = (
        agg.latest_state(enriched_ds, distributed=False)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, coal)


def test_summary_merge_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = agg.summary_merge(
        agg.summary_datapoints(enriched_ds), "24h"
    ).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {agg.summary_merge_sql('24h')}"
    ).df()
    assert_frames_equal(got, want, ["window_start", "role", "tool"])


def test_summary_merge_latest_wins_golden(ray_session):
    """Mirrors the reference golden
    processor/lsmintervalprocessor/testdata/summary_enabled: four
    datapoints of one stream, the latest-timestamp one (count=25,
    sum=310, q95=15) wins wholesale — values do NOT add."""
    import pyarrow as pa
    import ray.data as rd

    base = pd.Timestamp("2024-01-01")
    dp = pd.DataFrame(
        {
            "role": ["svc"] * 4,
            "tool": ["t"] * 4,
            "ts": [
                base + pd.Timedelta(milliseconds=m)
                for m in (5, 2, 8, 7)  # 5000000ns etc., scaled
            ],
            "turn_idx": [0, 1, 2, 3],
            "summary_count": [20, 5, 25, 35],
            "summary_sum": [199.0, 95.0, 310.0, 240.0],
            "q50": [0.0] * 4,
            "q95": [10.0, 5.0, 15.0, 13.0],
            "q99": [0.0] * 4,
        }
    )
    out = agg.summary_merge(
        rd.from_pandas(dp).repartition(3), "24h"
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row.summary_count == 25
    assert row.summary_sum == 310.0
    assert row.q95 == 15.0
    assert row.last_ts == base + pd.Timedelta(milliseconds=8)


def test_summary_merge_distributed_equals_coalesced(enriched_ds):
    dps = agg.summary_datapoints(enriched_ds)
    sort_cols = ["window_start", "role", "tool"]
    dist = (
        agg.summary_merge(dps, "24h", distributed=True, num_buckets=7)
        .to_pandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    coal = (
        agg.summary_merge(dps, "24h", distributed=False)
        .to_pandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, coal)


def test_capped_tool_summary_distributed_equals_driver(enriched_ds):
    dist = (
        agg.capped_tool_summary(enriched_ds, limit=4, distributed=True)
        .to_pandas()
        .sort_values(["role", "tool"])
        .reset_index(drop=True)
    )
    drv = (
        agg.capped_tool_summary(enriched_ds, limit=4, distributed=False)
        .sort_values(["role", "tool"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, drv)


def test_expo_histogram_distributed_equals_coalesced(enriched_ds):
    """The bucketed grouped-numpy finish must produce byte-identical
    merged sketches to the single-reducer pairwise-merge path (the
    span-halving cap argument makes them equal by construction; this
    pins it), including negative runs exercised via a signed measure."""
    import pyarrow.compute as pc

    signed = enriched_ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("latency_ms"),
            "latency_ms",
            pc.subtract(t["latency_ms"], 200),
        ),
        batch_format="pyarrow",
    )
    kw = dict(interval="1h", scale=4, batch_size=512)
    keys = ["window_start", "role"]
    dist = (
        agg.expo_latency_histogram(
            signed, distributed=True, num_buckets=5, **kw
        )
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    coal = (
        agg.expo_latency_histogram(signed, distributed=False, **kw)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, coal)
