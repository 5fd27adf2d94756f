"""Conversation-level ops: stats, ordered head, HLL distinct."""

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages import conversation as C


@pytest.fixture(scope="module")
def transcripts_ds(ray_session, sf_dir):
    from opentelemetry_collector_components_ray.sources import read_transcripts

    return read_transcripts(sf_dir).materialize()


def test_conv_stats_matches_oracle(transcripts_ds, oracle, cte_prefix):
    got = C.conv_stats(transcripts_ds).to_pandas()
    want = oracle.execute(f"{cte_prefix} {C.CONV_STATS_SQL}").df()
    assert_frames_equal(got, want, ["conv_id"])


def test_conv_head_matches_oracle(transcripts_ds, oracle, cte_prefix):
    got = C.conv_head(transcripts_ds, k=3).to_pandas()
    want = oracle.execute(f"{cte_prefix} {C.conv_head_sql(3)}").df()
    assert_frames_equal(got, want, ["conv_id"])


def test_conv_head_order_dependent(ray_session):
    """Shuffled input must still produce turn_idx-ordered heads."""
    import ray.data as rd

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": np.array([3, 0, 2, 1], dtype=np.int32),
            "text": ["d", "a", "c", "b"],
        }
    )
    out = C.conv_head(rd.from_pandas(df), k=3).to_pandas()
    assert out.head_text.tolist() == ["a | b | c"]


def test_sessionize_matches_oracle(transcripts_ds, oracle, cte_prefix):
    got = C.sessionize(transcripts_ds, gap_seconds=3600 * 24).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {C.sessionize_sql(3600 * 24)}"
    ).df()
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def test_sessionize_gap_boundaries(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "conv_id": ["a"] * 4 + ["b"],
            "turn_idx": np.array([0, 1, 2, 3, 0], dtype=np.int32),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:10:00",  # same session (gap 10m)
                    "2024-01-01 01:00:00",  # new session (gap 50m > 30m)
                    "2024-01-01 01:20:00",  # same session
                    "2024-01-01 09:00:00",  # conv b starts at 0
                ]
            ),
        }
    )
    out = (
        C.sessionize(rd.from_pandas(df), gap_seconds=1800)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    assert out.session_idx.tolist() == [0, 0, 1, 1, 0]


def test_top_tools_matches_oracle(transcripts_ds, oracle, cte_prefix):
    from opentelemetry_collector_components_ray.stages import aggregate as agg

    got = agg.top_tools(transcripts_ds, k=5).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {agg.top_tools_sql(5)}"
    ).df()
    # value top-k: ORDER matters here, so compare in rank order
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)[got.columns]
    assert got.tool.tolist() == want.tool.tolist()
    assert got.turn_count.astype("int64").tolist() == (
        want.turn_count.astype("int64").tolist()
    )


def test_approx_distinct_convs_within_error(transcripts_ds, oracle, cte_prefix):
    got = C.approx_distinct_convs(transcripts_ds).set_index("role")
    exact = oracle.execute(
        f"{cte_prefix} SELECT role, COUNT(DISTINCT conv_id) AS n "
        "FROM transcripts GROUP BY role"
    ).df().set_index("role")
    for role in exact.index:
        e, a = exact.loc[role, "n"], got.loc[role, "approx_convs"]
        assert abs(a - e) / max(e, 1) < 0.05, (role, e, a)


def test_sessionize_hot_conversation_correct(ray_session):
    """Skew shape: one conversation holds most rows (with duplicate
    turn_idx values, as the skewed bench corpus has) — the factorized
    lexsort path must match a naive per-conversation recomputation."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.conversation import (
        sessionize,
    )

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2026-01-01")
    rows = [
        ("conv-hot", i % 37,
         base + pd.Timedelta(seconds=int(rng.randint(0, 200_000))))
        for i in range(2000)
    ] + [
        (f"c{c}", i, base + pd.Timedelta(seconds=i * 2000))
        for c in range(20)
        for i in range(10)
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    got = (
        sessionize(rd.from_pandas(df).repartition(5), gap_seconds=1800)
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx", "session_idx"])
        .reset_index(drop=True)
    )
    exp_parts = []
    for _, g in df.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.zeros(len(g), dtype=bool)
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > 1800 * 1_000_000
        g["session_idx"] = np.cumsum(gap)
        exp_parts.append(g)
    exp = (
        pd.concat(exp_parts)
        .sort_values(["conv_id", "ts", "turn_idx", "session_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "ts", "session_idx"]].astype(
            {"session_idx": "int64"}
        ),
        exp[["conv_id", "turn_idx", "ts", "session_idx"]].astype(
            {"session_idx": "int64"}
        ),
    )


def test_sessionize_hot_path_forced_matches_naive(ray_session):
    """Force the round-5 hot path (tiny hot_threshold → the hot
    conversation's session segmentation is reconstructed from the
    per-(conv, gap-bin) combiner and applied shuffle-free via a
    broadcast searchsorted) and check it matches a naive
    per-conversation recomputation exactly, with every row covered
    once."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.conversation import (
        sessionize,
    )

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2026-02-01")
    rows = [
        ("conv-hot", i % 53,
         base + pd.Timedelta(seconds=int(rng.randint(0, 20_000_000))))
        for i in range(3000)
    ] + [
        (f"c{c}", i, base + pd.Timedelta(seconds=i * 2500))
        for c in range(15)
        for i in range(12)
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    got = (
        sessionize(
            rd.from_pandas(df).repartition(7),
            gap_seconds=1800,
            hot_threshold=500,
        )
        .to_pandas()
        .sort_values(["conv_id", "ts", "turn_idx", "session_idx"])
        .reset_index(drop=True)
    )
    exp_parts = []
    for _, g in df.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.zeros(len(g), dtype=bool)
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > 1800 * 1_000_000
        g["session_idx"] = np.cumsum(gap)
        exp_parts.append(g)
    exp = (
        pd.concat(exp_parts)
        .sort_values(["conv_id", "ts", "turn_idx", "session_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "ts", "session_idx"]].astype(
            {"session_idx": "int64"}
        ),
        exp[["conv_id", "turn_idx", "ts", "session_idx"]].astype(
            {"session_idx": "int64"}
        ),
    )
    # multiple sessions must actually exist in the hot conv for the
    # stitch to have been exercised
    hot_sessions = exp[exp.conv_id == "conv-hot"].session_idx.max()
    assert hot_sessions >= 1
