"""Rate limiting (batch translation of the ratelimitprocessor)."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_components_ray.stages.ratelimit import (
    rate_limit_quota,
    token_bucket_decisions,
)


def _mk(rows):
    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": range(len(rows)),
            "role": [r[1] for r in rows],
            "ts": [base + pd.Timedelta(seconds=r[2]) for r in rows],
        }
    )


def test_quota_caps_per_window_and_overrides(ray_session):
    import ray.data as rd

    rows = [("c", "user", i) for i in range(5)]          # 5 in one hour
    rows += [("c", "tool", i) for i in range(5)]
    rows += [("c", "user", 3700 + i) for i in range(2)]  # next window
    df = _mk(rows)
    out = (
        rate_limit_quota(
            rd.from_pandas(df).repartition(3),
            key="role", interval="1h", limit=3,
            overrides=[("tool", 1)],
        )
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    user_w1 = out[(out.role == "user") & (out.turn_idx < 5)]
    assert (user_w1.rl_decision == "accepted").sum() == 3
    assert (user_w1.rl_decision == "throttled").sum() == 2
    tool = out[out.role == "tool"]
    assert (tool.rl_decision == "accepted").sum() == 1  # override limit
    w2 = out[out.turn_idx >= 10]
    assert (w2.rl_decision == "accepted").all()  # fresh window


def test_token_bucket_golden(ray_session):
    """rate=1/s, burst=2: t=0 (2 tokens, accept), t=0 (1, accept),
    t=0 (0, throttle), t=1.5 (1.5, accept), t=10 (capped at 2,
    accept)."""
    import ray.data as rd

    df = _mk(
        [("c", "user", 0), ("c", "user", 0), ("c", "user", 0)]
    )
    df2 = _mk([("c", "user", 1.5), ("c", "user", 10)])
    df2["turn_idx"] = [3, 4]
    allr = pd.concat([df, df2], ignore_index=True)
    out = (
        token_bucket_decisions(
            rd.from_pandas(allr), key="role", rate=1.0, burst=2
        )
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert out.rl_decision.tolist() == [
        "accepted", "accepted", "throttled", "accepted", "accepted"
    ]
    assert out.rl_tokens_before.tolist() == [2.0, 1.0, 0.0, 1.5, 2.0]


def test_token_bucket_override(ray_session):
    import ray.data as rd

    df = _mk([("c", "tool", 0), ("c", "tool", 0), ("c", "user", 0)])
    out = (
        token_bucket_decisions(
            rd.from_pandas(df), key="role", rate=1.0, burst=5,
            overrides=[("tool", 1.0, 1)],
        )
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert out[out.role == "tool"].rl_decision.tolist() == [
        "accepted", "throttled"
    ]
    assert out[out.role == "user"].rl_decision.tolist() == ["accepted"]
