"""Route stage: oracle parity, routed-row equality, per-turn text equality."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages.route import (
    ROUTED_SQL,
    RouterConfig,
    make_route_batch,
    route_stage,
    write_fanout,
)
from opentelemetry_collector_components_ray.synth import materialize_transcripts


def test_route_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = route_stage(enriched_ds).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} SELECT * FROM ({ROUTED_SQL})"
    ).df()
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def test_first_match_wins_precedence(enriched_ds):
    df = route_stage(enriched_ds).to_pandas()
    # a failed tool turn must land in 'errors', not 'tools'
    assert (df[df.event_outcome == "failure"].sink == "errors").all()
    tools = df[(df.role == "tool") & (df.event_outcome != "failure")]
    assert (tools.sink == "tools").all()
    http = df[
        (df.method.notna())
        & (df.role != "tool")
        & (df.event_outcome != "failure")
    ]
    assert (http.sink == "http").all()


def test_sinks_partition_input_exactly(ray_session, enriched_ds, sf_dir, tmp_path):
    """Routed-row equality (FIXTURES.md §F4.2) + per-turn text equality
    (§F4.1): the union of all sinks reproduces the input exactly under
    (conv_id, turn_idx) ordering."""
    routed = route_stage(enriched_ds)
    paths = write_fanout(
        routed, str(tmp_path), columns=["conv_id", "turn_idx", "text"]
    )
    parts = [
        pq.read_table(p, columns=["conv_id", "turn_idx", "text"]).to_pandas()
        for p in paths.values()
        if os.path.isdir(p)
    ]
    import pandas as pd

    union = (
        pd.concat(parts)
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    inp = (
        pq.read_table(
            materialize_transcripts(sf_dir),
            columns=["conv_id", "turn_idx", "text"],
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(union) == len(inp)
    assert (union.values == inp.values).all()


def test_router_config_validation():
    with pytest.raises(ValueError):
        RouterConfig(default_sink="errors")  # duplicate of a rule sink
    with pytest.raises(ValueError):
        RouterConfig(default_sink="")


def test_default_sink_for_unmatched_rows():
    t = pa.table(
        {
            "event_outcome": ["success"],
            "role": ["assistant"],
            "method": pa.array([None], pa.string()),
        }
    )
    out = make_route_batch(RouterConfig())(t)
    assert out["sink"].to_pylist() == ["general"]
