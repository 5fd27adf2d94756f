"""ECS-style column remap stage."""

import pyarrow as pa
import pytest

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.stages.remap import (
    ECS_MAP,
    RemapSpec,
    remap_stage,
)


def test_remap_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = remap_stage(enriched_ds).to_pandas()
    want = oracle.execute(
        f"{cte_prefix} {RemapSpec().sql_select('enriched')}"
    ).df()
    assert_frames_equal(got, want, ["session.id", "event.sequence"])


def test_projection_drops_unmapped():
    t = pa.table({"conv_id": ["a"], "secret": [1]})
    out = RemapSpec().apply(t)
    assert "secret" not in out.column_names
    assert out.column_names == ["session.id"]


def test_keep_unmapped():
    t = pa.table({"conv_id": ["a"], "extra": [1]})
    out = RemapSpec(keep_unmapped=True).apply(t)
    assert set(out.column_names) == {"session.id", "extra"}


def test_duplicate_dst_rejected():
    with pytest.raises(ValueError):
        RemapSpec(mapping=(("a", "x"), ("b", "x")))
