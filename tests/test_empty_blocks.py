"""Zero-row batches flow through every hot-path stage.

The streaming executor regularly produces empty blocks (filters,
partition boundaries, skewed splits); a kernel that assumes ≥1 row
fails only at scale, so each stage is pinned here on an empty input.
"""

import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray import schema
from opentelemetry_collector_components_ray.stages.enrich import (
    enrich_scalar_batch,
    lookup_batch,
)
from opentelemetry_collector_components_ray.stages.parse import parse_batch
from opentelemetry_collector_components_ray.stages.route import (
    RouterConfig,
    make_route_batch,
)


def _empty_transcripts() -> pa.Table:
    return schema.TRANSCRIPT.empty_table()


def test_parse_empty():
    out = parse_batch(_empty_transcripts())
    assert out.num_rows == 0
    assert set(schema.PARSED.names) <= set(out.column_names)


def test_enrich_empty():
    out = lookup_batch(enrich_scalar_batch(parse_batch(_empty_transcripts())))
    assert out.num_rows == 0
    assert "tool_category" in out.column_names
    assert "error_id" in out.column_names


def test_route_empty():
    enriched = lookup_batch(
        enrich_scalar_batch(parse_batch(_empty_transcripts()))
    )
    out = make_route_batch(RouterConfig())(enriched)
    assert out.num_rows == 0
    assert "sink" in out.column_names


def test_service_summary_partial_empty():
    from opentelemetry_collector_components_ray.stages.aggregate import (
        _partial_service_summary,
    )

    enriched = lookup_batch(
        enrich_scalar_batch(parse_batch(_empty_transcripts()))
    )
    out = _partial_service_summary(("1h",))(enriched)
    assert out.num_rows == 0


def test_minhash_signatures_empty_and_blank():
    from opentelemetry_collector_components_ray.stages.dedup import MinHasher

    mh = MinHasher()
    sigs = mh.signatures([])
    assert sigs.shape == (0, 64)
    sigs2 = mh.signatures(["", "   "])
    assert sigs2.shape == (2, 64)


def test_simhash_empty_batch():
    from opentelemetry_collector_components_ray.stages.dedup import SimHasher

    assert SimHasher().simhash_batch([]).shape == (0,)


def test_pipeline_with_empty_filter_result(ray_session, sf_dir):
    """A stage chain fed an all-filtered-out dataset completes."""
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )
    from opentelemetry_collector_components_ray.stages.aggregate import (
        service_summary,
    )

    ds = enriched_transcripts(sf_dir).filter(
        expr="role == 'nonexistent-role'"
    )
    out = service_summary(ds, ("1h",)).to_pandas()
    assert len(out) == 0
