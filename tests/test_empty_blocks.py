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


def test_round2_ops_on_empty_datasets(ray_session):
    """Round-2 operators survive empty inputs end-to-end (the
    streaming executor regularly emits zero-row blocks)."""
    import numpy as np
    import ray.data as rd

    from opentelemetry_collector_components_ray.functions.join import (
        asof_join,
        range_join_broadcast,
    )
    from opentelemetry_collector_components_ray.stages.aggregate import (
        hopping_counts,
        summary_datapoints,
        summary_merge,
    )
    from opentelemetry_collector_components_ray.stages.ann import (
        quantize_embeddings,
    )
    from opentelemetry_collector_components_ray.stages.ratelimit import (
        rate_limit_quota,
    )
    from opentelemetry_collector_components_ray.stages.sampling import (
        stratified_sample,
    )
    from opentelemetry_collector_components_ray.stages.text import (
        normalize_text,
    )

    base = pd.Timestamp("2024-01-01")
    tr = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": [0, 1],
            "role": ["user", "tool"],
            "text": ["a b", "c d"],
            "tool": ["", "sql"],
            "ts": [base, base],
        }
    )
    # empty via an impossible filter — exercises the real empty-block path
    empty = rd.from_pandas(tr).filter(expr="turn_idx > 100")

    assert hopping_counts(empty, ["role"]).count() == 0
    assert stratified_sample(empty, "conv_id", 3).count() == 0
    assert rate_limit_quota(empty, key="role").count() == 0
    assert normalize_text(
        empty.map_batches(
            lambda t: t.rename_columns(
                ["doc_id" if c == "conv_id" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    ).count() == 0

    lat = pd.DataFrame(
        {
            "role": ["u"], "tool": ["t"],
            "ts": [base], "turn_idx": [0],
            "latency_ms": [5],
        }
    )
    assert summary_merge(
        summary_datapoints(rd.from_pandas(lat).filter(expr="turn_idx > 5"))
    ).count() == 0

    # asof join with an empty right side: all left rows unmatched
    left = rd.from_pandas(
        pd.DataFrame({"k": ["a"], "t": np.array([5], dtype="int64"),
                      "lv": [1]})
    )
    right = rd.from_pandas(
        pd.DataFrame({"k": ["a"], "t": np.array([3], dtype="int64"),
                      "rv": [9]})
    ).filter(expr="t > 100")
    out = asof_join(left, right, by="k", on="t").to_pandas()
    assert len(out) == 1 and pd.isna(out.rv.iloc[0])

    bands = pd.DataFrame(
        {"lo": [0.0], "hi": [None], "band": ["all"]}
    )
    emb_empty = rd.from_pandas(
        pd.DataFrame({"vec_id": [1], "embedding": [[0.1, 0.2]],
                      "v": [1.0]})
    ).filter(expr="vec_id > 5")
    assert range_join_broadcast(emb_empty, bands, value_col="v").count() == 0
    assert quantize_embeddings(emb_empty).count() == 0


def test_minhash_lsh_explode_empty_block(ray_session):
    """An all-empty-blocks sig dataset flows through the LSH candidate
    explode (the (0,0) sig-matrix guard)."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.dedup import (
        minhash_near_dups,
    )

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
    ).repartition(8)  # most blocks empty
    out = minhash_near_dups(docs, threshold=0.9).to_pandas()
    assert len(out) == 1  # the twin pair survives the empty blocks
