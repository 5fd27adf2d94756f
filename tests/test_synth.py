"""Transcript synthesis: determinism, schema, ordering invariants."""

import pyarrow as pa
import pyarrow.parquet as pq

from opentelemetry_collector_components_ray import schema
from opentelemetry_collector_components_ray.synth import (
    TRANSCRIPTS_SQL,
    materialize_transcripts,
)


def test_schema_matches_input_hint(sf_dir):
    t = pq.read_table(materialize_transcripts(sf_dir))
    assert t.schema.names == schema.TRANSCRIPT.names
    for f in schema.TRANSCRIPT:
        assert t.schema.field(f.name).type == f.type, f.name


def test_matches_oracle_rederivation(sf_dir, oracle):
    """The cached parquet equals the oracle's CTE re-derivation exactly."""
    t = pq.read_table(materialize_transcripts(sf_dir))
    t2 = oracle.execute(
        f"SELECT * FROM ({TRANSCRIPTS_SQL}) ORDER BY conv_id, turn_idx"
    ).arrow()
    assert t.equals(t2.cast(t.schema).combine_chunks())


def test_turn_idx_contiguous_unique(sf_dir):
    df = pq.read_table(materialize_transcripts(sf_dir)).to_pandas()
    for conv, g in df.groupby("conv_id"):
        assert list(g.sort_values("turn_idx")["turn_idx"]) == list(
            range(len(g))
        ), conv


def test_roles_and_tools_valid(sf_dir):
    df = pq.read_table(materialize_transcripts(sf_dir)).to_pandas()
    assert set(df.role.unique()) <= set(schema.ROLES)
    tool_rows = df[df.role == "tool"]
    assert (tool_rows.tool != "").all()
    assert (df[df.role != "tool"].tool == "").all()


def test_idempotent_cache(sf_dir):
    p1 = materialize_transcripts(sf_dir)
    p2 = materialize_transcripts(sf_dir)
    assert p1 == p2


def test_skewed_transcripts_hot_fraction(sf_dir):
    import duckdb

    from opentelemetry_collector_components_ray.synth import (
        materialize_scaled_transcripts,
        materialize_skewed_transcripts,
    )

    plain = materialize_scaled_transcripts(sf_dir, 2)
    skew = materialize_skewed_transcripts(sf_dir, 2, hot_every=10)
    con = duckdb.connect()
    n_plain, = con.execute(
        f"SELECT count(*) FROM read_parquet('{plain}/*.parquet')"
    ).fetchone()
    n_skew, hot = con.execute(
        "SELECT count(*), "
        "sum(CASE WHEN conv_id = 'conv-hot' THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{skew}/*.parquet')"
    ).fetchone()
    con.close()
    # same corpus size; the hot conversation holds ~1/10 of all rows
    assert n_skew == n_plain
    assert 0.08 <= hot / n_skew <= 0.12
    # deterministic: a re-materialization is byte-identical in content
    assert materialize_skewed_transcripts(sf_dir, 2, hot_every=10) == skew
