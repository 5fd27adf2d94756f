"""PipelineSpec, stage registry, OTTL-style statements."""

import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.pipelines.config import (
    PipelineSpec,
    apply_statements,
    parse_statement,
    register_stage,
)


def test_parse_set_statement():
    fn = parse_statement('set(processor_event, "metric")')
    t = fn(pa.table({"x": [1, 2]}))
    assert t["processor_event"].to_pylist() == ["metric", "metric"]


def test_set_replaces_existing():
    fn = parse_statement('set(x, "new")')
    t = fn(pa.table({"x": ["old", "old"]}))
    assert t["x"].to_pylist() == ["new", "new"]


def test_parse_concat_statement():
    # data_stream.dataset = Concat([metricset, interval], ".")
    # (elasticapmconnector config.go:173-177)
    fn = parse_statement('concat(dataset, [name, interval], ".")')
    t = fn(pa.table({"name": ["svc"], "interval": ["1m"]}))
    assert t["dataset"].to_pylist() == ["svc.1m"]


def test_unparseable_statement_raises():
    with pytest.raises(ValueError):
        parse_statement("delete_everything()")


def test_spec_validation_fails_fast():
    with pytest.raises(ValueError):
        PipelineSpec(stages=("parse", "nope"))
    with pytest.raises(ValueError):
        PipelineSpec(intervals=("bogus",))
    with pytest.raises(ValueError):
        PipelineSpec(statements=("garbage",))


def test_spec_builds_and_aggregates(ray_session, sf_dir):
    from opentelemetry_collector_components_ray.sources import read_transcripts

    spec = PipelineSpec(
        statements=('set(processor_event, "metric")',)
    )
    routed = spec.build(read_transcripts(sf_dir))
    df = routed.to_pandas()
    assert "sink" in df.columns and len(df) > 0
    agg = spec.aggregate(read_transcripts(sf_dir).map_batches(
        lambda t: t, batch_format="pyarrow"
    ))
    # need enriched input for aggregate; use the built pipeline instead
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    agg = spec.aggregate(enriched_transcripts(sf_dir)).to_pandas()
    assert (agg.processor_event == "metric").all()
    assert set(agg["interval"]) == {"1h", "24h"}


def test_spec_from_dict_roundtrip():
    cfg = {
        "stages": ["parse", "enrich", "route"],
        "intervals": ["1h", "24h"],
        "statements": ['set(processor_event, "metric")'],
        "batch_size": 1024,
    }
    spec = PipelineSpec.from_dict(cfg)
    assert spec.stages == ("parse", "enrich", "route")
    assert spec.batch_size == 1024


def test_spec_from_dict_rejects_unknown_keys():
    with pytest.raises(ValueError):
        PipelineSpec.from_dict({"stages": ["parse"], "bogus": 1})
    with pytest.raises(ValueError):
        PipelineSpec.from_dict({"intervals": ["never"]})


def test_register_custom_stage(ray_session, sf_dir):
    import ray.data as rd

    def shout(ds: rd.Dataset, batch_size=None) -> rd.Dataset:
        import pyarrow.compute as pc

        return ds.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("role"),
                "role",
                pc.utf8_upper(t["role"]),
            ),
            batch_format="pyarrow",
        )

    try:
        register_stage("shout", shout)
    except ValueError:
        pass  # already registered from a prior test run in-session
    from opentelemetry_collector_components_ray.sources import read_transcripts

    spec = PipelineSpec(stages=("parse", "shout"))
    df = spec.build(read_transcripts(sf_dir)).to_pandas()
    assert set(df.role.unique()) <= {"USER", "ASSISTANT", "SYSTEM", "TOOL"}


def test_registered_one_arg_stage_builds(ray_session):
    """A user stage matching the plain Callable[[Dataset], Dataset]
    shape must not TypeError at build time (round-1 advice finding)."""
    import ray.data as rd

    from opentelemetry_collector_components_ray.pipelines import config as cfg

    name = "test_one_arg_stage"
    if name not in cfg._REGISTRY:
        cfg.register_stage(
            name, lambda ds: ds.map_batches(lambda t: t, batch_format="pyarrow")
        )
    spec = cfg.PipelineSpec(stages=("parse", name))
    from opentelemetry_collector_components_ray.sources import read_transcripts

    out = spec.build(read_transcripts("/root/testdata/sf0.001"))
    assert out.count() > 0
