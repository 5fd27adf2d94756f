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


def _t():
    import pyarrow as pa

    return pa.table(
        {
            "role": ["user", "tool", "assistant"],
            "tool": ["", "search", ""],
            "n": [1, 5, 9],
            "note": ["alpha beta", "gamma!!", "x" * 50],
        }
    )


def test_ottl_set_literals_and_paths():
    from opentelemetry_collector_components_ray.pipelines.config import (
        parse_statement,
    )

    out = parse_statement('set(kind, "metric")')(_t())
    assert out["kind"].to_pylist() == ["metric"] * 3
    out = parse_statement("set(m, n)")(_t())
    assert out["m"].to_pylist() == [1, 5, 9]
    out = parse_statement("set(x, 2.5)")(_t())
    assert out["x"].to_pylist() == [2.5] * 3


def test_ottl_where_masks_rows():
    from opentelemetry_collector_components_ray.pipelines.config import (
        parse_statement,
    )

    out = parse_statement('set(role, "bot") where n >= 5')(_t())
    assert out["role"].to_pylist() == ["user", "bot", "bot"]
    out = parse_statement(
        'set(flag, "hot") where role == "tool" and n > 1'
    )(_t())
    assert out["flag"].to_pylist() == [None, "hot", None]
    out = parse_statement('set(flag, "e") where n > 8 or role == "user"')(
        _t()
    )
    assert out["flag"].to_pylist() == ["e", None, "e"]


def test_ottl_editors():
    import pytest as _pytest

    from opentelemetry_collector_components_ray.pipelines.config import (
        parse_statement,
    )

    assert "tool" not in parse_statement("delete_key(tool)")(
        _t()
    ).column_names
    out = parse_statement("keep_keys([role, n])")(_t())
    assert out.column_names == ["role", "n"]
    out = parse_statement("truncate_all(6)")(_t())
    assert out["note"].to_pylist() == ["alpha ", "gamma!", "xxxxxx"]
    out = parse_statement('replace_pattern(note, "[!]+", ".")')(_t())
    assert out["note"].to_pylist()[1] == "gamma."
    with _pytest.raises(ValueError):
        parse_statement('delete_key(tool) where n > 1')


def test_ottl_converters():
    from opentelemetry_collector_components_ray.pipelines.config import (
        parse_statement,
    )

    out = parse_statement(
        'set(svc, Concat([role, tool], ":"))'
    )(_t())
    assert out["svc"].to_pylist() == ["user:", "tool:search", "assistant:"]
    out = parse_statement('set(h, Substring(note, 0, 5))')(_t())
    assert out["h"].to_pylist()[0] == "alpha"
    out = parse_statement("set(d, Double(n))")(_t())
    assert out["d"].to_pylist() == [1.0, 5.0, 9.0]
    out = parse_statement('set(i, Int(2.0))')(_t())
    assert out["i"].to_pylist() == [2] * 3


def test_ottl_rejects_out_of_subset():
    import pytest as _pytest

    from opentelemetry_collector_components_ray.pipelines.config import (
        parse_statement,
    )

    for bad in (
        'limit(attributes, 10, [])',
        'set(x, Unknown(y))',
        'set(x, "a") where',
        'set(x "a")',
        'set(x, "a") extra',
    ):
        with _pytest.raises(ValueError):
            parse_statement(bad)


def test_demo_statements_sequential_semantics():
    """stmt 8's where must see the tool column AFTER stmt 7 rewrote
    empty tools to 'none' (sequential statement application)."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.pipelines.config import (
        DEMO_STATEMENTS,
        parse_statement,
    )

    t = pa.table({
        "conv_id": pa.array(["c1", "c2"]),
        "turn_idx": pa.array([5, 12], pa.int32()),
        "role": pa.array(["assistant", "tool"]),
        "tool": pa.array(["", "search"]),
        "text": pa.array(["x" * 60, "short"]),
        "ts": pa.array([0, 1], pa.timestamp("us")),
    })
    for s in DEMO_STATEMENTS:
        t = parse_statement(s)(t)
    d = t.to_pydict()
    assert d["tool"] == ["none", "search"]
    assert d["label"] == [None, "tool:search"]       # where ran post-rewrite
    assert d["tier"] == ["gold", "std"]
    assert d["half_turn"] == [None, 12]
    assert d["text"][0] == "x" * 40                  # truncate_all
    assert d["conv_turn"] == ["c1-5", "c2-12"]
    assert "ts" not in d                             # keep_keys dropped it


def test_parse_len_converter():
    fn = parse_statement("set(n, Len(text))")
    t = fn(pa.table({"text": ["abc", "", "hello"]}))
    assert t["n"].to_pylist() == [3, 0, 5]


def test_parse_ismatch_condition():
    fn = parse_statement(
        'set(kind, "compute") where IsMatch(tool, "^(calc|py)")'
    )
    t = fn(pa.table({"tool": ["calculator", "search", "python"]}))
    assert t["kind"].to_pylist() == ["compute", None, "compute"]


def test_parse_len_comparison_condition():
    fn = parse_statement('set(long, "y") where Len(text) > 3')
    t = fn(pa.table({"text": ["ab", "abcd"]}))
    assert t["long"].to_pylist() == [None, "y"]


def test_parse_delete_matching_keys():
    fn = parse_statement('delete_matching_keys("^tmp_")')
    t = fn(pa.table({"a": [1], "tmp_x": [2], "tmp_y": [3]}))
    assert t.column_names == ["a"]


def test_parse_limit_priority_keys():
    fn = parse_statement("limit(2, [c])")
    t = fn(pa.table({"a": [1], "b": [2], "c": [3]}))
    # priority key c survives; then schema order fills to n=2
    assert t.column_names == ["a", "c"]


def test_limit_where_rejected():
    with pytest.raises(ValueError):
        parse_statement('limit(2, [a]) where x == "y"')


def test_render_template_substitution_and_unknown():
    from opentelemetry_collector_components_ray.pipelines.config import (
        render_template,
    )

    assert render_template("a {{x}} b {{ y }}", {"x": "1", "y": "2"}) \
        == "a 1 b 2"
    with pytest.raises(ValueError):
        render_template("{{missing}}", {})


def test_load_pipeline_yaml_defaults_and_overrides(tmp_path):
    from opentelemetry_collector_components_ray.pipelines.config import (
        load_pipeline_yaml,
    )

    yml = tmp_path / "p.yaml"
    yml.write_text(
        "parameters:\n"
        "  short: 1h\n"
        "pipeline:\n"
        "  stages: [parse, enrich, route]\n"
        '  intervals: ["{{short}}", 24h]\n'
        "  statements:\n"
        "    - 'set(tier, \"gold\") where role == \"assistant\"'\n"
        "  batch_size: 1024\n"
    )
    spec = load_pipeline_yaml(str(yml))
    assert spec.intervals == ("1h", "24h")
    assert spec.batch_size == 1024
    spec2 = load_pipeline_yaml(str(yml), {"short": "1m"})
    assert spec2.intervals == ("1m", "24h")


def test_load_pipeline_yaml_rejects_bad_statement(tmp_path):
    from opentelemetry_collector_components_ray.pipelines.config import (
        load_pipeline_yaml,
    )

    yml = tmp_path / "bad.yaml"
    yml.write_text(
        "pipeline:\n"
        "  statements: ['drop_everything()']\n"
    )
    with pytest.raises(ValueError):
        load_pipeline_yaml(str(yml))


def test_parse_convertcase_and_trim():
    fn = parse_statement('set(up, ConvertCase(role, "upper"))')
    t = fn(pa.table({"role": ["user", "tool"]}))
    assert t["up"].to_pylist() == ["USER", "TOOL"]
    fn2 = parse_statement("set(clean, Trim(txt))")
    t2 = fn2(pa.table({"txt": ["  a b  ", "c"]}))
    assert t2["clean"].to_pylist() == ["a b", "c"]
    with pytest.raises(ValueError):
        parse_statement('set(x, ConvertCase(role, "snake"))')


# --- round-5 OTTL tier: merge_maps / replace_all_patterns / String / MD5


def test_merge_maps_insert_fills_nulls_and_creates():
    fn = parse_statement('merge_maps("m1_", "m2_", "insert")')
    t = fn(
        pa.table(
            {
                "m1_a": ["keep", None],
                "m2_a": ["fill", "fill"],
                "m2_b": ["new", "new"],
            }
        )
    )
    assert t["m1_a"].to_pylist() == ["keep", "fill"]
    assert t["m1_b"].to_pylist() == ["new", "new"]
    # source map untouched (func_merge_maps.go mutates only target)
    assert t["m2_a"].to_pylist() == ["fill", "fill"]


def test_merge_maps_update_overwrites_existing_only():
    fn = parse_statement('merge_maps("m1_", "m2_", "update")')
    t = fn(
        pa.table(
            {
                "m1_a": ["old", None],
                "m2_a": ["src", "src"],
                "m2_b": ["never", "never"],
            }
        )
    )
    # non-null dst cells overwritten, null cells (missing key) kept
    assert t["m1_a"].to_pylist() == ["src", None]
    # update never creates keys
    assert "m1_b" not in t.column_names


def test_merge_maps_upsert_overwrites_and_creates():
    fn = parse_statement('merge_maps("m1_", "m2_", "upsert")')
    t = fn(pa.table({"m1_a": ["old", None], "m2_a": ["s", "s"]}))
    assert t["m1_a"].to_pylist() == ["s", "s"]


def test_merge_maps_respects_where():
    fn = parse_statement(
        'merge_maps("m1_", "m2_", "upsert") where flag == "y"'
    )
    t = fn(
        pa.table(
            {
                "flag": ["y", "n"],
                "m1_a": ["old", "old"],
                "m2_a": ["s", "s"],
            }
        )
    )
    assert t["m1_a"].to_pylist() == ["s", "old"]


def test_merge_maps_rejects_bad_strategy():
    with pytest.raises(ValueError):
        parse_statement('merge_maps("a_", "b_", "replace")')


def test_replace_all_patterns_value_mode():
    fn = parse_statement('replace_all_patterns("value", "zz+", "Q")')
    t = fn(pa.table({"s": ["azz", "bzzz"], "n": [1, 2], "u": ["x", "y"]}))
    assert t["s"].to_pylist() == ["aQ", "bQ"]
    assert t["u"].to_pylist() == ["x", "y"]
    assert t["n"].to_pylist() == [1, 2]  # non-string columns untouched


def test_replace_all_patterns_key_mode_renames():
    fn = parse_statement('replace_all_patterns("key", "^tmp_", "p_")')
    t = fn(pa.table({"tmp_a": [1], "keep": [2]}))
    assert t.column_names == ["p_a", "keep"]


def test_replace_all_patterns_key_mode_rejects_where():
    with pytest.raises(ValueError):
        parse_statement(
            'replace_all_patterns("key", "a", "b") where x == "y"'
        )


def test_replace_all_patterns_rejects_bad_mode():
    with pytest.raises(ValueError):
        parse_statement('replace_all_patterns("both", "a", "b")')


def test_substring_rejects_negative_args():
    with pytest.raises(ValueError):
        parse_statement("set(x, Substring(y, -1, 3))")
    with pytest.raises(ValueError):
        parse_statement("set(x, Substring(y, 0, -3))")


def test_md5_converter_matches_hashlib():
    import hashlib

    fn = parse_statement("set(h, MD5(s))")
    vals = ["hello", "", "ray data"]
    t = fn(pa.table({"s": vals}))
    assert t["h"].to_pylist() == [
        hashlib.md5(v.encode()).hexdigest() for v in vals
    ]


def test_string_converter_casts():
    fn = parse_statement("set(s, String(n))")
    t = fn(pa.table({"n": [1, 42]}))
    assert t["s"].to_pylist() == ["1", "42"]


# --- round-5: OTTL context paths (processor_test.go:77-80 shapes) ---


def test_context_paths_reference_statements_verbatim():
    # the reference's own lsminterval test statements
    # (lsmintervalprocessor/processor_test.go:77-80), addressing
    # dot-flattened attribute columns
    stmts = [
        'set(resource.attributes["custom_res_attr"], "res")',
        'set(instrumentation_scope.attributes["custom_scope_attr"],'
        ' "scope")',
        'set(attributes["custom_dp_attr"], "dp")',
        'set(resource.attributes["dependent_attr"],'
        ' Concat([attributes["aaa"], "dependent"], "-"))',
    ]
    t = pa.table({"attributes.aaa": ["a1", "a2"]})
    for s in stmts:
        t = parse_statement(s)(t)
    assert t["resource.attributes.custom_res_attr"].to_pylist() == [
        "res", "res",
    ]
    assert t[
        "instrumentation_scope.attributes.custom_scope_attr"
    ].to_pylist() == ["scope", "scope"]
    assert t["attributes.custom_dp_attr"].to_pylist() == ["dp", "dp"]
    assert t["resource.attributes.dependent_attr"].to_pylist() == [
        "a1-dependent", "a2-dependent",
    ]


def test_context_path_in_where_and_comparison():
    fn = parse_statement(
        'set(tier, "hot") where attributes["k"] == "a" and n >= 2'
    )
    t = fn(pa.table({"attributes.k": ["a", "a", "b"], "n": [1, 2, 3]}))
    assert t["tier"].to_pylist() == [None, "hot", None]


def test_context_path_in_keep_keys_and_delete_key():
    t = pa.table({"attributes.a": [1], "attributes.b": [2], "c": [3]})
    t = parse_statement('delete_key(attributes["b"])')(t)
    assert t.column_names == ["attributes.a", "c"]
    t = parse_statement('keep_keys([attributes["a"]])')(t)
    assert t.column_names == ["attributes.a"]


def test_dotted_name_without_subscript_is_a_column():
    fn = parse_statement('set(out, metric.name)')
    t = fn(pa.table({"metric.name": ["m1", "m2"]}))
    assert t["out"].to_pylist() == ["m1", "m2"]


def test_subscript_requires_string_key_lists_still_parse():
    # `[` after a name is a subscript ONLY when followed by a string;
    # plain value lists (concat/keep_keys) are unaffected
    fn = parse_statement('concat(out, [a, b], "-")')
    t = fn(pa.table({"a": ["x"], "b": ["y"]}))
    assert t["out"].to_pylist() == ["x-y"]
    with pytest.raises(ValueError):
        parse_statement('set(attributes[k], "v")')


def test_time_family_converters():
    import datetime as dt

    ts = pa.array(
        [dt.datetime(2026, 8, 18, 13, 45, 7),
         dt.datetime(2026, 8, 18, 0, 0, 59)],
        pa.timestamp("us"),
    )
    t = pa.table({"ts": ts})
    t = parse_statement("set(h, Hour(ts))")(t)
    t = parse_statement("set(u, UnixSeconds(ts))")(t)
    t = parse_statement('set(tr, TruncateTime(ts, "1h"))')(t)
    t = parse_statement('set(f, FormatTime(ts, "%Y-%m-%d"))')(t)
    assert t["h"].to_pylist() == [13, 0]
    assert t["u"].to_pylist() == [
        int(dt.datetime(2026, 8, 18, 13, 45, 7,
                        tzinfo=dt.timezone.utc).timestamp()),
        int(dt.datetime(2026, 8, 18, 0, 0, 59,
                        tzinfo=dt.timezone.utc).timestamp()),
    ]
    assert t["tr"].to_pylist() == [
        dt.datetime(2026, 8, 18, 13, 0, 0),
        dt.datetime(2026, 8, 18, 0, 0, 0),
    ]
    assert t["f"].to_pylist() == ["2026-08-18", "2026-08-18"]


def test_time_component_and_unix_converters():
    import datetime as dt

    d = dt.datetime(2026, 8, 18, 13, 45, 7, 250000)
    t = pa.table({"ts": pa.array([d], pa.timestamp("us"))})
    for stmt, expect in [
        ("set(x, Minute(ts))", 45),
        ("set(x, Second(ts))", 7),
        ("set(x, Day(ts))", 18),
        ("set(x, Month(ts))", 8),
        ("set(x, Year(ts))", 2026),
    ]:
        out = parse_statement(stmt)(t)
        assert out["x"].to_pylist() == [expect], stmt
    epoch_us = int(
        d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    for stmt, expect in [
        ("set(x, UnixMilli(ts))", epoch_us // 1000),
        ("set(x, UnixMicro(ts))", epoch_us),
        ("set(x, UnixNano(ts))", epoch_us * 1000),
    ]:
        out = parse_statement(stmt)(t)
        assert out["x"].to_pylist() == [expect], stmt
        assert out["x"].type == pa.int64()


def test_truncate_time_rejects_bad_duration():
    with pytest.raises(ValueError):
        parse_statement('set(x, TruncateTime(ts, "1 hour"))')
    with pytest.raises(ValueError):
        parse_statement('set(x, TruncateTime(ts, "h"))')
