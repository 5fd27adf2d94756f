"""Enrich stage: oracle parity + unit cases for the derivation ladders."""

import pyarrow as pa

from conftest import assert_frames_equal
from opentelemetry_collector_components_ray.functions.lookups import (
    ROLE_MAP,
    TOOL_CATALOG,
)
from opentelemetry_collector_components_ray.stages.enrich import (
    enrich_scalar_batch,
    sanitize_name,
)
from opentelemetry_collector_components_ray.stages.parse import parse_batch


def test_enrich_matches_oracle(enriched_ds, oracle, cte_prefix):
    got = enriched_ds.to_pandas()
    want = oracle.execute(f"{cte_prefix} SELECT * FROM enriched").df()
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def _parsed(texts, roles=None, tools=None):
    n = len(texts)
    return parse_batch(
        pa.table(
            {
                "conv_id": ["c"] * n,
                "turn_idx": pa.array(range(n), pa.int32()),
                "role": roles or ["user"] * n,
                "text": texts,
                "tool": tools or [""] * n,
                "ts": pa.array([0] * n, pa.timestamp("us")),
            }
        )
    )


def test_outcome_ladder():
    # mirrors span.go:521-547: error ⇒ failure; >=500 ⇒ failure;
    # no status ⇒ unknown; else success
    t = enrich_scalar_batch(
        _parsed(
            [
                "status=200 latency_ms=1",
                "status=404 latency_ms=1",
                "status=500 latency_ms=1",
                "tool=x status=200 latency_ms=1 error: boom",
                "no tokens here",
            ]
        )
    )
    assert t["event_outcome"].to_pylist() == [
        "success",
        "success",
        "failure",
        "failure",
        "unknown",
    ]
    assert t["result_class"].to_pylist() == [
        "HTTP 2xx",
        "HTTP 4xx",
        "HTTP 5xx",
        "HTTP 2xx",
        "unknown",
    ]


def test_duration_us():
    t = enrich_scalar_batch(_parsed(["latency_ms=250 status=200", "none"]))
    assert t["duration_us"].to_pylist() == [250000, None]


def test_sanitize_name():
    # resource.go:297-307: [^a-zA-Z0-9 _-] -> '_', truncate 100
    arr = sanitize_name(pa.array(["a:b/c%d e-f_g", "x" * 200]))
    assert arr.to_pylist()[0] == "a_b_c_d e-f_g"
    assert len(arr.to_pylist()[1]) == 100


def test_lookup_defaults_for_unknown_keys():
    out = TOOL_CATALOG.lookup(pa.array(["sql", "zzz-not-a-tool", ""]))
    assert out["tool_category"].to_pylist() == ["code", "unknown", ""]
    assert out["is_external"].to_pylist() == [False, False, False]
    out = ROLE_MAP.lookup(pa.array(["tool", "martian"]))
    assert out["role_group"].to_pylist() == ["machine", "unknown"]
    assert out["agent_name"].to_pylist() == ["tool-runner", "unknown"]


def test_actor_pool_lookup_matches_stateless(ray_session, sf_dir):
    """The actor-pool path (broadcast refs resolved in __init__) and the
    stateless path produce identical output."""
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.enrich import enrich_stage
    from opentelemetry_collector_components_ray.stages.parse import parse_stage

    parsed = parse_stage(read_transcripts(sf_dir))
    a = (
        enrich_stage(parsed, use_actor_pool=True, lookup_concurrency=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        enrich_stage(parsed, use_actor_pool=False)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_lookup_sql_case_matches_python(oracle):
    # the generated CASE expression and the vectorized lookup agree
    keys = list(TOOL_CATALOG.rows) + ["nope"]
    got = TOOL_CATALOG.lookup(pa.array(keys))["tool_category"].to_pylist()
    case = TOOL_CATALOG.sql_case("k", "tool_category")
    want = [
        oracle.execute(f"SELECT {case} FROM (SELECT '{k}' AS k)").fetchone()[0]
        for k in keys
    ]
    assert got == want


def test_dispatch_enrich_partitions_and_rejects_unknown(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pytest
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.enrich import (
        dispatch_enrich,
    )

    t = pa.table({"role": ["user", "tool", "user"], "x": [1, 2, 3]})

    def mode_fn(batch):
        return pc.if_else(
            pc.equal(batch["role"], "tool"),
            pa.scalar("apm"),
            pa.scalar("otel"),
        )

    def mk(tag):
        def fn(batch):
            return batch.append_column(
                "m", pa.array([tag] * batch.num_rows)
            )

        return fn

    out = (
        dispatch_enrich(
            rd.from_arrow(t), {"apm": mk("A"), "otel": mk("O")}, mode_fn
        )
        .to_pandas()
        .sort_values("x")
    )
    assert out.m.tolist() == ["O", "A", "O"]

    with pytest.raises(Exception):
        dispatch_enrich(
            rd.from_arrow(t), {"apm": mk("A")}, mode_fn
        ).materialize()


def test_parse_user_agent_families():
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages.enrich import (
        parse_user_agent_batch,
    )

    ua = pa.array(
        [
            "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 "
            "Chrome/120.0.0 Safari/537.36",
            # Edge token must win over the embedded Chrome token
            "Mozilla/5.0 Chrome/120.0.0 Safari/537.36 Edg/121.2",
            "Mozilla/5.0 Chrome/120.0.0 Safari/537.36 OPR/106.5",
            "Mozilla/5.0 (X11) Gecko/20100101 Firefox/115.3",
            "Mozilla/5.0 (Macintosh) Version/17.1 Safari/605.1",
            "curl/8.4",
            "python-requests/2.31",
            "Googlebot/2.1 (+http://www.google.com/bot.html)",
            "CompletelyUnknown/9",
        ]
    )
    name, version = parse_user_agent_batch(ua)
    assert name.to_pylist() == [
        "Chrome", "Edge", "Opera", "Firefox", "Safari", "curl",
        "python-requests", "Googlebot", "Other",
    ]
    assert version.to_pylist() == [
        "120.0", "121.2", "106.5", "115.3", "17.1", "8.4", "2.31",
        "2.1", None,
    ]


def test_span_dest_default_port_normalization():
    """span.go:674-784 + schemeDefaultPort: implicit default port is
    APPENDED to the resource; explicit default port is STRIPPED from
    the service-name URL; non-default ports pass through."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages.enrich import (
        enrich_span_dest_batch,
    )

    urls = [
        "https://h.example",        # implicit 443 -> resource h:443
        "https://h.example:443",    # explicit 443 -> name strips port
        "http://h.example:8080",    # non-default -> verbatim
        "http://h.example",         # implicit 80
        "https://h.example:80",     # explicit NON-default for https
        None,                       # no url -> no branch
    ]
    t = pa.table({"url_full": pa.array(urls, pa.string())})
    out = enrich_span_dest_batch(t).to_pandas()

    assert list(out["span_destination_service_resource"][:5]) == [
        "h.example:443", "h.example:443", "h.example:8080",
        "h.example:80", "h.example:80",
    ]
    assert list(out["span_destination_service_name"][:5]) == [
        "https://h.example", "https://h.example", "http://h.example:8080",
        "http://h.example", "https://h.example:80",
    ]
    assert list(out["destination_port"][:5]) == [443, 443, 8080, 80, 80]
    assert list(out["service_target_type"][:5]) == ["http"] * 5
    assert out["service_target_name"][0] == "h.example:443"
    # null url: nothing set
    last = out.iloc[5]
    assert last[["service_target_type", "service_target_name",
                 "destination_address", "span_destination_service_type",
                 "span_destination_service_resource"]].isna().all()


def test_span_dest_branch_ladder_and_peer():
    """db > messaging > rpc ladder with peer.service/address overrides
    (span.go:623-728)."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages.enrich import (
        enrich_span_dest_batch,
    )

    t = pa.table(
        {
            "db_system": pa.array(["mysql", None, None, None], pa.string()),
            "db_name": pa.array(["orders", None, None, None], pa.string()),
            "messaging_system": pa.array(
                [None, "kafka", None, None], pa.string()),
            "messaging_destination": pa.array(
                [None, "q1", None, None], pa.string()),
            "messaging_temp": pa.array(
                [False, True, False, False], pa.bool_()),
            "rpc_system": pa.array([None, None, "grpc", None], pa.string()),
            "rpc_service": pa.array([None, None, "S", None], pa.string()),
            "peer_service": pa.array(
                ["p", "p", None, "p"], pa.string()),
            "peer_address": pa.array(
                [None, "1.2.3.4", None, None], pa.string()),
            "url_full": pa.array(
                [None, None, None, "http://x"], pa.string()),
        }
    )
    out = enrich_span_dest_batch(t).to_pandas()
    assert list(out["service_target_type"]) == [
        "mysql", "kafka", "grpc", "http"]
    # temp messaging destination withheld from target name -> peer
    assert list(out["service_target_name"]) == ["orders", "p", "S", "x:80"]
    # destination resource: peer, peerAddress override + '/q1', rpc svc,
    # http details resource ignored when peer present
    assert list(out["span_destination_service_resource"]) == [
        "p", "1.2.3.4/q1", "S", "p"]
    assert out["span_destination_service_name"][3] == "p"


def test_enrich_kernels_accept_null_typed_columns():
    """All-null pandas object columns arrive as Arrow null-typed arrays
    (seen on small blocks where a rare field never fires); the kernels
    must cast them instead of crashing in fill_null."""
    from opentelemetry_collector_components_ray.stages.enrich import (
        enrich_resource_batch,
        enrich_span_dest_batch,
    )

    n = 3
    t = pa.table(
        {
            "url_full": pa.array(["http://x", None, None], pa.string()),
            "span_kind": pa.nulls(n),
            "genai_system": pa.nulls(n),
            "parent_span_id": pa.nulls(n),
            "os_type": pa.nulls(n),
            "telemetry_sdk_name": pa.nulls(n),
        }
    )
    out = enrich_span_dest_batch(t)
    assert out.num_rows == n
    assert out["span_type"][0].as_py() == "external"
    out2 = enrich_resource_batch(t)
    assert out2.num_rows == n
    assert out2["agent_name_full"][0].as_py() == "otlp"


def test_normalize_span_attrs_component_url_and_fallbacks():
    """normalizeAttributes + buildURLFromComponents (span.go:447-469,
    786-828): url built from target/host components; colon-bearing
    peer.address rejected unless an IP literal; grpc status implies
    rpc.system."""
    from opentelemetry_collector_components_ray.stages.enrich import (
        normalize_span_attrs_batch,
    )

    t = pa.table(
        {
            "url_full": pa.array([None, None, None, None], pa.string()),
            "http_target": pa.array(
                ["/a?b=1", None, None, None], pa.string()),
            "url_path": pa.array([None, "/p", "/q", None], pa.string()),
            "url_query": pa.array([None, "z=2", None, None], pa.string()),
            "url_scheme": pa.array(
                [None, "https", None, None], pa.string()),
            "http_host": pa.array(["hh", None, None, None], pa.string()),
            "url_domain": pa.array([None, "dom", None, None], pa.string()),
            "url_port": pa.array([None, 8443, None, None], pa.int64()),
            "server_address": pa.array([None] * 4, pa.string()),
            "server_port": pa.array([None, None, 9, None], pa.int64()),
            "peer_address": pa.array(
                [None, None, "db.internal", "redis:6379"], pa.string()),
            "net_peer_ip": pa.array(
                [None, None, None, "10.1.1.1"], pa.string()),
            "rpc_system": pa.array([None] * 4, pa.string()),
            "grpc_status": pa.array(
                [None, None, None, "Unavailable"], pa.string()),
        }
    )
    out = normalize_span_attrs_batch(t).to_pandas()
    assert list(out["url_full"]) == [
        "http://hh/a?b=1",
        "https://dom:8443/p?z=2",
        "http://db.internal:9/q",
        None,  # no target at all -> no URL built
    ]
    # peer.address accepted when colon-free; connection string rejected
    assert list(out["server_address"]) == [
        None, None, "db.internal", "10.1.1.1"]
    assert list(out["rpc_system"]) == [None, None, None, "grpc"]


def test_span_dispatch_and_message_queue_split():
    """isElasticTransaction (span.go:1043-1059) keys processor.event,
    the message queue attr (span.go:555-572) and span.action
    (span.go:549-553); exit-root client spans refine transaction.type
    (span.go:434-445)."""
    from opentelemetry_collector_components_ray.stages.enrich import (
        enrich_span_dest_batch,
    )

    t = pa.table(
        {
            # row0: root server txn w/ messaging; row1: child client
            # span w/ messaging; row2: root client exit span (db);
            # row3: child internal span
            "parent_span_id": pa.array(
                [None, "p1", None, "p3"], pa.string()),
            "span_kind": pa.array(
                ["server", "client", "client", "internal"], pa.string()),
            "messaging_system": pa.array(
                ["kafka", "kafka", None, None], pa.string()),
            "messaging_destination": pa.array(
                ["q0", "q1", None, None], pa.string()),
            "messaging_operation": pa.array(
                ["process", "send", None, None], pa.string()),
            "db_system": pa.array([None, None, "mysql", None], pa.string()),
        }
    )
    out = enrich_span_dest_batch(t).to_pandas()
    assert list(out["processor_event"]) == [
        "transaction", "span", "transaction", "span"]
    assert list(out["txn_message_queue_name"]) == ["q0", None, None, None]
    assert list(out["span_message_queue_name"]) == [None, "q1", None, None]
    # span.action only on the span shape (incl. exit root spans)
    assert list(out["span_action"]) == [None, "send", None, None]
    # exit-root client span refines transaction.type from span type
    assert out["txn_type"][2] == "db.mysql"
    assert out["txn_type"][0] == "messaging"


def test_log_error_enrichment_matches_reference_ladder():
    """log.go:61-129: [EMPTY] message default, handled = NOT escaped,
    md5 grouping key over type+message+stacktrace, event kind/type;
    scope.go:28-36 service.framework."""
    import hashlib

    from opentelemetry_collector_components_ray.stages.enrich import (
        enrich_log_error_batch,
    )

    t = pa.table(
        {
            "exception_type": pa.array(
                ["Boom", None, None], pa.string()),
            "exception_message": pa.array([None, "m", None], pa.string()),
            "exception_stacktrace": pa.array(
                ["st", None, "ignored"], pa.string()),
            "exception_escaped": pa.array(
                [True, False, False], pa.bool_()),
            "scope_name": pa.array(["express", None, ""], pa.string()),
            "scope_version": pa.array([None, "1", "2"], pa.string()),
        }
    )
    out = enrich_log_error_batch(t).to_pandas()
    assert list(out["error_exception_message"]) == ["[EMPTY]", "m", None]
    assert list(out["error_exception_handled"].fillna(-1)) == [0, 1, -1]
    assert out["error_grouping_key"][0] == hashlib.md5(
        b"Boom[EMPTY]st").hexdigest()
    assert out["error_grouping_key"][1] == hashlib.md5(b"m").hexdigest()
    assert list(out["event_kind"]) == ["event", "event", None]
    assert list(out["event_type"]) == ["error", "error", None]
    # version written (empty-string default) only when a name exists
    assert list(out["service_framework_name"]) == ["express", None, None]
    assert list(out["service_framework_version"]) == ["", None, None]
