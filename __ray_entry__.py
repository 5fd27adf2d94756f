"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Primary input: the transcript table ``(conv_id, turn_idx, role, text,
tool, ts)`` derived DETERMINISTICALLY from the driver's ``events``
table by ``synth.TRANSCRIPTS_SQL`` — the Ray side materializes it with
the same SQL text the oracle queries use as a ``WITH transcripts AS``
prefix, so both sides see byte-identical input at any sf.

No ``ray.init``/``ray.shutdown`` here (driver owns the session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from opentelemetry_collector_components_ray.stages import aggregate as _agg
from opentelemetry_collector_components_ray.stages import ann as _ann
from opentelemetry_collector_components_ray.stages import (
    conversation as _conv,
)
from opentelemetry_collector_components_ray.stages import dedup as _dedup
from opentelemetry_collector_components_ray.stages import (
    relational as _rel,
)
from opentelemetry_collector_components_ray.stages import remap as _remap
from opentelemetry_collector_components_ray.stages import (
    sampling as _sampling,
)
from opentelemetry_collector_components_ray.stages import (
    multimodal as _mm,
)
from opentelemetry_collector_components_ray.stages import (
    decontam as _decontam,
)
from opentelemetry_collector_components_ray.stages import lm as _lm
from opentelemetry_collector_components_ray.stages import packing as _packing
from opentelemetry_collector_components_ray.stages import text as _text
from opentelemetry_collector_components_ray.stages import (
    profiling as _profiling,
)
from opentelemetry_collector_components_ray.stages import substr as _substr
from opentelemetry_collector_components_ray.sources import (
    promrw as _promrw,
)
from opentelemetry_collector_components_ray.sources import (
    entity as _entity,
)
from opentelemetry_collector_components_ray.pipelines import (
    config as _pipecfg,
)
from opentelemetry_collector_components_ray.stages import enrich as _enrich_mod
from opentelemetry_collector_components_ray.stages.enrich import (
    ENRICHED_SQL,
    parse_user_agent_sql,
)
from opentelemetry_collector_components_ray.stages.parse import PARSED_SQL
from opentelemetry_collector_components_ray.stages.ratelimit import (
    rate_limit_quota_sql,
)
from opentelemetry_collector_components_ray.stages import route as _route_mod
from opentelemetry_collector_components_ray.stages.route import ROUTED_SQL
from opentelemetry_collector_components_ray import synth as _synth
from opentelemetry_collector_components_ray.synth import TRANSCRIPTS_SQL

_ENRICH_FULL_INPUTS_SQL = """SELECT conv_id, turn_idx, role, tool,
  CASE WHEN turn_idx % 4 = 0 THEN
    CASE turn_idx % 3 WHEN 0 THEN 'mysql' WHEN 1 THEN 'postgresql'
         ELSE 'redis' END END AS db_system,
  CASE WHEN turn_idx % 4 = 0 AND turn_idx % 6 <> 0
       THEN 'db_' || role END AS db_name,
  CASE WHEN turn_idx % 4 = 1 THEN
    CASE WHEN turn_idx % 2 = 0 THEN 'kafka' ELSE 'rabbitmq' END
  END AS messaging_system,
  CASE WHEN turn_idx % 4 = 1 AND turn_idx % 7 <> 1
       THEN 'queue-' || (CASE WHEN tool = '' THEN 'internal'
                              ELSE tool END) END
    AS messaging_destination,
  (turn_idx % 4 = 1 AND turn_idx % 6 = 1) AS messaging_temp,
  CASE WHEN turn_idx % 4 = 2 THEN 'grpc' END AS rpc_system,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 8 <> 2
       THEN 'svc.' || role END AS rpc_service,
  CASE WHEN (turn_idx % 4 = 3 AND turn_idx % 28 <> 3)
         OR (turn_idx % 4 = 2 AND turn_idx % 8 = 2) THEN
    (CASE WHEN turn_idx % 2 = 0 THEN 'http' ELSE 'https' END)
    || '://' || (CASE WHEN tool = '' THEN 'internal' ELSE tool END)
    || '.svc.local'
    || (CASE turn_idx % 5 WHEN 1 THEN ':8080' WHEN 2 THEN ':443'
             WHEN 3 THEN ':80' WHEN 4 THEN ':9200' ELSE '' END)
    || '/api/' || role END AS url_full,
  CASE WHEN turn_idx % 5 = 0 THEN 'peer-' || role END AS peer_service,
  CASE WHEN turn_idx % 10 = 0 THEN
    CASE WHEN turn_idx % 30 = 10 THEN 'cache:6379'
         WHEN turn_idx % 30 = 20
           THEN '2001:db8::' || CAST(turn_idx % 9 AS VARCHAR)
         ELSE '10.0.0.' || CAST(turn_idx % 9 AS VARCHAR) END
  END AS peer_address,
  CASE turn_idx % 6 WHEN 0 THEN 'linux' WHEN 1 THEN 'windows'
       WHEN 2 THEN 'darwin' WHEN 3 THEN 'aix' WHEN 4 THEN 'freebsd'
       END AS os_type,
  CASE turn_idx % 4 WHEN 0 THEN 'Android' WHEN 1 THEN 'iOS'
       WHEN 2 THEN 'Ubuntu' END AS os_name,
  CASE WHEN turn_idx % 3 <> 0 THEN 'opentelemetry'
       END AS telemetry_sdk_name,
  CASE turn_idx % 3 WHEN 0 THEN 'go' WHEN 1 THEN 'python'
       END AS telemetry_sdk_language,
  CASE WHEN turn_idx % 2 = 0
       THEN '1.' || CAST(turn_idx % 10 AS VARCHAR)
  END AS telemetry_sdk_version,
  CASE WHEN turn_idx % 5 = 0 THEN 'elastic' END AS telemetry_distro_name,
  CASE WHEN turn_idx % 10 = 0
       THEN '9.0.' || CAST(turn_idx % 7 AS VARCHAR)
  END AS telemetry_distro_version,
  CASE WHEN turn_idx % 4 = 0 THEN 'c-' || conv_id END AS container_id,
  'h-' || CAST(turn_idx % 7 AS VARCHAR) AS host_name,
  CASE WHEN turn_idx % 11 = 0
       THEN 'node-' || CAST(turn_idx % 13 AS VARCHAR)
  END AS k8s_node_name,
  CASE WHEN turn_idx % 17 = 0 THEN 'custom' END AS type_value,
  CASE WHEN turn_idx % 9 <> 0
       THEN 'span' || CAST(turn_idx % 997 AS VARCHAR)
  END AS parent_span_id,
  CASE WHEN turn_idx % 8 = 0 THEN 'prod' END AS deployment_environment,
  CASE WHEN turn_idx % 6 = 0 THEN 'staging'
  END AS deployment_environment_name,
  CASE WHEN turn_idx % 4 = 3 AND turn_idx % 28 = 3
            AND turn_idx % 3 <> 1
       THEN CASE WHEN turn_idx % 3 = 0 THEN 'openai'
                 ELSE 'anthropic' END
  END AS genai_system,
  CASE WHEN turn_idx % 4 = 3 AND turn_idx % 28 = 3
            AND turn_idx % 3 = 1 THEN 'internal'
  END AS span_kind,
  CASE WHEN turn_idx % 4 = 3 THEN
    NULLIF(CASE turn_idx % 7 WHEN 0 THEN 200 WHEN 1 THEN 301
                WHEN 2 THEN 404 WHEN 3 THEN 503 WHEN 4 THEN 101
                WHEN 5 THEN 99 ELSE 0 END, 0)
  END AS http_status,
  CASE WHEN turn_idx % 4 = 2 THEN
    CASE turn_idx % 3 WHEN 0 THEN 'OK' WHEN 1 THEN 'Internal' END
  END AS grpc_status,
  CASE turn_idx % 5 WHEN 0 THEN 'error' WHEN 1 THEN 'ok'
  END AS span_status,
  CASE WHEN turn_idx % 13 = 7 THEN NULL ELSE ts END AS ts,
  ts + INTERVAL 1 SECOND AS observed_ts,
  CASE WHEN turn_idx % 4 = 1 THEN
    CASE WHEN turn_idx % 11 = 1 THEN 'process'
         WHEN turn_idx % 11 = 5 THEN 'send' END
       WHEN turn_idx % 4 = 2 AND turn_idx % 13 = 2 THEN 'receive'
  END AS messaging_operation,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 16 = 10
       THEN '/rpc/call?x=1' END AS http_target,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 16 = 6 THEN '/m'
  END AS url_path,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 32 = 6 THEN 'x=1'
  END AS url_query,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 32 = 6 THEN 'https'
  END AS url_scheme,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 16 = 10
       THEN 'edge:8443' END AS http_host,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 16 = 6
       THEN 'rpc.backend' END AS url_domain,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 32 = 6 THEN 9090
  END AS url_port,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 16 = 14
       THEN 'grpc.server.local' END AS server_address,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 32 = 14 THEN 50051
  END AS server_port,
  CASE WHEN turn_idx % 4 = 2 AND turn_idx % 20 = 18
       THEN '192.168.1.' || CAST(turn_idx % 9 AS VARCHAR)
  END AS net_peer_ip,
  CASE WHEN turn_idx % 7 = 3 THEN
    CASE WHEN turn_idx % 14 = 3 THEN 'ValueError' ELSE 'Timeout' END
  END AS exception_type,
  CASE WHEN turn_idx % 7 = 3 AND turn_idx % 21 <> 3
       THEN 'failed: ' || role
       WHEN turn_idx % 7 = 5 AND turn_idx % 35 = 5
       THEN 'orphan message' END AS exception_message,
  CASE WHEN turn_idx % 14 = 3
       THEN 'at ' || tool || ':' || CAST(turn_idx AS VARCHAR)
  END AS exception_stacktrace,
  (turn_idx % 7 = 3 AND turn_idx % 21 = 10) AS exception_escaped,
  CASE turn_idx % 8 WHEN 1 THEN 'express' WHEN 5 THEN 'spring'
  END AS scope_name,
  CASE WHEN turn_idx % 16 = 1 THEN '4.' || CAST(turn_idx % 3 AS VARCHAR)
       WHEN turn_idx % 16 = 4 THEN '9.9' END AS scope_version
FROM transcripts"""

_CTE = (
    f"WITH transcripts AS ({TRANSCRIPTS_SQL}), "
    f"parsed AS ({PARSED_SQL}), "
    f"enriched AS ({ENRICHED_SQL})"
)


def entry() -> Any:
    """Flagship pipeline (parse→enrich→route→aggregate) on sf0.001."""
    from opentelemetry_collector_components_ray.pipelines import (
        flagship_aggregate,
    )

    return flagship_aggregate("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries / oracle pairs (SURVEY.md §2 coverage)
# ---------------------------------------------------------------------------


def _q_ndjson_multi(sf_dir: str):
    """Multi-event-type intake NDJSON decode (round-3 parity item):
    five per-type decoders behind a first-key type sniff, union schema,
    per-stream metadata fold-in (ndjsondecoder/stream.go:159-258,907).
    Input streams are synthesized deterministically from the events
    table, so the decoded union has an exact SQL twin."""
    import glob

    from opentelemetry_collector_components_ray.sources.ndjson import (
        read_ndjson_multi,
    )
    from opentelemetry_collector_components_ray.synth import (
        materialize_intake_ndjson,
    )

    d = materialize_intake_ndjson(sf_dir)
    files = sorted(glob.glob(d + "/*.ndjson"))
    return read_ndjson_multi(files)


def _q_enrich_full(sf_dir: str):
    """Round-3 enrichment breadth: span destination / service.target
    ladder (span.go:623-784, schemeDefaultPort :1082-1090) and resource
    os/agent derivations (resource.go:187-285) over deterministic
    synthesized inputs (so the oracle rebuilds them byte-identically).
    Branch assignment by turn_idx % 4: db / messaging / rpc / http."""
    import numpy as np
    import pandas as pd

    from opentelemetry_collector_components_ray.functions.blocks import (
        to_clean_arrow,
    )
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.enrich import (
        enrich_log_error_batch,
        enrich_resource_batch,
        enrich_span_dest_batch,
        normalize_span_attrs_batch,
    )

    def synth_inputs(df: pd.DataFrame):
        t = df["turn_idx"].astype("int64")
        role = df["role"].astype(str)
        tool = df["tool"].astype(str)
        conv = df["conv_id"].astype(str)
        toolh = tool.where(tool != "", "internal")
        branch = t % 4

        out = pd.DataFrame(
            {"conv_id": conv, "turn_idx": t, "role": role, "tool": tool}
        )
        dbsys = pd.Series(
            np.select([t % 3 == 0, t % 3 == 1], ["mysql", "postgresql"],
                      "redis"), index=df.index)
        out["db_system"] = dbsys.where(branch == 0, None)
        out["db_name"] = ("db_" + role).where(
            (branch == 0) & (t % 6 != 0), None)
        msys = pd.Series(np.where(t % 2 == 0, "kafka", "rabbitmq"),
                         index=df.index)
        out["messaging_system"] = msys.where(branch == 1, None)
        out["messaging_destination"] = ("queue-" + toolh).where(
            (branch == 1) & (t % 7 != 1), None)
        out["messaging_temp"] = ((branch == 1) & (t % 6 == 1))
        out["rpc_system"] = pd.Series("grpc", index=df.index).where(
            branch == 2, None)
        out["rpc_service"] = ("svc." + role).where(
            (branch == 2) & (t % 8 != 2), None)
        scheme = pd.Series(np.where(t % 2 == 0, "http", "https"),
                           index=df.index)
        portsfx = pd.Series(
            np.select([t % 5 == 1, t % 5 == 2, t % 5 == 3, t % 5 == 4],
                      [":8080", ":443", ":80", ":9200"], ""),
            index=df.index)
        url = (scheme + "://" + toolh + ".svc.local" + portsfx
               + "/api/" + role)
        has_url = ((branch == 3) & (t % 28 != 3)) | (
            (branch == 2) & (t % 8 == 2))
        out["url_full"] = url.where(has_url, None)
        out["peer_service"] = ("peer-" + role).where(t % 5 == 0, None)
        out["peer_address"] = pd.Series(
            np.select(
                [t % 30 == 10, t % 30 == 20],
                ["cache:6379", "2001:db8::" + (t % 9).astype(str)],
                "10.0.0." + (t % 9).astype(str),
            ), index=df.index).where(t % 10 == 0, None)
        out["os_type"] = pd.Series(
            np.select([t % 6 == 0, t % 6 == 1, t % 6 == 2, t % 6 == 3,
                       t % 6 == 4],
                      ["linux", "windows", "darwin", "aix", "freebsd"],
                      None), index=df.index)
        out["os_name"] = pd.Series(
            np.select([t % 4 == 0, t % 4 == 1, t % 4 == 2],
                      ["Android", "iOS", "Ubuntu"], None), index=df.index)
        out["telemetry_sdk_name"] = pd.Series(
            "opentelemetry", index=df.index).where(t % 3 != 0, None)
        out["telemetry_sdk_language"] = pd.Series(
            np.select([t % 3 == 0, t % 3 == 1], ["go", "python"], None),
            index=df.index)
        out["telemetry_sdk_version"] = ("1." + (t % 10).astype(str)).where(
            t % 2 == 0, None)
        out["telemetry_distro_name"] = pd.Series(
            "elastic", index=df.index).where(t % 5 == 0, None)
        out["telemetry_distro_version"] = (
            "9.0." + (t % 7).astype(str)).where(t % 10 == 0, None)
        out["container_id"] = ("c-" + conv).where(t % 4 == 0, None)
        out["host_name"] = "h-" + (t % 7).astype(str)
        out["k8s_node_name"] = ("node-" + (t % 13).astype(str)).where(
            t % 11 == 0, None)
        out["type_value"] = pd.Series("custom", index=df.index).where(
            t % 17 == 0, None)
        out["parent_span_id"] = (
            "span" + (t % 997).astype(str)
        ).where(t % 9 != 0, None)
        out["deployment_environment"] = pd.Series(
            "prod", index=df.index).where(t % 8 == 0, None)
        out["deployment_environment_name"] = pd.Series(
            "staging", index=df.index).where(t % 6 == 0, None)
        # no-branch rows (branch 3, no url) exercise genai / internal
        nob = (branch == 3) & (t % 28 == 3)
        out["genai_system"] = pd.Series(
            np.where(t % 3 == 0, "openai", "anthropic"), index=df.index
        ).where(nob & (t % 3 != 1), None)
        out["span_kind"] = pd.Series(
            "internal", index=df.index).where(nob & (t % 3 == 1), None)
        http_codes = pd.Series(
            np.select(
                [t % 7 == 0, t % 7 == 1, t % 7 == 2, t % 7 == 3,
                 t % 7 == 4, t % 7 == 5],
                [200, 301, 404, 503, 101, 99], 0,
            ), index=df.index)
        out["http_status"] = http_codes.where(
            (branch == 3) & (http_codes > 0), None
        ).astype("Int64")
        out["grpc_status"] = pd.Series(
            np.select([t % 3 == 0, t % 3 == 1], ["OK", "Internal"], None),
            index=df.index).where(branch == 2, None)
        out["span_status"] = pd.Series(
            np.select([t % 5 == 0, t % 5 == 1], ["error", "ok"], None),
            index=df.index)
        ts = pd.to_datetime(df["ts"])
        out["ts"] = ts.where(t % 13 != 7, pd.NaT)
        out["observed_ts"] = (
            ts + pd.Timedelta(seconds=1)
        ).astype("datetime64[us]")
        out["messaging_operation"] = pd.Series(
            np.select([t % 11 == 1, t % 11 == 5], ["process", "send"],
                      None), index=df.index
        ).where(branch == 1, None).where(
            ~((branch == 2) & (t % 13 == 2)), "receive")
        out["http_target"] = pd.Series(
            "/rpc/call?x=1", index=df.index).where(
            (branch == 2) & (t % 16 == 10), None)
        out["url_path"] = pd.Series("/m", index=df.index).where(
            (branch == 2) & (t % 16 == 6), None)
        out["url_query"] = pd.Series("x=1", index=df.index).where(
            (branch == 2) & (t % 32 == 6), None)
        out["url_scheme"] = pd.Series("https", index=df.index).where(
            (branch == 2) & (t % 32 == 6), None)
        out["http_host"] = pd.Series("edge:8443", index=df.index).where(
            (branch == 2) & (t % 16 == 10), None)
        out["url_domain"] = pd.Series(
            "rpc.backend", index=df.index).where(
            (branch == 2) & (t % 16 == 6), None)
        out["url_port"] = pd.Series(9090, index=df.index).where(
            (branch == 2) & (t % 32 == 6), pd.NA).astype("Int64")
        out["server_address"] = pd.Series(
            "grpc.server.local", index=df.index).where(
            (branch == 2) & (t % 16 == 14), None)
        out["server_port"] = pd.Series(50051, index=df.index).where(
            (branch == 2) & (t % 32 == 14), pd.NA).astype("Int64")
        out["net_peer_ip"] = ("192.168.1." + (t % 9).astype(str)).where(
            (branch == 2) & (t % 20 == 18), None)
        out["exception_type"] = pd.Series(
            np.where(t % 14 == 3, "ValueError", "Timeout"),
            index=df.index).where(t % 7 == 3, None)
        out["exception_message"] = pd.Series(
            np.select(
                [(t % 7 == 3) & (t % 21 != 3),
                 (t % 7 == 5) & (t % 35 == 5)],
                ["failed: " + role, "orphan message"], None,
            ), index=df.index)
        out["exception_stacktrace"] = (
            "at " + tool + ":" + t.astype(str)
        ).where(t % 14 == 3, None)
        out["exception_escaped"] = (t % 7 == 3) & (t % 21 == 10)
        out["scope_name"] = pd.Series(
            np.select([t % 8 == 1, t % 8 == 5], ["express", "spring"],
                      None), index=df.index)
        out["scope_version"] = pd.Series(
            np.select([t % 16 == 1, t % 16 == 4],
                      ["4." + (t % 3).astype(str), "9.9"], None),
            index=df.index)
        return to_clean_arrow(out)

    ds = read_transcripts(sf_dir).map_batches(
        synth_inputs, batch_format="pandas"
    )
    ds = ds.map_batches(normalize_span_attrs_batch, batch_format="pyarrow")
    ds = ds.map_batches(enrich_span_dest_batch, batch_format="pyarrow")
    ds = ds.map_batches(enrich_resource_batch, batch_format="pyarrow")
    return ds.map_batches(enrich_log_error_batch, batch_format="pyarrow")


def _q_transcripts(sf_dir: str):
    from opentelemetry_collector_components_ray.sources import read_transcripts

    return read_transcripts(sf_dir)


def _q_parse(sf_dir: str):
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.parse import parse_stage

    return parse_stage(read_transcripts(sf_dir))


def _q_enrich(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    return enriched_transcripts(sf_dir)


def _q_route(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines.flagship import (
        routed_transcripts,
    )

    return routed_transcripts(sf_dir)


def _q_service_summary(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
        flagship_aggregate,
    )

    return flagship_aggregate(sf_dir, ("1h", "24h"))


def _q_latest_state(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    return _agg.latest_state(enriched_transcripts(sf_dir))


def _q_capped_tools(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    return _agg.capped_tool_summary(enriched_transcripts(sf_dir), limit=4)


def _q_latency_histogram(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    return _agg.latency_histogram(enriched_transcripts(sf_dir), ("24h",))


def _q_expo_histogram(sf_dir: str):
    """Flat exploded expo-histogram (one row per non-empty bucket +
    repeated group totals/min/max) so the driver can value-gate the
    base-2 merge math against a DuckDB twin — the e_quantize flat-form
    trick (round-2 verdict item 1b).  Round 4: tag-union of the
    non-negative latency measure and a SIGNED measure
    (``latency_ms - 40``) whose negative bucket runs drive the
    reference's negative-run merge branch (expo/merge.go:32) through
    the value gate — previously only unit/property-tested."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    def tag(variant: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "variant", pa.array([variant] * len(t), pa.string())
            )

        return fn

    enriched = enriched_transcripts(sf_dir)
    lat = _agg.expo_signed_histogram_flat(enriched, "24h").map_batches(
        tag("latency"), batch_format="pyarrow"
    )

    def add_delta(t: pa.Table) -> pa.Table:
        return t.append_column(
            "latency_delta_ms", pc.subtract(t["latency_ms"], 40)
        )

    signed = _agg.expo_signed_histogram_flat(
        enriched.map_batches(
            add_delta, batch_format="pyarrow", zero_copy_batch=True
        ),
        "24h",
        value_col="latency_delta_ms",
    ).map_batches(tag("signed"), batch_format="pyarrow")
    return lat.union(signed)


def _q_summary_merge(sf_dir: str):
    """Summary-datapoint merge: cumulative latest-ts-wins per stream
    (merger/datapoints.go:66-80, testdata/summary_enabled golden)."""
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    return _agg.summary_merge(
        _agg.summary_datapoints(enriched_transcripts(sf_dir)), "24h"
    )


def _q_latency_quantiles(sf_dir: str):
    """Tag-union (round 3): the expo-histogram CDF-walk quantiles and
    the KLL/MRL sketch path.  The sketch runs with capacity ≥ every
    group's count, where nothing ever compacts and its quantiles are
    exact discrete quantiles — value-gated by the same crossing formula
    in SQL (the MG/HLL exactness-gate polarity)."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )

    enriched = enriched_transcripts(sf_dir)

    def tag_expo(batch: pa.Table) -> pa.Table:
        return batch.add_column(
            0, "variant", pa.array(["expo"] * len(batch), pa.string())
        )

    def tag_kll(batch: pa.Table) -> pa.Table:
        # align with the expo schema: scale -1 / offset 0 markers
        n = len(batch)
        batch = batch.add_column(
            0, "variant", pa.array(["kll"] * n, pa.string())
        )
        batch = batch.add_column(
            4, "scale", pa.array([-1] * n, pa.int64())
        )
        return batch.add_column(
            5, "offset", pa.array([0] * n, pa.int64())
        )

    expo = _agg.latency_quantiles(enriched, "24h").map_batches(
        tag_expo, batch_format="pyarrow"
    )
    kll = _agg.latency_quantiles_sketch(enriched, "24h").map_batches(
        tag_kll, batch_format="pyarrow"
    )
    return expo.union(kll)


def _q_event_counts(sf_dir: str):
    import ray.data as rd

    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )

    return _agg.windowed_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet"),
        keys=["event_type"],
        ts_col="ts",
        value_col=None,
        interval="1h",
    )


def _q_conv_join(sf_dir: str):
    """Hash-partitioned join of two derived per-conversation tables
    (functions/join.py tier-2; both sides scale with conversations)."""
    from opentelemetry_collector_components_ray.functions.join import hash_join
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages import conversation

    stats = conversation.conv_stats(read_transcripts(sf_dir)).select_columns(
        ["conv_id", "n_turns"]
    )
    latest = _agg.latest_state(enriched_transcripts(sf_dir)).select_columns(
        ["conv_id", "last_status", "last_outcome"]
    )
    return hash_join(stats, latest, on="conv_id", num_partitions=8)


def _q_asof_join(sf_dir: str):
    """As-of join (beyond-reference op): each user turn picks up the
    latest prior tool turn of its conversation — oracle-exact vs
    DuckDB ASOF LEFT JOIN."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.functions.join import asof_join
    from opentelemetry_collector_components_ray.sources import read_transcripts

    tr = read_transcripts(sf_dir)
    user = tr.filter(expr="role == 'user'").select_columns(
        ["conv_id", "turn_idx", "ts"]
    )

    def mk_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "ts": t["ts"],
                "tool_ts": t["ts"],
                "last_tool": t["tool"],
            }
        )

    tool = tr.filter(expr="role == 'tool'").map_batches(
        mk_right, batch_format="pyarrow"
    )
    return asof_join(user, tool, by="conv_id", on="ts")


ASOF_JOIN_SQL = """
SELECT u.conv_id, u.turn_idx, u.ts, t.tool_ts, t.last_tool
FROM (SELECT conv_id, turn_idx, ts FROM transcripts
      WHERE role = 'user') u
ASOF LEFT JOIN (SELECT conv_id, ts, ts AS tool_ts, tool AS last_tool
                FROM transcripts WHERE role = 'tool') t
  ON u.conv_id = t.conv_id AND u.ts >= t.ts
"""


def _q_mode_dispatch(sf_dir: str):
    """Two-enricher mode dispatch (elasticapmprocessor
    processor.go:96-130): a mode column selects which enricher kernel
    runs on each row slice."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.enrich import (
        dispatch_enrich,
    )

    def mode_fn(batch: pa.Table):
        return pc.if_else(
            pc.equal(batch["role"], "tool"),
            pa.scalar("apm"),
            pa.scalar("otel"),
        )

    def apm(batch: pa.Table) -> pa.Table:
        svc = pc.binary_join_element_wise(
            pa.scalar("apm"), batch["tool"], ":"
        )
        return batch.append_column(
            "enrich_mode", pa.array(["apm"] * batch.num_rows)
        ).append_column("dispatch_svc", svc)

    def otel(batch: pa.Table) -> pa.Table:
        svc = pc.binary_join_element_wise(
            pa.scalar("otel"), batch["role"], ":"
        )
        return batch.append_column(
            "enrich_mode", pa.array(["otel"] * batch.num_rows)
        ).append_column("dispatch_svc", svc)

    return dispatch_enrich(
        read_transcripts(sf_dir), {"apm": apm, "otel": otel}, mode_fn
    )


MODE_DISPATCH_SQL = """
SELECT transcripts.*,
       CASE WHEN role = 'tool' THEN 'apm' ELSE 'otel' END AS enrich_mode,
       CASE WHEN role = 'tool' THEN 'apm:' || tool
            ELSE 'otel:' || role END AS dispatch_svc
FROM transcripts
"""


def _q_hopping_counts(sf_dir: str):
    """Hopping-window counts (1h window / 10m hop) over events."""
    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )

    return _agg.hopping_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet"),
        keys=["event_type"],
        ts_col="ts",
        window="1h",
        hop="10m",
    )


def _q_range_join(sf_dir: str):
    """Range join of each turn's latency to a latency band table
    (broadcast interval join)."""
    import pandas as pd

    from opentelemetry_collector_components_ray.functions.join import (
        range_join_broadcast,
    )
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.parse import parse_stage

    bands = pd.DataFrame(
        {
            "lo": [0.0, 50.0, 250.0, 1000.0, 2500.0],
            "hi": [50.0, 250.0, 1000.0, 2500.0, None],
            "band": ["fast", "ok", "slow", "very_slow", "worst"],
        }
    )
    parsed = parse_stage(read_transcripts(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "latency_ms"]
    )
    return range_join_broadcast(parsed, bands, value_col="latency_ms")


RANGE_JOIN_SQL = """
SELECT p.conv_id, p.turn_idx, p.latency_ms, b.band
FROM (SELECT conv_id, turn_idx, latency_ms FROM parsed) p
LEFT JOIN (VALUES (0.0, 50.0, 'fast'), (50.0, 250.0, 'ok'),
                  (250.0, 1000.0, 'slow'), (1000.0, 2500.0, 'very_slow'),
                  (2500.0, NULL, 'worst')) AS b(lo, hi, band)
  ON p.latency_ms >= b.lo AND (b.hi IS NULL OR p.latency_ms < b.hi)
"""


UA_SYNTH_SQL = """
CASE turn_idx % 7
  WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/'
              || CAST((turn_idx % 9) + 100 AS VARCHAR) || '.0.0 Safari/537.36'
  WHEN 1 THEN 'Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/'
              || CAST((turn_idx % 9) + 100 AS VARCHAR) || '.0'
  WHEN 2 THEN 'Mozilla/5.0 (Macintosh) AppleWebKit/605.1 Version/'
              || CAST((turn_idx % 9) + 15 AS VARCHAR) || '.1 Safari/605.1'
  WHEN 3 THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0 Safari/537.36 Edg/'
              || CAST((turn_idx % 9) + 100 AS VARCHAR) || '.0'
  WHEN 4 THEN 'curl/8.' || CAST(turn_idx % 9 AS VARCHAR)
  WHEN 5 THEN 'python-requests/2.' || CAST(turn_idx % 9 AS VARCHAR)
  ELSE 'WeirdAgent/1.0'
END
"""


def _q_ua_parse(sf_dir: str):
    """uap-style user-agent parse (enricher.go:36-47, span.go:457-467):
    a deterministic user_agent column (derived from turn_idx so the
    oracle rebuilds it byte-identically) parsed by the ordered pattern
    catalog."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.enrich import (
        parse_user_agent,
    )

    def synth_ua(batch: pa.Table) -> pa.Table:
        t = batch["turn_idx"]
        sel = pc.cast(pc.subtract(t, pc.multiply(pc.divide(t, 7), 7)),
                      pa.int32())
        v9 = pc.cast(pc.subtract(t, pc.multiply(pc.divide(t, 9), 9)),
                     pa.int64())
        v100 = pc.cast(pc.add(v9, 100), pa.string())
        v15 = pc.cast(pc.add(v9, 15), pa.string())
        v9s = pc.cast(v9, pa.string())
        choices = [
            pc.binary_join_element_wise(
                pa.scalar("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/"),
                v100, pa.scalar(".0.0 Safari/537.36"), ""),
            pc.binary_join_element_wise(
                pa.scalar("Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/"),
                v100, pa.scalar(".0"), ""),
            pc.binary_join_element_wise(
                pa.scalar("Mozilla/5.0 (Macintosh) AppleWebKit/605.1 Version/"),
                v15, pa.scalar(".1 Safari/605.1"), ""),
            pc.binary_join_element_wise(
                pa.scalar("Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0 Safari/537.36 Edg/"),
                v100, pa.scalar(".0"), ""),
            pc.binary_join_element_wise(
                pa.scalar("curl/8."), v9s, ""),
            pc.binary_join_element_wise(
                pa.scalar("python-requests/2."), v9s, ""),
        ]
        ua = pa.array(["WeirdAgent/1.0"] * batch.num_rows, pa.string())
        for i in range(len(choices) - 1, -1, -1):
            ua = pc.if_else(pc.equal(sel, i), choices[i], ua)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "user_agent": ua,
            }
        )

    ds = read_transcripts(sf_dir).map_batches(
        synth_ua, batch_format="pyarrow"
    )
    return parse_user_agent(ds)


def _q_rate_limit(sf_dir: str):
    """Windowed-quota rate limiting (batch translation of the
    ratelimitprocessor token bucket with rate*interval = limit;
    per-key overrides, first-match)."""
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages.ratelimit import (
        rate_limit_quota,
    )

    return rate_limit_quota(
        read_transcripts(sf_dir),
        key="role", interval="1h", limit=3,
        overrides=[("tool", 1)],
    )


def _q_sessionize(sf_dir: str):
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages import conversation

    return conversation.sessionize(
        read_transcripts(sf_dir), gap_seconds=3600 * 24
    )


def _q_top_tools(sf_dir: str):
    """Tag-union (round 3): the exact sort+limit top-k and the
    Misra-Gries heavy-hitters sketch.  The sketch runs with capacity ≥
    distinct(tool), where MG provably never decrements (dec = 0,
    count_min == true count) — so both variants share the exact top-k
    oracle, and any sketch/merge bug becomes a value mismatch (the HLL
    routing gate's polarity)."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.sources import read_transcripts

    ts = read_transcripts(sf_dir)

    def tag_sort(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array(["sort"] * len(batch), pa.string()),
                "tool": batch["tool"],
                "turn_count": batch["turn_count"].cast(pa.int64()),
            }
        )

    def tag_mg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array(
                    ["misra_gries"] * len(batch), pa.string()
                ),
                "tool": batch["tool"],
                "turn_count": batch["count_min"].cast(pa.int64()),
            }
        )

    exact = _agg.top_tools(ts, k=5).map_batches(
        tag_sort, batch_format="pyarrow"
    )
    mg = _agg.heavy_hitters(ts, "tool", capacity=64, k=5).map_batches(
        tag_mg, batch_format="pyarrow"
    )
    return exact.union(mg)


_MIX_QUOTAS = {"assistant": 1200, "tool": 700, "user": 1200}


def _q_sampling(sf_dir: str):
    """All four sampling ops in one tag-union result (round 3 —
    consolidates the former t_sample / t_split / t_stratified_sample
    slots so every registered query keeps a value oracle within the
    driver's 50-query budget): deterministic md5-keyed sample,
    train/val/test split assignment, per-key quota stratified sample,
    and domain-mix quota rebalancing (role-keyed caps; `system` absent
    from the mix config is dropped entirely), distinguished by a
    ``method`` column."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages import sampling

    cols = ["method", "split", "conv_id", "turn_idx", "role", "text",
            "tool", "ts"]

    def tag(method: str, with_blank_split: bool):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            batch = batch.append_column(
                "method", pa.array([method] * n, pa.string())
            )
            if with_blank_split:
                batch = batch.append_column(
                    "split", pa.array([""] * n, pa.string())
                )
            return batch.select(cols)

        return fn

    samp = sampling.deterministic_sample(
        read_transcripts(sf_dir), "conv_id", 0.5
    ).map_batches(tag("sample", True), batch_format="pyarrow")
    spl = sampling.assign_split(
        read_transcripts(sf_dir), "conv_id"
    ).map_batches(tag("split", False), batch_format="pyarrow")
    strat = sampling.stratified_sample(
        read_transcripts(sf_dir), "conv_id", n_per_key=10
    ).map_batches(tag("stratified", True), batch_format="pyarrow")
    # mix: per-domain quota rebalancing (round 3 session 3) — cap each
    # role at a target count, drop roles outside the mix config
    mix = sampling.quota_mix_sample(
        read_transcripts(sf_dir), "role", _MIX_QUOTAS
    ).map_batches(tag("mix", True), batch_format="pyarrow")
    return samp.union(spl).union(strat).union(mix)


def _q_pricing_summary(sf_dir: str):
    """Both relational demos as one long-format tag-union (round 5 —
    folds the former r_revenue_by_year slot in so the registry equals
    the driver's checked set, the t_sampling precedent)."""
    from opentelemetry_collector_components_ray.stages import relational

    return relational.relational_union(sf_dir)


def _q_multimodal_features(sf_dir: str):
    """All three multimodal pipelines (image BMP decode, audio WAV
    decode, video frame sampling) melted to one long-format table
    (modality, obj_id, feature, value) — real pure-numpy BMP/WAV decode
    kernels on actor pools, stub video codec (container formats need
    external libs).

    Value-gated (round 3): fixtures hold CLOSED-FORM payload contents
    (integer formulas in pixel/sample/frame coordinates), so the
    DuckDB oracle recomputes every decoded feature from the formulas
    without touching a byte — a padding/channel-order/chunk-walk bug
    in the codecs becomes a value mismatch.  Codec edge cases stay
    golden-tested in tests/test_multimodal.py."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.multimodal import (
        audio_decode_stage,
        decode_stage,
        synth_audio_table_formula,
        synth_image_table_formula,
        synth_video_table_y4m_formula,
        video_frame_stage,
    )

    n = max(64, _docs(sf_dir).count() // 10)

    def melt(modality, id_col, feats):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[id_col] + feats].melt(
                id_vars=[id_col], var_name="feature", value_name="value"
            )
            out.insert(0, "modality", modality)
            out["value"] = out["value"].astype("float64")
            return out.rename(columns={id_col: "obj_id"})

        return fn

    img = decode_stage(
        rd.from_arrow(synth_image_table_formula(n))
    ).map_batches(
        melt("image", "image_id", ["pixel_mean", "pixel_std"]),
        batch_format="pandas",
    )
    aud = audio_decode_stage(
        rd.from_arrow(synth_audio_table_formula(n))
    ).map_batches(
        melt("audio", "audio_id",
             ["duration_s", "rms", "zero_crossing_rate"]),
        batch_format="pandas",
    )
    vid = video_frame_stage(
        rd.from_arrow(synth_video_table_y4m_formula(max(32, n // 2))),
        every_k=4,
    ).map_batches(
        melt("video", "video_id", ["frame_mean", "frame_std"]),
        batch_format="pandas",
    )
    return img.union(aud).union(vid)


def _q_conv_stats(sf_dir: str):
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages import conversation

    return conversation.conv_stats(read_transcripts(sf_dir))


def _q_conv_head(sf_dir: str):
    from opentelemetry_collector_components_ray.sources import read_transcripts
    from opentelemetry_collector_components_ray.stages import conversation

    return conversation.conv_head(read_transcripts(sf_dir), k=3)


def _q_ecs_remap(sf_dir: str):
    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )
    from opentelemetry_collector_components_ray.stages.remap import remap_stage

    return remap_stage(enriched_transcripts(sf_dir))


# --- t_cardinality_route hll_highcard fixture (round-4 item): a
# deterministic corpus where the HLL estimate differs from the exact
# count (50k/5k distinct combos vs 2^14 registers), value-gated
# against an INDEPENDENT naive-Python HLL recomputation in the oracle
# (the p_frame_metrics VALUES pattern).  At the driver corpus's ~15
# combos the estimate provably equals the exact count, so the shared
# exact oracle there could not catch a register-indexing bug that only
# manifests at high cardinality (round-3 verdict finding #5).
_HLL_HIGHCARD_KEYS = (("hot", 50_000), ("warm", 5_000), ("cool", 100))
_HLL_HIGHCARD_COPIES = 2  # every combo appears twice, across blocks


def _hll_highcard_rules():
    return ((500, "low_card"), (20_000, "mid_card"), (None, "high_card"))


def _hll_highcard_dataset():
    import pyarrow as pa
    import ray.data as rd

    sizes = [n for _, n in _HLL_HIGHCARD_KEYS]
    names = [k for k, _ in _HLL_HIGHCARD_KEYS]
    bounds = []
    acc = 0
    for n in sizes:
        acc += n
        bounds.append(acc)
    total = acc * _HLL_HIGHCARD_COPIES

    def make(batch: "pa.Table") -> "pa.Table":
        import numpy as np

        ids = batch["id"].to_numpy() % bounds[-1]
        b = np.asarray(bounds)
        s = np.asarray(sizes)
        j = np.searchsorted(b, ids, side="right")
        local = ids - (b[j] - s[j])
        keys = np.asarray(names, dtype=object)[j].astype("U")
        combos = np.char.add(
            np.char.add(keys, "-combo-"), local.astype("U")
        )
        return pa.table(
            {
                "conv_id": pa.array(keys, pa.string()),
                "combo": pa.array(combos.astype(object), pa.string()),
            }
        )

    return rd.range(total, override_num_blocks=8).map_batches(
        make, batch_format="pyarrow"
    )


def _q_cardinality_route(sf_dir: str):
    """All three cardinality-routing variants in one tag-union result
    (round 3 slot consolidation): the exact distributed fold, the
    HLL-sketch estimator (router.go:287-297 precision-14 estimates —
    exact at driver cardinalities, so both share the exact oracle),
    and the high-cardinality HLL fixture where estimate ≠ exact,
    gated against a naive-Python HLL VALUES oracle (round 4) —
    distinguished by a ``variant`` column."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.pipelines import (
        enriched_transcripts,
    )
    from opentelemetry_collector_components_ray.stages.route import (
        CardinalityRouterConfig,
        cardinality_route,
        cardinality_route_hll,
    )

    def tag(variant: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "variant", pa.array([variant] * len(t), pa.string())
            )

        return fn

    exact = cardinality_route(enriched_transcripts(sf_dir)).map_batches(
        tag("exact"), batch_format="pyarrow"
    )
    hll = cardinality_route_hll(enriched_transcripts(sf_dir)).map_batches(
        tag("hll"), batch_format="pyarrow"
    )
    hc_cfg = CardinalityRouterConfig(
        key="conv_id", measure_by=("combo",),
        rules=_hll_highcard_rules(),
    )
    highcard = cardinality_route_hll(
        _hll_highcard_dataset(), config=hc_cfg
    ).map_batches(tag("hll_highcard"), batch_format="pyarrow")
    return exact.union(hll).union(highcard)


def _q_jaccard_pairs(sf_dir: str):
    from opentelemetry_collector_components_ray.stages import dedup

    return dedup.word_jaccard_pairs(_docs(sf_dir), threshold=0.5, max_id=400)


def _docs(sf_dir: str):
    import ray.data as rd

    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )

    return read_parquet_clean(f"{sf_dir}/documents.parquet")


def _embs(sf_dir: str):
    import ray.data as rd

    from opentelemetry_collector_components_ray.sources import (
        read_parquet_clean,
    )

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


def _q_exact_dedup(sf_dir: str):
    from opentelemetry_collector_components_ray.stages import dedup

    return dedup.exact_dedup(_docs(sf_dir))


def _q_dedup_stats(sf_dir: str):
    from opentelemetry_collector_components_ray.stages import dedup

    return dedup.dedup_stats(_docs(sf_dir))


def _q_minhash_pairs(sf_dir: str):
    """Tag-union (round 3 session 3): ``within`` = the standard
    LSH→partitioned-verify near-dup pairs, and ``cross`` = the
    cross-corpus wrapper with even-doc_id docs as corpus A vs
    odd-doc_id docs as corpus B — only straddling pairs survive, ids
    restored, so a disjoint-id-space or side-filter bug becomes a
    value mismatch.  Both share the seeded-LSH detection argument
    (qualifying pairs at j ≥ 0.9, detection 1-3e-8)."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages import dedup

    def tag_within(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array(["within"] * len(t), pa.string()),
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "jaccard": t["jaccard"],
            }
        )

    def tag_cross(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array(["cross"] * len(t), pa.string()),
                "id_a": t["doc_id"].cast(pa.int64()),
                "id_b": t["corpus_b_id"].cast(pa.int64()),
                "jaccard": t["jaccard"],
            }
        )

    def parity(rem: int):
        import pyarrow.compute as pc

        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            keep = pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                pa.scalar(rem, pa.int64()),
            )
            return t.filter(keep)

        return fn

    docs = _docs(sf_dir)
    within = dedup.minhash_near_dups(docs, threshold=0.8).map_batches(
        tag_within, batch_format="pyarrow"
    )
    # broadcast verify for the cross half: the straddle filter + id
    # restoration are what this variant gates; the partitioned verify
    # is already exercised (and gated) by the `within` half
    cross = dedup.cross_corpus_near_dups(
        docs.map_batches(parity(0), batch_format="pyarrow"),
        docs.map_batches(parity(1), batch_format="pyarrow"),
        threshold=0.8,
        verify="broadcast",
    ).map_batches(tag_cross, batch_format="pyarrow")
    return within.union(cross)


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs, value-gated (round 3): the driver
    configuration uses ``word_hash="duckdb"`` so the oracle recomputes
    the signature bit-for-bit in SQL; the block bucketing is
    pigeonhole-exact, so the engine result IS the brute-force
    hamming-≤3 set the oracle joins for.  The native word hash remains
    the default scale path (same pipeline, different hash constant)."""
    from opentelemetry_collector_components_ray.stages import dedup

    return dedup.simhash_near_dups(
        _docs(sf_dir), hamming_k=3, word_hash="duckdb"
    )


def _q_minhash_dedup_keep(sf_dir: str):
    """Verified-edge cluster dedup (round 3): components of the
    exact-Jaccard-verified pair graph, min-id survivor per component —
    value-gated against a recursive-CTE closure of the brute-force
    pair set.  The bucket-graph variant (minhash_dedup_keep) remains
    the linear scale path for corpora with huge duplicate clusters."""
    from opentelemetry_collector_components_ray.stages import dedup

    return dedup.minhash_dedup_keep_verified(_docs(sf_dir), threshold=0.8)


def _q_text_profile(sf_dir: str):
    """All five text-analysis ops (token counts, quality, lang ID,
    fingerprint, normalize) folded into one fused per-doc pass, then
    GPT-style concat-and-chunk packing columns via the distributed
    ordered prefix-scan (stages/packing.py) — the scan's per-block
    base offsets and within-block cumsums are all hash-gated against
    the SQL window twin."""
    from opentelemetry_collector_components_ray.stages import packing, text

    return packing.concat_chunk_packing(
        text.text_profile(_docs(sf_dir)), budget=512
    )


def _q_chunk_documents(sf_dir: str):
    """Document chunking tag-union (rounds 4+5): char-window chunks
    (mode='chars', 200 chars / 40 overlap) unioned with token-aware
    chunks (mode='tokens', 32 tokens / 8 overlap — windows bounded in
    the unit a model context budget is stated in).  Both vectorized
    per chunk index (stages/text.py); exact substr / string_split
    twins in SQL; ``n_units`` counts chars or tokens per mode."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages import text

    def tag(mode: str, unit_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.append_column(
                "mode", pa.array([mode] * len(batch), pa.string())
            )
            return batch.rename_columns(
                [("n_units" if c == unit_col else c)
                 for c in batch.column_names]
            ).select(["mode", "doc_id", "chunk_idx", "chunk_text",
                      "n_units"])

        return fn

    chars = text.chunk_documents(
        _docs(sf_dir), size=200, overlap=40
    ).map_batches(tag("chars", "n_chars"), batch_format="pyarrow")
    toks = text.chunk_documents_tokens(
        _docs(sf_dir), size=32, overlap=8
    ).map_batches(tag("tokens", "n_tokens"), batch_format="pyarrow")
    return chars.union(toks)


def _q_lm_stats(sf_dir: str):
    """Corpus LM statistics (round 3): unigram model fit + per-doc
    mean log-probability scoring (broadcast model, searchsorted per
    batch) unioned with corpus top-k bigram counts — the
    perplexity-style quality signal and n-gram audit pass of public
    training-data pipelines (stages/lm.py) — plus the corpus data-card
    rows (session 3): size/token/composition/distinct-text report in
    the same (kind, key, val) long form."""
    from opentelemetry_collector_components_ray.stages import lm

    docs = _docs(sf_dir)
    # min_count/min_df=2 ACTIVATE the vocabulary caps (round-3 review
    # finding: the broadcast model must be bounded at corpus scale) so
    # the gate exercises the capped/OOV path, mirrored in the twin
    return lm.lm_stats(docs, k=20, min_count=2, min_df=2).union(
        lm.datacard(docs)
    )


_PII_TEXT_SQL = (
    "text || ' contact: user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || "
    "'.7 tel +1 555 0' || CAST(100 + doc_id % 900 AS VARCHAR)"
)


def _q_redact(sf_dir: str):
    """PII redaction (round 3): the synthetic corpus carries no PII, so
    the query PLANTS a deterministic email/IP/phone per document (the
    t_ua_parse synthesis pattern — same expression on both sides) and
    redacts with the RE2 kernels of stages/text.py; vacuous-green is
    impossible because every row contains all three classes."""
    import pandas as pd

    from opentelemetry_collector_components_ray.stages import text as text_mod

    def plant_pii(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        out = df[["doc_id"]].copy()
        out["text"] = (
            df["text"].to_numpy(dtype=object)
            + " contact: user" + d.astype(str)
            + "@example.com ip 10.0." + (d % 256).astype(str)
            + ".7 tel +1 555 0" + (100 + d % 900).astype(str)
        )
        return out

    planted = _docs(sf_dir).map_batches(plant_pii, batch_format="pandas")
    return text_mod.redact_pii(planted)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination (round 3): deterministic snippet set
    broadcast once, vectorized substring scan per batch, clean corpus
    via the distributed anti_join (stages/decontam.py) — both halves
    value-gated by the position()-based DuckDB twin.  Third mode
    (session 3): embedding-cosine overlap vs the planted-twin benchmark
    set — one broadcast matmul per batch, brute-force SQL twin."""
    from opentelemetry_collector_components_ray.stages import decontam

    return decontam.decontam_report(_docs(sf_dir)).union(
        decontam.embedding_decontam_report(_embs(sf_dir))
    )


def _q_promrw(sf_dir: str):
    """prometheusremotewritev1receiver translate port: timeseries →
    gauge datapoints, labels → attrs, missing __name__ dropped
    (sources/promrw.py; reference receiver.go:174-226)."""
    from opentelemetry_collector_components_ray.sources import promrw

    return promrw.translate_write_requests(
        promrw.read_write_requests(sf_dir)
    )


def _q_ottl(sf_dir: str):
    """OTTL-subset statement pipeline: every editor/converter of the
    grammar applied in order over the transcripts (pipelines/config.py
    DEMO_STATEMENTS; reference lsmintervalprocessor
    config/config.go:70-78, execution processor.go:556-605)."""
    from opentelemetry_collector_components_ray.pipelines import config
    from opentelemetry_collector_components_ray.sources import read_transcripts

    return config.apply_statements(
        read_transcripts(sf_dir), config.DEMO_STATEMENTS
    )


def _q_entity_docs(sf_dir: str):
    """entityanalyticsreceiver publisher port: identity documents →
    bodymap log rows (sources/entity.py; reference
    publisher.go:44-91)."""
    from opentelemetry_collector_components_ray.sources import entity

    return entity.entity_docs(sf_dir)


def _q_frame_metrics(sf_dir: str):
    """profilingmetricsconnector port: frame/classification/custom
    metrics over deterministic template stacks (stages/profiling.py;
    reference connector/profilingmetricsconnector/frame.go:175-495,
    connector.go:126-342)."""
    from opentelemetry_collector_components_ray.stages import profiling

    return profiling.frame_metrics(
        profiling.read_profiles(sf_dir), window="1h"
    )


def _q_cosine_topk(sf_dir: str):
    """Tag-union of two retrieval methods over the same 5 queries
    (round 3 — keeps the PQ search value-gated inside the 50-query
    budget): ``exact`` brute-force cosine top-k, and ``pq_adc`` —
    product-quantization codes (corpus-derived codebook, so the DuckDB
    twin recomputes codes AND ADC distances from the embeddings view
    alone) ranked by asymmetric distance."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages import ann

    embs = _embs(sf_dir)
    queries = embs.filter(expr="vec_id < 5")

    def tag(variant: str, score_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "variant": pa.array([variant] * len(batch), pa.string()),
                    "query_id": batch["query_id"],
                    "vec_id": batch["vec_id"],
                    "score": batch[score_col].cast(pa.float64()),
                    "rank": batch["rank"].cast(pa.int64()),
                }
            )

        return fn

    exact = ann.cosine_topk(embs, queries, k=10).map_batches(
        tag("exact", "sim"), batch_format="pyarrow"
    )
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=128)
    pq = ann.pq_adc_topk(
        ann.pq_encode(embs, cb), queries, cb, k=10
    ).map_batches(tag("pq_adc", "adc_d2"), batch_format="pyarrow")

    # ivfpq_adc: the FAISS-style composed index — exhaustive probes make
    # its ranking equal the flat PQ/ADC ranking (same SQL twin); the
    # probe-PRUNED configuration is benched and recall-tested instead
    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="occr_ivfpq_index_")
    try:
        n_cent = ann.auto_n_centroids(embs)
        ann.ivfpq_build_index(
            embs, idx, n_centroids=n_cent, codebook=cb
        )
        ivfpq = ann.ivfpq_search_index(
            idx, queries, k=10, nprobe=n_cent
        ).materialize()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    ivfpq = ivfpq.map_batches(
        tag("ivfpq_adc", "adc_d2"), batch_format="pyarrow"
    )

    # ivf_exact: the persistent float IVF index end-to-end (formerly the
    # e_ivf_topk slot — folded here round 3 session 3 to free a slot for
    # d_substring_dedup).  Exhaustive probes make the index search exact,
    # so the brute-force cosine twin is a value oracle for the
    # train/assign/partition/search/merge machinery; the probe-PRUNED
    # configuration is benched and recall-tested instead.
    idx2 = tempfile.mkdtemp(prefix="occr_ivf_index_")
    try:
        ann.ivf_build_index(embs, idx2, n_centroids=n_cent)
        ivf = ann.ivf_search_index(
            idx2, queries, k=10, nprobe=n_cent
        ).materialize()
    finally:
        shutil.rmtree(idx2, ignore_errors=True)
    ivf = ivf.map_batches(tag("ivf_exact", "sim"), batch_format="pyarrow")
    return exact.union(pq).union(ivfpq).union(ivf)


def _q_substring_dedup(sf_dir: str):
    """Exact substring (duplicated-span) dedup over the documents
    table with deterministically planted cross-doc passages (the
    synthetic corpus has no natural long repeats — `plant_passages`
    appends/prepends two fixed spans by doc_id residue, and the SQL
    twin applies the identical CASE chain, so the gate is non-vacuous
    by construction).  Every repeated k=8-word window loses all but
    its lexicographically-first occurrence; output is
    (doc_id, n_words, n_removed, clean_text).

    Second variant (session 3): span-level DECONTAMINATION — the
    planted corpus split into bench (doc_id % 25 == 2, PASSAGE_A
    carriers) and corpus; corpus windows occurring anywhere in bench
    are cut, whole docs kept."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages import substr

    def tag(variant: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "variant", pa.array([variant] * len(t), pa.string())
            )

        return fn

    def residue(mod: int, rem: int, keep: bool):
        import numpy as np

        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % mod) == rem
            return t.filter(pa.array(m if keep else ~m))

        return fn

    docs = substr.plant_passages(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    )
    dedup_half = substr.substring_dedup(docs, k=8).map_batches(
        tag("dedup"), batch_format="pyarrow"
    )
    corpus = docs.map_batches(residue(25, 2, False), batch_format="pyarrow")
    bench = docs.map_batches(residue(25, 2, True), batch_format="pyarrow")
    decon_half = substr.remove_matching_spans(
        corpus, bench, k=8
    ).map_batches(tag("decontam"), batch_format="pyarrow")
    return dedup_half.union(decon_half)


def _q_quantize(sf_dir: str):
    """Tag-union (round 3): the int8 symmetric flat quantization and
    the PQ code assignment over the corpus-derived codebook, mapped
    onto the shared (vec_id, dim_idx, q, scale) shape."""
    import pyarrow as pa

    from opentelemetry_collector_components_ray.stages import ann

    embs = _embs(sf_dir)

    def tag_int8(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array(["int8"] * len(batch), pa.string()),
                "vec_id": batch["vec_id"],
                "dim_idx": batch["dim_idx"].cast(pa.int64()),
                "q": batch["q"].cast(pa.int64()),
                "scale": batch["scale"].cast(pa.float64()),
            }
        )

    def tag_pq(batch: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "variant": pa.array(["pq8x128"] * len(batch), pa.string()),
                "vec_id": batch["vec_id"],
                "dim_idx": batch["subspace"].cast(pa.int64()),
                "q": batch["code"].cast(pa.int64()),
                "scale": pa.array(np.zeros(len(batch))),
            }
        )

    int8 = ann.quantize_embeddings_flat(embs).map_batches(
        tag_int8, batch_format="pyarrow"
    )
    cb = ann.pq_corpus_codebook(embs, m=8, n_codes=128)
    pq = ann.pq_encode_flat(embs, cb).map_batches(
        tag_pq, batch_format="pyarrow"
    )
    return int8.union(pq)


def _q_embedding_clusters(sf_dir: str):
    """Verified-edge embedding clusters over the planted-twin corpus
    (round 3): exact-cosine-verified pairs as edges, strong LSH config
    (detection ~1-1e-6 per twin) — value-gated against the SQL twin
    reconstruction (ann.embedding_clusters_sql)."""
    from opentelemetry_collector_components_ray.stages import ann

    planted = ann.plant_near_dup_twins(_embs(sf_dir), every=10, eps=0.1)
    return ann.embedding_clusters(
        planted, threshold=0.99, n_bits=6, n_tables=8
    )


def _q_cosine_neardup(sf_dir: str):
    """The raw synthetic embeddings contain no near-dups (max organic
    cosine ≈ 0.51), so plant deterministic twins first — otherwise the
    rows-only check passes vacuously on an empty result (round-1
    review finding).

    Value-gated (round 3): with n_bits=6 / n_tables=8 a planted twin
    (cos ≈ 0.995, θ ≈ 0.1 rad) collides in ≥1 table with probability
    1 − (1 − (1 − θ/π)^6)^8 ≈ 1 − 9e-7, so the LSH output equals the
    brute-force twin set (ann.cosine_neardup_sql) except with
    probability ≪ 1e-4 over the whole corpus."""
    from opentelemetry_collector_components_ray.stages import ann

    planted = ann.plant_near_dup_twins(_embs(sf_dir), every=10, eps=0.1)
    return ann.cosine_near_dup_pairs(
        planted, threshold=0.99, n_bits=6, n_tables=8
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # transcript pipeline (north-rule flagship)
        "t_transcripts": _q_transcripts,
        "t_ndjson_multi": _q_ndjson_multi,
        "t_enrich_full": _q_enrich_full,
        "t_parse": _q_parse,
        "t_enrich": _q_enrich,
        "t_route": _q_route,
        "t_service_summary": _q_service_summary,
        "t_latest_state": _q_latest_state,
        "t_capped_tools": _q_capped_tools,
        "t_conv_join": _q_conv_join,
        "t_asof_join": _q_asof_join,
        "t_range_join": _q_range_join,
        "t_mode_dispatch": _q_mode_dispatch,
        "t_ua_parse": _q_ua_parse,
        "t_rate_limit": _q_rate_limit,
        "t_sessionize": _q_sessionize,
        "e_hopping_counts": _q_hopping_counts,
        "t_top_tools": _q_top_tools,
        "t_sampling": _q_sampling,
        "t_conv_stats": _q_conv_stats,
        "t_conv_head": _q_conv_head,
        "t_ecs_remap": _q_ecs_remap,
        "t_cardinality_route": _q_cardinality_route,
        "d_jaccard_pairs": _q_jaccard_pairs,
        "t_latency_histogram": _q_latency_histogram,
        "t_summary_merge": _q_summary_merge,
        "t_expo_histogram": _q_expo_histogram,
        "t_latency_quantiles": _q_latency_quantiles,
        "e_event_counts": _q_event_counts,
        # training-data ops: dedup / text analysis / similarity search
        "d_exact_dedup": _q_exact_dedup,
        "d_dedup_stats": _q_dedup_stats,
        "d_minhash_pairs": _q_minhash_pairs,
        "d_simhash_pairs": _q_simhash_pairs,
        "d_minhash_dedup_keep": _q_minhash_dedup_keep,
        "d_substring_dedup": _q_substring_dedup,
        "d_text_profile": _q_text_profile,
        "d_lm_stats": _q_lm_stats,
        "d_chunk_documents": _q_chunk_documents,
        "d_decontaminate": _q_decontaminate,
        "d_redact": _q_redact,
        "p_frame_metrics": _q_frame_metrics,
        "t_promrw": _q_promrw,
        "t_entity_docs": _q_entity_docs,
        "t_ottl": _q_ottl,
        "e_cosine_topk": _q_cosine_topk,
        "e_quantize": _q_quantize,
        "e_cosine_neardup": _q_cosine_neardup,
        "e_embedding_clusters": _q_embedding_clusters,
        # real BMP/WAV decode kernels (video codec stubbed); value-gated
        # via closed-form payload formulas the oracle recomputes
        "m_multimodal_features": _q_multimodal_features,
        # relational demos over the TPC-H-ish tables (tag-union of
        # pricing_summary + revenue_by_year, one slot)
        "r_pricing_summary": _q_pricing_summary,
    }


def _hll_highcard_oracle_sql() -> str:
    """VALUES twin of the ``hll_highcard`` variant: per-key estimates
    recomputed by an INDEPENDENT naive Python HLL — per-string-loop
    hash (the buffer-level kernel's spec: length-seeded word-chain
    polynomial + splitmix64 finalize), per-hash register update via
    ``bit_length``, Ertl Alg.-6 estimator transcribed from the paper
    (arXiv:1702.01284) — over the same deterministic combo space the
    query hashes.  A register-indexing or rank bug in the engine's
    vectorized path cannot reproduce these numbers."""
    import math

    m64 = (1 << 64) - 1

    def sm(x: int) -> int:
        x &= m64
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m64
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m64
        return x ^ (x >> 31)

    def nhash(sv: str) -> int:
        data = sv.encode()
        ln = len(data)
        acc = sm(ln ^ 0x243F6A8885A308D3)
        if ln:
            nw = (ln + 7) // 8
            w_cnt = 1 << max((nw - 1).bit_length(), 0)
            buf = data + b"\x00" * (w_cnt * 8 - ln)
            for j in range(w_cnt):
                word = int.from_bytes(buf[8 * j : 8 * j + 8], "little")
                acc = (acc * 1099511628211 + word) & m64
        return sm(acc)

    def estimate(hashes, p: int = 14) -> float:
        m = 1 << p
        q = 64 - p
        reg = [0] * m
        for h in hashes:
            idx = h >> (64 - p)
            rest = (h << p) & m64
            rank = (q + 1) if rest == 0 else (65 - rest.bit_length())
            if rank > reg[idx]:
                reg[idx] = rank
        counts = [0.0] * (q + 2)
        for r in reg:
            counts[r] += 1.0

        def sigma(x: float) -> float:
            if x == 1.0:
                return float("inf")
            y, z = 1.0, x
            while True:
                x = x * x
                zp = z
                z = z + x * y
                y = 2.0 * y
                if z == zp:
                    return z

        def tau(x: float) -> float:
            if x == 0.0 or x == 1.0:
                return 0.0
            y, z = 1.0, 1.0 - x
            while True:
                x = math.sqrt(x)
                zp = z
                y = 0.5 * y
                z = z - (1.0 - x) ** 2 * y
                if z == zp:
                    return z / 3.0

        mf = float(m)
        z = mf * tau(1.0 - counts[q + 1] / mf)
        for k in range(q, 0, -1):
            z = 0.5 * (z + counts[k])
        z += mf * sigma(counts[0] / mf)
        return mf * mf / (2.0 * math.log(2.0)) / z

    rules = _hll_highcard_rules()

    def sink_for(card: int) -> str:
        for t, sk in rules:
            if t is None or card <= t:
                return sk
        raise AssertionError("unreachable")

    rows = []
    for name, n in _HLL_HIGHCARD_KEYS:
        hs = [nhash(f"{name}\x1f{name}-combo-{i}") for i in range(n)]
        est = int(round(estimate(hs)))
        rows.append(f"('{name}', {est}, '{sink_for(est)}')")
    return (
        "SELECT conv_id, CAST(combo_card AS BIGINT) AS combo_card, sink "
        "FROM (VALUES " + ", ".join(rows)
        + ") AS t(conv_id, combo_card, sink)"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "t_transcripts": f"{_CTE} SELECT * FROM transcripts",
        "t_parse": f"{_CTE} SELECT * FROM parsed",
        "t_enrich": f"{_CTE} SELECT * FROM enriched",
        "t_route": f"{_CTE} SELECT * FROM ({ROUTED_SQL})",
        "t_service_summary": (
            f"{_CTE} {_agg.service_summary_sql(('1h', '24h'))}"
        ),
        "t_latest_state": f"{_CTE} {_agg.LATEST_STATE_SQL}",
        "t_capped_tools": f"{_CTE} {_agg.capped_tool_summary_sql(4)}",
        "t_conv_join": (
            f"{_CTE} SELECT s.conv_id, s.n_turns, l.last_status, "
            "l.last_outcome "
            f"FROM ({_conv.CONV_STATS_SQL}) s "
            f"JOIN ({_agg.LATEST_STATE_SQL}) l USING (conv_id)"
        ),
        "t_asof_join": f"{_CTE} {ASOF_JOIN_SQL}",
        "t_range_join": f"{_CTE} {RANGE_JOIN_SQL}",
        "t_mode_dispatch": f"{_CTE} {MODE_DISPATCH_SQL}",
        "t_ua_parse": (
            f"{_CTE} SELECT conv_id, turn_idx, user_agent, "
            + parse_user_agent_sql("user_agent")
            + f" FROM (SELECT conv_id, turn_idx, ({UA_SYNTH_SQL}) AS "
            "user_agent FROM transcripts)"
        ),
        "t_rate_limit": (
            f"{_CTE} " + rate_limit_quota_sql(
                key="role", interval="1h", limit=3,
                overrides=[("tool", 1)],
            )
        ),
        "t_sessionize": f"{_CTE} {_conv.sessionize_sql(3600 * 24)}",
        "e_hopping_counts": _agg.hopping_counts_sql(
            ["event_type"], table="events", window="1h", hop="10m"
        ),
        # t_top_tools: tag-union of exact sort+limit and the Misra-Gries
        # sketch (capacity ≥ distinct ⇒ provably exact, shared oracle)
        "t_top_tools": (
            f"{_CTE} SELECT v.variant, t.tool, t.turn_count FROM "
            f"({_agg.top_tools_sql(5)}) t CROSS JOIN (VALUES ('sort'), "
            "('misra_gries')) AS v(variant)"
        ),
        "t_sampling": (
            f"{_CTE} "
            "SELECT 'sample' AS method, '' AS split, conv_id, turn_idx, "
            "role, text, tool, ts FROM "
            f"({_sampling.deterministic_sample_sql('conv_id', 0.5)}) t "
            "UNION ALL "
            "SELECT 'split' AS method, split, conv_id, turn_idx, "
            "role, text, tool, ts FROM "
            f"({_sampling.assign_split_sql('conv_id')}) t "
            "UNION ALL "
            "SELECT 'stratified' AS method, '' AS split, conv_id, turn_idx, "
            "role, text, tool, ts FROM "
            f"({_sampling.stratified_sample_sql('conv_id', 10)}) t "
            "UNION ALL "
            "SELECT 'mix' AS method, '' AS split, conv_id, turn_idx, "
            "role, text, tool, ts FROM "
            f"({_sampling.quota_mix_sample_sql('role', _MIX_QUOTAS)}) t"
        ),
        "t_conv_stats": f"{_CTE} {_conv.CONV_STATS_SQL}",
        "t_conv_head": f"{_CTE} {_conv.conv_head_sql(3)}",
        # t_approx_convs: HLL estimate (±1%) cannot hash-match an exact
        # oracle → rows-only; accuracy asserted in tests/test_conversation.py
        "t_ecs_remap": f"{_CTE} {_remap.RemapSpec().sql_select('enriched')}",
        # t_cardinality_route: tag-union of the exact fold, the HLL
        # sketch variant, and the high-cardinality HLL fixture.  The
        # sketch estimate is a deterministic, order-insensitive
        # function of the distinct-combo hash set (register = max over
        # hashes); at driver cardinalities (~15 combos vs 2^14
        # registers) it equals the exact count for every key on the
        # seeded corpus (verified), so the 'hll' variant shares the
        # exact-count oracle — and the 'hll_highcard' variant (50k/5k
        # combos, estimate ≠ exact) is gated against an independent
        # naive-Python HLL VALUES recomputation (round-4 item; see
        # _hll_highcard_oracle_sql).  Accuracy across 10^2-10^6 also
        # asserted in tests/test_cardinality_route.py.
        "t_cardinality_route": (
            f"{_CTE} SELECT v.*, 'exact' AS variant FROM "
            f"({_route_mod.cardinality_route_sql()}) v "
            "UNION ALL "
            f"SELECT v.*, 'hll' AS variant FROM "
            f"({_route_mod.cardinality_route_sql()}) v "
            "UNION ALL "
            "SELECT v.*, 'hll_highcard' AS variant FROM "
            f"({_hll_highcard_oracle_sql()}) v"
        ),
        "d_jaccard_pairs": _dedup.word_jaccard_pairs_sql(0.5, 400),
        "t_latency_histogram": (
            f"{_CTE} {_agg.latency_histogram_sql(('24h',))}"
        ),
        "t_summary_merge": f"{_CTE} {_agg.summary_merge_sql('24h')}",
        # t_expo_histogram (value-gated, round 3; signed round 4):
        # flat exploded form — bucket_idx = ceil(log2(|v|)*2^scale)-1
        # per sign with the 160-cap's final scale recomputed from BOTH
        # runs' merged spans (pure functions of per-sign min/max index,
        # hence batching-independent); min/max merge parity columns
        # included.  The 'signed' variant (latency_ms - 40) populates
        # real negative bucket runs, driver-gating the negative-run
        # merge branch (expo/merge.go:32).
        "t_expo_histogram": (
            f"{_CTE} SELECT v.*, 'latency' AS variant FROM "
            f"({_agg.expo_signed_histogram_flat_sql('24h')}) v "
            "UNION ALL SELECT v.*, 'signed' AS variant FROM "
            + "("
            + _agg.expo_signed_histogram_flat_sql(
                "24h", value_expr="latency_ms - 40"
            )
            + ") v"
        ),
        # t_latency_quantiles (value-gated, round 3): quantiles are a
        # deterministic CDF walk over the same flat histogram, so the
        # SQL twin recomputes them from exploded buckets.
        # t_latency_quantiles: tag-union — expo CDF walk + exact-regime
        # KLL sketch, each with its own SQL twin
        "t_latency_quantiles": (
            f"{_CTE} SELECT 'expo' AS variant, * FROM "
            f"({_agg.latency_quantiles_sql('24h')}) UNION ALL "
            "SELECT 'kll' AS variant, interval, window_start, role, "
            "-1 AS scale, 0 AS \"offset\", \"count\", hsum, zero_count, "
            "hmin, hmax, p50, p95, p99 FROM "
            f"({_agg.latency_quantiles_sketch_sql('24h')})"
        ),
        "e_event_counts": (
            f"SELECT {_agg.window_start_sql('1h')} AS window_start, "
            "event_type, COUNT(*) AS n FROM events GROUP BY 1, 2"
        ),
        "t_ndjson_multi": _synth.INTAKE_MULTI_SQL,
        "t_enrich_full": (
            f"{_CTE} "
            + _enrich_mod.log_error_sql(
                _enrich_mod.resource_enrich_sql(
                    _enrich_mod.span_dest_sql(
                        _enrich_mod.normalize_span_attrs_sql(
                            _ENRICH_FULL_INPUTS_SQL
                        )
                    )
                )
            )
        ),
        "d_exact_dedup": _dedup.EXACT_DEDUP_SQL,
        "d_dedup_stats": _dedup.DEDUP_STATS_SQL,
        # d_minhash_pairs: the seeded LSH candidate set is a
        # deterministic function of the input and every qualifying pair
        # sits far above the detection knee, so the brute-force SQL
        # ground truth doubles as a value-level oracle (see
        # dedup.minhash_pairs_oracle_sql).
        "d_minhash_pairs": (
            "SELECT 'within' AS variant, id_a, id_b, jaccard FROM ("
            + _dedup.minhash_pairs_oracle_sql(0.8, 3)
            + ") UNION ALL "
            "SELECT 'cross' AS variant, id_a, id_b, jaccard FROM ("
            + _dedup.cross_corpus_pairs_oracle_sql(0.8, 3)
            + ")"
        ),
        # e_cosine_neardup: same argument — planted twins are the only
        # qualifying pairs and the driver LSH config pushes per-pair
        # detection to ≈1−1e-6, so the brute-force twin reconstruction
        # is a value oracle (see ann.cosine_neardup_sql).
        "e_cosine_neardup": _ann.cosine_neardup_sql(
            every=10, eps=0.1, threshold=0.99
        ),
        # d_minhash_dedup_keep (value-gated, round 3): verified-edge
        # clustering ⇒ recursive-CTE closure over the brute-force pair
        # set is the exact component structure.
        "d_minhash_dedup_keep": _dedup.minhash_keep_verified_sql(0.8, 3),
        # d_substring_dedup (value-gated): the twin replays the exact
        # word-window semantics — same space split, same k, same
        # lexicographic-min keeper, same position-union removal — over
        # the identically planted corpus (stages/substr.py)
        "d_substring_dedup": (
            "SELECT 'dedup' AS variant, * FROM ("
            + _substr.substring_dedup_sql(k=8, planted=True)
            + ") UNION ALL SELECT 'decontam' AS variant, * FROM ("
            + _substr.remove_matching_spans_sql(k=8, planted=True)
            + ")"
        ),
        # e_embedding_clusters (value-gated, round 3): components over
        # the planted-twin corpus are exactly the qualifying twin pairs.
        "e_embedding_clusters": _ann.embedding_clusters_sql(
            every=10, eps=0.1, threshold=0.99
        ),
        # d_simhash_pairs (value-gated, round 3): the driver config
        # hashes words with DuckDB's own hash() kernel, so the oracle
        # recomputes the 64-bit signature bit-for-bit (per-bit
        # term-frequency majority) and brute-forces hamming ≤ 3; the
        # engine's block bucketing is pigeonhole-exact, so its pair set
        # IS that brute-force set.
        "d_simhash_pairs": _dedup.simhash_pairs_oracle_sql(3),
        # d_text_profile: fused per-doc profile wrapped by the packing
        # window scan (pack_offset/first/last/n_chunks)
        "d_text_profile": _packing.packing_sql(
            _text.text_profile_sql(), budget=512
        ),
        "d_chunk_documents": (
            "SELECT 'chars' AS mode, doc_id, chunk_idx, chunk_text, "
            "n_chars AS n_units FROM ("
            + _text.chunk_documents_sql(200, 40) + ") "
            "UNION ALL "
            "SELECT 'tokens' AS mode, doc_id, chunk_idx, chunk_text, "
            "n_tokens AS n_units FROM ("
            + _text.chunk_documents_tokens_sql(32, 8) + ")"
        ),
        "d_lm_stats": (
            "SELECT * FROM ("
            + _lm.lm_stats_sql(k=20, min_count=2, min_df=2) + ") "
            "UNION ALL SELECT * FROM (" + _lm.datacard_sql() + ")"
        ),
        "d_decontaminate": (
            "SELECT * FROM (" + _decontam.DECONTAM_REPORT_SQL + ") "
            "UNION ALL SELECT * FROM ("
            + _decontam.embedding_decontam_sql() + ")"
        ),
        "d_redact": (
            f"WITH pii AS (SELECT doc_id, {_PII_TEXT_SQL} AS text "
            "FROM documents) "
            f"SELECT doc_id, text, {_text.redact_pii_sql()} FROM pii"
        ),
        # p_frame_metrics (value-gated): expected VALUES rows generated
        # by the naive frame.go transcription over the same scenario
        # templates the engine's stacks are synthesized from
        "p_frame_metrics": _profiling.profiling_metrics_sql(window="1h"),
        "t_promrw": _promrw.PROMRW_SQL,
        "t_entity_docs": _entity.ENTITY_DOCS_SQL,
        "t_ottl": f"{_CTE} {_pipecfg.DEMO_STATEMENTS_SQL}",
        # e_cosine_topk: tag-union of exact brute force and PQ/ADC over
        # the corpus-derived codebook (both twins recompute from the
        # embeddings view alone; see stages/ann.py PQ section)
        "e_cosine_topk": (
            "SELECT v.variant, s.query_id, s.vec_id, s.sim AS score,"
            " s.rank FROM ("
            + _ann.cosine_topk_sql(k=10, n_queries=5)
            + ") s CROSS JOIN (VALUES ('exact'), ('ivf_exact'))"
            " AS v(variant) UNION ALL "
            "SELECT v.variant, s.query_id, s.vec_id,"
            " s.adc_d2 AS score, s.rank FROM ("
            + _ann.pq_adc_topk_sql(m=8, dsub=8, n_codes=128, k=10,
                                   n_queries=5)
            + ") s CROSS JOIN (VALUES ('pq_adc'), ('ivfpq_adc'))"
            " AS v(variant)"
        ),
        # e_quantize: tag-union of the int8 flat form and the PQ code
        # assignment (subspace→dim_idx, code→q, scale fixed 0.0)
        "e_quantize": (
            "SELECT 'int8' AS variant, vec_id, dim_idx, q, scale FROM ("
            + _ann.quantize_embeddings_sql(dim=64)
            + ") UNION ALL "
            "SELECT 'pq8x128' AS variant, vec_id,"
            " CAST(subspace AS BIGINT) AS dim_idx,"
            " CAST(code AS BIGINT) AS q, 0.0 AS scale FROM ("
            + _ann.pq_encode_sql(m=8, dsub=8, n_codes=128)
            + ")"
        ),
        "r_pricing_summary": _rel.RELATIONAL_UNION_SQL,
        # m_multimodal_features (value-gated, round 3): the formula
        # fixtures make every decoded feature a closed-form function of
        # (i, r, c, ch) / (i, k) / (i, f, p) that the oracle recomputes
        # without decoding a byte — codec bugs become value mismatches.
        "m_multimodal_features": _mm.multimodal_features_sql(4),
    }
