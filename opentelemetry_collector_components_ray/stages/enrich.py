"""Enrich stage: scalar derivations + broadcast lookup enrichment.

Scalar part (stateless tasks) — Ray-Data analogue of the
elasticapmprocessor enrichments:

- ``event_outcome`` ladder: error ⇒ failure, status ≥ 500 ⇒ failure,
  no status ⇒ unknown, else success (reference
  processor/elasticapmprocessor/internal/enrichments/span.go:521-547);
- ``result_class`` from status-code class, 'HTTP 2xx' style
  (span.go:489-514);
- ``duration_us`` from latency (span.go:1035-1037);
- ``service_name`` sanitize regex ``[^a-zA-Z0-9 _-]`` → ``_`` +
  100-unit truncation (resource.go:297-307).

Lookup part (actor pool) — broadcast-dict enrichment keyed on
``tool``/``role``, the analogue of elasticmetadataprocessor's
metadata→field copies and the static dict lookups (resource.go:250-270);
tables ship once via ``ray.put`` and are resolved in ``__init__``
(once per actor), lookups are vectorized ``index_in``+``take``
(SURVEY.md §2.7) — never a shuffle join.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.lookups import ROLE_MAP, TOOL_CATALOG

SANITIZE_PATTERN = r"[^a-zA-Z0-9 _-]"
SANITIZE_MAX_LEN = 100


def sanitize_name(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Service-name sanitization (resource.go:297-307)."""
    repl = pc.replace_substring_regex(col, SANITIZE_PATTERN, "_")
    return pc.utf8_slice_codeunits(repl, 0, SANITIZE_MAX_LEN)


def enrich_scalar_batch(batch: pa.Table) -> pa.Table:
    status = batch["status"]
    err = batch["err_code"]
    lat = batch["latency_ms"]

    has_err = pc.is_valid(err)
    has_status = pc.is_valid(status)
    ge500 = pc.fill_null(pc.greater_equal(status, 500), False)
    failure = pc.or_(has_err, ge500)
    # ladder: failure > unknown (no status, no err) > success
    outcome = pc.if_else(
        failure,
        pa.scalar("failure"),
        pc.if_else(has_status, pa.scalar("success"), pa.scalar("unknown")),
    )

    status_class = pc.cast(pc.divide(status, 100), pa.int32())
    result_class = pc.if_else(
        has_status,
        pc.binary_join_element_wise(
            pa.scalar("HTTP"),
            pc.cast(status_class, pa.string()),
            " ",
        ),
        pa.scalar("unknown"),
    )
    result_class = pc.if_else(
        has_status,
        pc.binary_join_element_wise(result_class, pa.scalar("xx"), ""),
        pa.scalar("unknown"),
    )

    duration_us = pc.cast(pc.multiply(pc.cast(lat, pa.int64()), 1000), pa.int64())

    svc_raw = pc.binary_join_element_wise(
        batch["role"],
        pc.if_else(pc.equal(batch["tool"], ""), pa.scalar("none"), batch["tool"]),
        ":",
    )
    # (role, tool) is low-cardinality: dictionary-encode and run the
    # sanitize regex over the ~50 distinct values, not every row
    svc_dict = pc.dictionary_encode(svc_raw)
    if isinstance(svc_dict, pa.ChunkedArray):
        svc_dict = svc_dict.combine_chunks()
    service_name = pc.take(
        sanitize_name(svc_dict.dictionary), svc_dict.indices
    )

    # error id: the reference mints a random 32-hex id per error event
    # (internal/enrichments/attribute/error_id.go:27-35); a
    # deterministic engine derives it from identity instead —
    # md5(conv_id:turn_idx), already 32 hex chars — so reruns and the
    # oracle agree.  Computed only for failure rows.
    key = pc.binary_join_element_wise(
        batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), ":"
    )
    fail_keys = pc.filter(key, failure)
    if len(fail_keys):
        from ..functions.md5vec import md5_hex

        # numpy-vectorized single-block MD5 (functions/md5vec.py) —
        # identity keys are unique per row, so only a vectorized digest
        # (not np.unique amortization) takes this off the hot path
        digests = md5_hex(fail_keys)
        if isinstance(failure, pa.ChunkedArray):
            failure_c = failure.combine_chunks()
        else:
            failure_c = failure
        error_id = pc.replace_with_mask(
            pa.nulls(batch.num_rows, pa.string()), failure_c, digests
        )
    else:
        error_id = pa.nulls(batch.num_rows, pa.string())

    return (
        batch.append_column("event_outcome", outcome)
        .append_column("result_class", result_class)
        .append_column("duration_us", duration_us)
        .append_column("service_name", service_name)
        .append_column("error_id", error_id)
    )


class LookupEnricher:
    """Actor-pool stage holding the broadcast lookup tables.

    ``__init__`` runs once per actor: resolves the ``ray.put`` refs (or
    falls back to the in-code catalogs) and pre-builds Arrow key/value
    arrays.  ``__call__`` runs per batch, fully vectorized.

    Use this shape when the broadcast state is genuinely expensive
    (models, big vocabularies, compiled parser tables — the reference's
    uaparser analogue, elasticapmprocessor span.go:74-78).  For the
    tiny role/tool dicts the default pipeline uses the stateless twin
    :func:`lookup_batch`: a fused task stage scales elastically, while
    an actor pool's lazy ramp-up serializes the whole fused
    read→parse→enrich chain behind pool scale-up.
    """

    def __init__(self, tool_ref=None, role_ref=None):
        tool_cat = ray.get(tool_ref) if tool_ref is not None else TOOL_CATALOG
        role_map = ray.get(role_ref) if role_ref is not None else ROLE_MAP
        self._tool = tool_cat
        self._role = role_map

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col, arr in self._tool.lookup(batch["tool"]).items():
            batch = batch.append_column(col, arr)
        for col, arr in self._role.lookup(batch["role"]).items():
            batch = batch.append_column(col, arr)
        return batch


_STATELESS_ENRICHER: LookupEnricher | None = None


def lookup_batch(batch: pa.Table) -> pa.Table:
    """Stateless lookup enrich; catalog arrays cached per worker process
    (module global) — same amortization as an actor, no pool to ramp."""
    global _STATELESS_ENRICHER
    if _STATELESS_ENRICHER is None:
        _STATELESS_ENRICHER = LookupEnricher()
    return _STATELESS_ENRICHER(batch)


def enrich_stage(
    ds: rd.Dataset,
    batch_size: int = 65536,
    lookup_concurrency: Optional[int] = None,
    broadcast: bool = True,
    use_actor_pool: bool = False,
) -> rd.Dataset:
    """Scalar enrich then lookup enrich.

    Default: both stateless task stages (fuse with parse, scale
    elastically).  ``use_actor_pool=True`` runs the lookup on an
    autoscaling actor pool with the catalogs shipped via ``ray.put`` —
    the shape for expensive broadcast state (see LookupEnricher).
    """
    ds = ds.map_batches(
        enrich_scalar_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if not use_actor_pool:
        return ds.map_batches(
            lookup_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    kwargs = {}
    if broadcast and ray.is_initialized():
        kwargs = {
            "fn_constructor_kwargs": {
                "tool_ref": ray.put(TOOL_CATALOG),
                "role_ref": ray.put(ROLE_MAP),
            }
        }
    if lookup_concurrency is None:
        # autoscale the pool up to the cluster CPU count so a fused
        # upstream chain is never throttled by a small fixed pool
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        lookup_concurrency = (1, max(2, ncpu))
    return ds.map_batches(
        LookupEnricher,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=lookup_concurrency,
        num_cpus=1,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Oracle SQL (generated from the same catalogs)
# ---------------------------------------------------------------------------

ENRICHED_SQL_COLUMNS = f"""
  CASE WHEN err_code IS NOT NULL OR (status IS NOT NULL AND status >= 500)
       THEN 'failure'
       WHEN status IS NOT NULL THEN 'success'
       ELSE 'unknown' END AS event_outcome,
  CASE WHEN status IS NOT NULL
       THEN 'HTTP ' || CAST(status // 100 AS VARCHAR) || 'xx'
       ELSE 'unknown' END AS result_class,
  CAST(latency_ms AS BIGINT) * 1000 AS duration_us,
  substr(regexp_replace(role || ':' ||
         CASE WHEN tool = '' THEN 'none' ELSE tool END,
         '[^a-zA-Z0-9 _-]', '_', 'g'), 1, 100) AS service_name,
  CASE WHEN err_code IS NOT NULL OR (status IS NOT NULL AND status >= 500)
       THEN md5(conv_id || ':' || CAST(turn_idx AS VARCHAR))
       ELSE NULL END AS error_id,
  {TOOL_CATALOG.sql_case('tool', 'tool_category')} AS tool_category,
  {TOOL_CATALOG.sql_case('tool', 'is_external')} AS is_external,
  {ROLE_MAP.sql_case('role', 'role_group')} AS role_group,
  {ROLE_MAP.sql_case('role', 'agent_name')} AS agent_name
"""

ENRICHED_SQL = (
    "SELECT parsed.*, " + ENRICHED_SQL_COLUMNS + " FROM parsed"
)


# ---------------------------------------------------------------------------
# Mode dispatch: per-record enricher selection.  The reference keeps
# THREE enricher implementations per signal (default / APM / OTel) and
# picks one per record from its origin (telemetry.sdk.name ==
# "ElasticAPM") and the x-elastic-mapping-mode client metadata
# (processor/elasticapmprocessor/processor.go:96-130, config.go:24-38).
# Batch translation: a mode column partitions each batch, each
# partition runs its own enrich kernel, partitions re-concatenate
# (row order within a batch is not preserved — consistent with the
# engine's unordered semantics).
# ---------------------------------------------------------------------------


def dispatch_enrich(
    ds,
    enrichers: dict,
    mode_fn,
    batch_size: int = 65536,
):
    """``mode_fn(batch) -> pa.Array[string]`` names the enricher for
    each row; ``enrichers[name](sub_batch) -> pa.Table`` runs on that
    row slice.  All enrichers must emit the same schema.  Unknown modes
    raise (the reference's default enricher is just another entry)."""

    names = list(enrichers)

    def fn(batch: pa.Table) -> pa.Table:
        modes = mode_fn(batch)
        seen = pc.unique(modes).to_pylist()
        unknown = [m for m in seen if m not in enrichers]
        if unknown:
            raise ValueError(
                f"no enricher for mode(s) {unknown}; have {names}"
            )
        parts = []
        for name in names:
            sub = batch.filter(pc.equal(modes, name))
            if sub.num_rows:
                parts.append(enrichers[name](sub))
        if not parts:
            # preserve schema on empty batches
            return enrichers[names[0]](batch)
        return pa.concat_tables(parts)

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# User-agent parsing — the uap-style stateful parser the reference
# shares across enrichers (internal/enrichments/enricher.go:36-47: the
# ~500-regex uap-core catalog compiled ONCE per process via
# sync.OnceValue; span.go:457-467 derives user_agent.name = family and
# user_agent.version, applied only when not already set,
# span.go:893-905).  Engine analogue: an ordered first-match-wins
# pattern catalog evaluated vectorized (one pc.extract_regex per
# pattern, ~constant pattern count), with the per-process cache as the
# compile-once analogue.  The catalog below is a small public-knowledge
# subset of the uap-core shapes (browsers/tools/bots); swap in the full
# uap-core regexes the same way when available.
# ---------------------------------------------------------------------------

# (family, regex with (major)(minor) groups) — ORDER MATTERS
# (Edge/Opera tokens also contain "Chrome/", so they come first)
# named groups: pc.extract_regex requires them; DuckDB regexp_extract
# addresses the same groups positionally (1=major, 2=minor)
UA_PATTERNS: tuple = (
    ("Edge", r"Edg/(?P<major>\d+)\.(?P<minor>\d+)"),
    ("Opera", r"OPR/(?P<major>\d+)\.(?P<minor>\d+)"),
    ("Chrome", r"Chrome/(?P<major>\d+)\.(?P<minor>\d+)"),
    ("Firefox", r"Firefox/(?P<major>\d+)\.(?P<minor>\d+)"),
    ("Safari", r"Version/(?P<major>\d+)\.(?P<minor>\d+)[^;]*Safari"),
    ("curl", r"curl/(?P<major>\d+)\.(?P<minor>\d+)"),
    ("python-requests", r"python-requests/(?P<major>\d+)\.(?P<minor>\d+)"),
    ("Googlebot", r"Googlebot/(?P<major>\d+)\.(?P<minor>\d+)"),
)
UA_OTHER = "Other"


def parse_user_agent_batch(
    ua: pa.ChunkedArray | pa.Array,
) -> tuple:
    """(ua_name, ua_version) arrays: first matching catalog pattern
    wins; no match → ("Other", null).  Fully vectorized: one RE2 pass
    per catalog pattern over the batch."""
    if isinstance(ua, pa.ChunkedArray):
        ua = ua.combine_chunks()
    n = len(ua)
    name = pa.nulls(n, pa.string())
    version = pa.nulls(n, pa.string())
    for family, pattern in UA_PATTERNS:
        ex = pc.extract_regex(ua, pattern)
        hit = pc.is_valid(ex)
        fresh = pc.and_(hit, pc.is_null(name))
        if not pc.any(fresh).as_py():
            continue
        major = pc.struct_field(ex, "major")
        minor = pc.struct_field(ex, "minor")
        ver = pc.binary_join_element_wise(major, minor, ".")
        name = pc.if_else(fresh, pa.scalar(family), name)
        version = pc.if_else(fresh, ver, version)
    name = pc.fill_null(name, UA_OTHER)
    return name, version


def parse_user_agent(
    ds, ua_col: str = "user_agent", batch_size: int = 65536
):
    """Append ``ua_name``/``ua_version`` derived from ``ua_col``
    (only-if-missing semantics live with the caller: the reference
    applies inferred values only when the explicit attributes are
    unset)."""

    def fn(batch: pa.Table) -> pa.Table:
        name, version = parse_user_agent_batch(batch[ua_col])
        return batch.append_column("ua_name", name).append_column(
            "ua_version", version
        )

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def parse_user_agent_sql(ua_expr: str = "user_agent") -> str:
    """DuckDB twin generated from the SAME catalog (no drift)."""
    name_case = ["CASE"]
    ver_case = ["CASE"]
    for family, pattern in UA_PATTERNS:
        cond = f"regexp_matches({ua_expr}, '{pattern}')"
        name_case.append(f"WHEN {cond} THEN '{family}'")
        ver_case.append(
            f"WHEN {cond} THEN regexp_extract({ua_expr}, '{pattern}', 1)"
            f" || '.' || regexp_extract({ua_expr}, '{pattern}', 2)"
        )
    name_case.append(f"ELSE '{UA_OTHER}' END")
    ver_case.append("ELSE NULL END")
    return (
        " ".join(name_case) + " AS ua_name, "
        + " ".join(ver_case) + " AS ua_version"
    )


# ---------------------------------------------------------------------------
# Round-3 enrichment breadth: span destination / service.target ladder
# and resource os/agent derivations.
#
# References:
# - service.target.*: processor/elasticapmprocessor/internal/
#   enrichments/span.go:623-671 (branch ladder db > messaging > rpc >
#   http; peer.service seeds the name, branch fields override).
# - span.destination.service.*, destination.address/port, url.original:
#   span.go:674-784 (httpDestinationDetails) + schemeDefaultPort
#   span.go:1082-1090 (http=80, https=443; default-port normalization:
#   an implicit default port is APPENDED to the resource, an explicit
#   default port is STRIPPED from the service name URL).
# - host.os.type ECS map, agent name/version chains, service.instance.id,
#   k8s node-name host override: internal/enrichments/
#   resource.go:187-285.
#
# Unset fields follow the pdata convention: attributes are only written
# when non-empty — modeled as NULL columns here.
# ---------------------------------------------------------------------------

# all groups named (pc.extract_regex requirement); the port wrapper is
# non-capturing so DuckDB positional groups stay 1=scheme 2=host 3=port
_URL_RE = (
    r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://(?P<host>[^/:?#]+)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[/?#].*)?$"
)


def _nonempty(col) -> pa.Array:
    # fill_null first: plain pc.and_ is not Kleene, so a null column
    # would poison the condition (null, not False) and null the output
    return pc.not_equal(pc.fill_null(col, ""), "")


def _coalesce_str(*cols):
    out = cols[-1]
    for c in reversed(cols[:-1]):
        out = pc.if_else(_nonempty(c), c, out)
    return out


# ipv6-ish literal: only hex digits and at least two colons.  Stands in
# for Go's net.ParseIP on the colon branch of normalizeAttributes
# (span.go:458-462): a colon-free peer.address is accepted as-is, a
# colon-bearing one must be an IP literal (connection strings like
# "host:6379" are rejected).
_IPV6ISH_RE = r"^[0-9A-Fa-f]*:[0-9A-Fa-f]*:[0-9A-Fa-f:]*$"
_ABS_URL_RE = r"^[a-z][a-z0-9+.\-]*://"


def _host_port(host, port):
    """host or host:port when port > 0 (Go net.JoinHostPort analogue,
    span.go:819-823; hosts here are never bracketed v6 literals)."""
    port = pc.fill_null(port, 0)
    return pc.if_else(
        pc.greater(port, 0),
        pc.binary_join_element_wise(
            pc.fill_null(host, ""), pc.cast(port, pa.string()), ":"
        ),
        pc.fill_null(host, ""),
    )


def normalize_span_attrs_batch(batch: pa.Table) -> pa.Table:
    """Vectorized normalizeAttributes (span.go:447-469) +
    buildURLFromComponents (span.go:786-828).

    Consumes nullable columns ``url_full, http_target, url_scheme,
    url_path, url_query, http_host, url_domain, url_port (int),
    server_address, server_port (int), peer_address, net_peer_ip,
    rpc_system, grpc_status`` and REPLACES ``rpc_system,
    server_address, url_full`` with the normalized values:

    - ``rpc_system`` defaults to ``grpc`` when a gRPC status code was
      captured without an explicit rpc.system (span.go:448-450);
    - ``server_address`` falls back to a hostname-like peer.address
      (colon-free, or an IP literal) else net peer IP (span.go:451-463);
    - ``url.full`` is built from components when absent: target from
      http.target else url.path[?url.query], scheme from url.scheme
      (default http), host from http.host else url.domain[:url.port]
      else server.address[:server.port] (span.go:464-466,786-828).
      Divergence from Go, documented: a component URL with no host
      source is not built at all (Go builds a host-less URL whose
      Hostname() is empty, so every downstream consumer treats it as
      absent anyway).
    """
    n = batch.num_rows
    null_s = pa.nulls(n, pa.string())

    def col(name, typ=pa.string()):
        if name in batch.column_names:
            c = batch[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            if pa.types.is_null(c.type):
                c = c.cast(typ)
            return c
        return pa.nulls(n, typ)

    rpc_system = col("rpc_system")
    grpc_status = col("grpc_status")
    rpc_system = pc.if_else(
        pc.and_(pc.invert(_nonempty(rpc_system)), _nonempty(grpc_status)),
        pa.scalar("grpc"),
        rpc_system,
    )

    server_address = col("server_address")
    peer_address = col("peer_address")
    net_peer_ip = col("net_peer_ip")
    peer_filled = pc.fill_null(peer_address, "")
    peer_hostname_like = pc.and_(
        _nonempty(peer_address),
        pc.or_(
            pc.invert(pc.match_substring(peer_filled, ":")),
            pc.match_substring_regex(peer_filled, _IPV6ISH_RE),
        ),
    )
    server_address = pc.if_else(
        _nonempty(server_address),
        server_address,
        pc.if_else(
            peer_hostname_like,
            peer_address,
            pc.if_else(_nonempty(net_peer_ip), net_peer_ip, null_s),
        ),
    )

    url_full = col("url_full")
    http_target = col("http_target")
    url_path = col("url_path")
    url_query = col("url_query")
    target = pc.if_else(
        _nonempty(http_target),
        http_target,
        pc.if_else(
            _nonempty(url_path),
            pc.if_else(
                _nonempty(url_query),
                pc.binary_join_element_wise(
                    pc.fill_null(url_path, ""),
                    pc.fill_null(url_query, ""),
                    "?",
                ),
                url_path,
            ),
            null_s,
        ),
    )
    target_abs = pc.match_substring_regex(
        pc.fill_null(target, ""), _ABS_URL_RE
    )
    host = _coalesce_str(
        col("http_host"),
        pc.if_else(
            _nonempty(col("url_domain")),
            _host_port(col("url_domain"), col("url_port", pa.int64())),
            null_s,
        ),
        pc.if_else(
            _nonempty(server_address),
            _host_port(server_address, col("server_port", pa.int64())),
            null_s,
        ),
        null_s,
    )
    scheme = pc.if_else(
        _nonempty(col("url_scheme")), col("url_scheme"), pa.scalar("http")
    )
    built = pc.if_else(
        target_abs,
        target,
        pc.if_else(
            pc.and_(_nonempty(host), _nonempty(target)),
            pc.binary_join_element_wise(
                scheme,
                pc.binary_join_element_wise(
                    pc.fill_null(host, ""), pc.fill_null(target, ""), ""
                ),
                "://",
            ),
            null_s,
        ),
    )
    url_full = pc.if_else(_nonempty(url_full), url_full, built)

    out = batch
    for name, arr in (
        ("rpc_system", rpc_system),
        ("server_address", server_address),
        ("url_full", url_full),
    ):
        if name in out.column_names:
            out = out.set_column(
                out.column_names.index(name), name, arr
            )
        else:
            out = out.append_column(name, arr)
    return out


def normalize_span_attrs_sql(inputs: str) -> str:
    """DuckDB twin of :func:`normalize_span_attrs_batch`."""
    return f"""
SELECT * EXCLUDE (rpc_system, server_address, url_full, _target, _host),
       rpc_system, server_address,
       CASE WHEN COALESCE(url_full, '') <> '' THEN url_full
            WHEN regexp_matches(COALESCE(_target, ''),
                                '{_ABS_URL_RE}') THEN _target
            WHEN COALESCE(_host, '') <> '' AND COALESCE(_target, '') <> ''
            THEN COALESCE(NULLIF(url_scheme, ''), 'http')
                 || '://' || _host || _target
       END AS url_full
FROM (
  SELECT *,
         CASE WHEN COALESCE(http_host, '') <> '' THEN http_host
              WHEN COALESCE(url_domain, '') <> '' THEN
                CASE WHEN COALESCE(url_port, 0) > 0
                     THEN url_domain || ':' || CAST(CAST(url_port AS BIGINT) AS VARCHAR)
                     ELSE url_domain END
              WHEN COALESCE(server_address, '') <> '' THEN
                CASE WHEN COALESCE(server_port, 0) > 0
                     THEN server_address || ':'
                          || CAST(CAST(server_port AS BIGINT) AS VARCHAR)
                     ELSE server_address END
         END AS _host
  FROM (
    SELECT * EXCLUDE (rpc_system, server_address),
           CASE WHEN COALESCE(rpc_system, '') = ''
                     AND COALESCE(grpc_status, '') <> ''
                THEN 'grpc' ELSE rpc_system END AS rpc_system,
           CASE WHEN COALESCE(server_address, '') <> ''
                THEN server_address
                WHEN COALESCE(peer_address, '') <> ''
                     AND (peer_address NOT LIKE '%:%'
                          OR regexp_matches(peer_address,
                                            '{_IPV6ISH_RE}'))
                THEN peer_address
                WHEN COALESCE(net_peer_ip, '') <> '' THEN net_peer_ip
           END AS server_address,
           CASE WHEN COALESCE(http_target, '') <> '' THEN http_target
                WHEN COALESCE(url_path, '') <> '' THEN
                  CASE WHEN COALESCE(url_query, '') <> ''
                       THEN url_path || '?' || url_query
                       ELSE url_path END
           END AS _target
    FROM ({inputs}) i
  )
)
"""


def enrich_span_dest_batch(batch: pa.Table) -> pa.Table:
    """Vectorized span.go:623-784 ladder.  Consumes nullable string
    columns ``url_full, db_system, db_name, messaging_system,
    messaging_destination, messaging_temp (bool), rpc_system,
    rpc_service, peer_service, peer_address`` and appends
    ``service_target_type, service_target_name, destination_address,
    destination_port, url_original, span_destination_service_name,
    span_destination_service_resource, span_destination_service_type``.
    """
    n = batch.num_rows
    null_s = pa.nulls(n, pa.string())
    empty = pa.array([""] * n, pa.string())

    def col(name, default=None):
        if name in batch.column_names:
            c = batch[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            if pa.types.is_null(c.type):
                # all-null blocks arrive as Arrow null type; cast to the
                # expected type so fill_null/equal kernels don't choke
                c = c.cast(default.type if default is not None
                           else pa.string())
            return c
        return default if default is not None else null_s

    url = col("url_full")
    peer_service = col("peer_service")
    peer_address = col("peer_address")
    db_system, db_name = col("db_system"), col("db_name")
    msg_system = col("messaging_system")
    msg_dest = col("messaging_destination")
    msg_temp = col("messaging_temp", pa.array([False] * n, pa.bool_()))
    rpc_system, rpc_service = col("rpc_system"), col("rpc_service")
    msg_operation = col("messaging_operation")

    # ---- url parse + default-port normalization (span.go:736-784)
    parts = pc.extract_regex(pc.fill_null(url, ""), _URL_RE)
    ok_url = pc.and_(pc.is_valid(url), pc.is_valid(parts))
    scheme = pc.if_else(ok_url, pc.struct_field(parts, "scheme"), null_s)
    hostname = pc.if_else(ok_url, pc.struct_field(parts, "host"), null_s)
    port_str = pc.if_else(ok_url, pc.struct_field(parts, "port"), null_s)
    has_port = _nonempty(port_str)
    default_port = pc.case_when(
        pc.make_struct(
            pc.equal(scheme, "http"), pc.equal(scheme, "https")
        ),
        pa.scalar(80, pa.int64()), pa.scalar(443, pa.int64()),
        pa.scalar(0, pa.int64()),
    )
    dest_port = pc.if_else(
        has_port,
        pc.cast(pc.if_else(has_port, port_str, "0"), pa.int64()),
        default_port,
    )
    # Host as written: hostname[:port if explicitly present]
    host_as_written = pc.if_else(
        has_port,
        pc.binary_join_element_wise(hostname, port_str, ":"),
        hostname,
    )
    is_default = pc.and_(
        pc.greater(default_port, 0), pc.equal(dest_port, default_port)
    )
    # resource: implicit default port appended
    resource = pc.if_else(
        pc.and_(is_default, pc.invert(has_port)),
        pc.binary_join_element_wise(
            hostname, pc.cast(default_port, pa.string()), ":"
        ),
        host_as_written,
    )
    # url-for-name host: explicit default port stripped
    name_host = pc.if_else(
        pc.and_(is_default, has_port), hostname, host_as_written
    )
    http_name = pc.binary_join_element_wise(scheme, name_host, "://")
    url_original = pc.if_else(ok_url, url, null_s)

    # ---- branch flags (ladder order db > messaging > rpc > http);
    # any messaging attr marks the span as messaging (capture,
    # span.go:192-207): system, destination or operation
    is_db = _nonempty(db_system)
    is_msg = pc.and_(
        pc.invert(is_db),
        pc.or_(
            pc.or_(_nonempty(msg_system), _nonempty(msg_dest)),
            _nonempty(msg_operation),
        ),
    )
    is_rpc = pc.and_(
        pc.invert(pc.or_(is_db, is_msg)), _nonempty(rpc_system)
    )
    is_http = pc.and_(
        pc.invert(pc.or_(pc.or_(is_db, is_msg), is_rpc)), ok_url
    )

    peer = pc.fill_null(peer_service, "")

    # ---- service.target (span.go:623-671)
    t_type = pc.case_when(
        pc.make_struct(is_db, is_msg, is_rpc, is_http),
        _coalesce_str(db_system, pa.array(["db"] * n, pa.string())),
        _coalesce_str(msg_system, pa.array(["messaging"] * n, pa.string())),
        _coalesce_str(rpc_system, pa.array(["external"] * n, pa.string())),
        pa.array(["http"] * n, pa.string()),
        empty,
    )
    msg_name_ok = pc.and_(
        pc.invert(pc.fill_null(msg_temp, False)), _nonempty(msg_dest)
    )
    t_name = pc.case_when(
        pc.make_struct(is_db, is_msg, is_rpc, is_http),
        pc.if_else(_nonempty(db_name), pc.fill_null(db_name, ""), peer),
        pc.if_else(msg_name_ok, pc.fill_null(msg_dest, ""), peer),
        pc.if_else(
            _nonempty(rpc_service), pc.fill_null(rpc_service, ""), peer
        ),
        # http: a parsed url's resource overrides peer.service
        pc.if_else(ok_url, pc.fill_null(resource, ""), peer),
        peer,
    )
    any_target = pc.or_(pc.not_equal(t_type, ""), pc.not_equal(t_name, ""))
    service_target_type = pc.if_else(any_target, t_type, null_s)
    service_target_name = pc.if_else(any_target, t_name, null_s)

    # ---- span.destination.service.* (span.go:674-728)
    destn0 = pc.if_else(
        pc.and_(_nonempty(peer_service), _nonempty(peer_address)),
        pc.fill_null(peer_address, ""),
        peer,
    )
    http_details = pc.and_(is_http, ok_url)
    dest_name = pc.if_else(
        http_details,
        pc.if_else(_nonempty(peer_service), peer, http_name),
        null_s,
    )
    dest_type = pc.if_else(
        pc.or_(is_rpc, is_http),
        pc.if_else(http_details, pa.scalar("external"), null_s),
        null_s,
    )
    no_destn = pc.equal(destn0, "")
    destn = pc.case_when(
        pc.make_struct(is_db, is_msg, pc.or_(is_rpc, is_http)),
        pc.if_else(
            pc.and_(no_destn, _nonempty(db_system)),
            pc.fill_null(db_system, ""), destn0,
        ),
        pc.if_else(
            pc.and_(_nonempty(
                pc.if_else(no_destn, msg_system, destn0)
            ), _nonempty(msg_dest)),
            pc.binary_join_element_wise(
                pc.if_else(no_destn, pc.fill_null(msg_system, ""), destn0),
                pc.fill_null(msg_dest, ""), "/",
            ),
            pc.if_else(no_destn, pc.fill_null(msg_system, ""), destn0),
        ),
        pc.if_else(
            pc.and_(http_details, pc.invert(_nonempty(peer_service))),
            pc.fill_null(resource, ""),
            pc.if_else(
                no_destn,
                # rpc fallback: getHostPort returns the host AS WRITTEN
                # (span.go:1061-1080) — no default-port normalization;
                # component fallbacks url.domain[:url.port] then
                # server.address[:server.port] before rpc.service
                pc.if_else(
                    pc.and_(ok_url, pc.invert(http_details)),
                    pc.fill_null(host_as_written, ""),
                    pc.if_else(
                        _nonempty(col("url_domain")),
                        _host_port(
                            col("url_domain"), col(
                                "url_port", pa.nulls(n, pa.int64())
                            )
                        ),
                        pc.if_else(
                            _nonempty(col("server_address")),
                            _host_port(
                                col("server_address"),
                                col("server_port",
                                    pa.nulls(n, pa.int64())),
                            ),
                            pc.fill_null(rpc_service, ""),
                        ),
                    ),
                ),
                destn0,
            ),
        ),
        destn0,
    )
    span_destination_service_resource = pc.if_else(
        pc.not_equal(pc.fill_null(destn, ""), ""), destn, null_s
    )

    out_port = pc.if_else(
        pc.and_(http_details, pc.greater(dest_port, 0)), dest_port,
        pa.nulls(n, pa.int64()),
    )
    # transaction.type ladder (span.go:476-487): explicit type value >
    # messaging > request (rpc/http) > unknown
    type_value = col("type_value")
    txn_type = pc.case_when(
        pc.make_struct(
            _nonempty(type_value), is_msg, pc.or_(is_rpc, is_http)
        ),
        pc.fill_null(type_value, ""),
        pa.array(["messaging"] * n, pa.string()),
        pa.array(["request"] * n, pa.string()),
        pa.array(["unknown"] * n, pa.string()),
    )
    # trace-root flag (span.go:1039-1041): empty parent span id
    parent_span = col("parent_span_id")
    trace_root = pc.invert(_nonempty(parent_span))
    # span.type / span.subtype ladder (span.go:588-621): db > messaging
    # > rpc > http > genai > internal-kind app > unknown
    genai_system = col("genai_system")
    span_kind = col("span_kind")
    is_genai = pc.and_(
        pc.invert(
            pc.or_(pc.or_(is_db, is_msg), pc.or_(is_rpc, is_http))
        ),
        _nonempty(genai_system),
    )
    is_internal = pc.and_(
        pc.invert(
            pc.or_(
                pc.or_(pc.or_(is_db, is_msg), pc.or_(is_rpc, is_http)),
                is_genai,
            )
        ),
        pc.equal(pc.fill_null(span_kind, ""), "internal"),
    )
    span_type = pc.case_when(
        pc.make_struct(is_db, is_msg, pc.or_(is_rpc, is_http), is_genai,
                       is_internal),
        pa.array(["db"] * n, pa.string()),
        pa.array(["messaging"] * n, pa.string()),
        pa.array(["external"] * n, pa.string()),
        pa.array(["genai"] * n, pa.string()),
        pa.array(["app"] * n, pa.string()),
        pa.array(["unknown"] * n, pa.string()),
    )
    sub = pc.case_when(
        pc.make_struct(is_db, is_msg, is_rpc, is_http, is_genai,
                       is_internal),
        pc.fill_null(db_system, ""),
        pc.fill_null(msg_system, ""),
        pc.fill_null(rpc_system, ""),
        pa.array(["http"] * n, pa.string()),
        pc.fill_null(genai_system, ""),
        pa.array(["internal"] * n, pa.string()),
        pa.array([""] * n, pa.string()),
    )
    span_subtype = pc.if_else(pc.not_equal(sub, ""), sub, null_s)
    # transaction.result + success_count (span.go:489-547): HTTP class
    # string ("HTTP nxx", raw code outside 1-5xx), grpc status for rpc,
    # span-status Error/Success fallback; success_count = the
    # representative (sampling-weight) count, zeroed on failure
    http_status = col("http_status", pa.nulls(n, pa.int64()))
    grpc_status = col("grpc_status")
    span_status = col("span_status")
    weight = col("weight", pa.array([1.0] * n, pa.float64()))
    has_http_status = pc.and_(
        is_http, pc.fill_null(pc.greater(http_status, 0), False)
    )
    klass = pc.cast(
        pc.if_else(
            pc.is_valid(http_status), http_status, pa.scalar(0)
        ),
        pa.int64(),
    )
    klass = pc.divide(klass, 100)
    in_range = pc.and_(
        pc.greater_equal(klass, 1), pc.less_equal(klass, 5)
    )
    http_result = pc.if_else(
        in_range,
        pc.binary_join_element_wise(
            pa.array(["HTTP"] * n, pa.string()),
            pc.binary_join_element_wise(
                pc.cast(klass, pa.string()),
                pa.array(["xx"] * n, pa.string()), "",
            ),
            " ",
        ),
        pc.binary_join_element_wise(
            pa.array(["HTTP"] * n, pa.string()),
            pc.cast(pc.fill_null(http_status, 0), pa.string()),
            " ",
        ),
    )
    result0 = pc.case_when(
        pc.make_struct(is_rpc, has_http_status),
        pc.fill_null(grpc_status, ""),
        http_result,
        pa.array([""] * n, pa.string()),
    )
    fallback = pc.if_else(
        pc.equal(pc.fill_null(span_status, ""), "error"),
        pa.scalar("Error"), pa.scalar("Success"),
    )
    txn_result = pc.if_else(
        pc.not_equal(result0, ""), result0, fallback
    )
    sc_zero = pc.or_(
        pc.equal(pc.fill_null(span_status, ""), "error"),
        pc.and_(
            pc.invert(pc.equal(pc.fill_null(span_status, ""), "ok")),
            pc.fill_null(pc.greater_equal(http_status, 500), False),
        ),
    )
    success_count = pc.if_else(
        sc_zero, pa.scalar(0.0), pc.cast(weight, pa.float64())
    )
    # ---- transaction/span dispatch (isElasticTransaction,
    # span.go:1043-1059: trace root, or server/consumer kind; the
    # span-flags remote-parent branches need pdata flags the columnar
    # model does not carry — documented simplification) and the
    # per-shape attrs: processor.event (span.go:351-352,419-420),
    # span.action from the messaging operation (span.go:549-553),
    # message queue name keyed by shape (span.go:555-572), and the
    # exit-root transaction.type refinement (span.go:434-445)
    kind_filled = pc.fill_null(span_kind, "")
    is_txn = pc.or_(
        trace_root,
        pc.is_in(
            kind_filled,
            value_set=pa.array(["server", "consumer"], pa.string()),
        ),
    )
    is_exit_root = pc.and_(
        is_txn,
        pc.is_in(
            kind_filled,
            value_set=pa.array(["client", "producer"], pa.string()),
        ),
    )
    is_span_shape = pc.or_(pc.invert(is_txn), is_exit_root)
    processor_event = pc.if_else(
        is_txn, pa.scalar("transaction"), pa.scalar("span")
    )
    span_action = pc.if_else(
        pc.and_(is_span_shape, _nonempty(msg_operation)),
        msg_operation, null_s,
    )
    txn_message_queue_name = pc.if_else(
        pc.and_(is_txn, _nonempty(msg_dest)), msg_dest, null_s
    )
    span_message_queue_name = pc.if_else(
        pc.and_(pc.invert(is_txn), _nonempty(msg_dest)), msg_dest, null_s
    )
    txn_type = pc.if_else(
        pc.and_(is_exit_root, pc.invert(_nonempty(type_value))),
        pc.if_else(
            _nonempty(span_subtype),
            pc.binary_join_element_wise(
                span_type, pc.fill_null(span_subtype, ""), "."
            ),
            span_type,
        ),
        txn_type,
    )
    # timestamp_us (span.go:322-324,389-391): start timestamp in epoch µs
    ts = col("ts", pa.nulls(n, pa.timestamp("us")))
    timestamp_us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
    return (
        batch.append_column("processor_event", processor_event)
        .append_column("span_action", span_action)
        .append_column("txn_message_queue_name", txn_message_queue_name)
        .append_column("span_message_queue_name", span_message_queue_name)
        .append_column("timestamp_us", timestamp_us)
        .append_column("txn_result", txn_result)
        .append_column("success_count", success_count)
        .append_column("txn_type", txn_type)
        .append_column("trace_root", trace_root)
        .append_column("span_type", span_type)
        .append_column("span_subtype", span_subtype)
        .append_column("service_target_type", service_target_type)
        .append_column("service_target_name", service_target_name)
        .append_column(
            "destination_address", pc.if_else(http_details, hostname, null_s)
        )
        .append_column("destination_port", out_port)
        .append_column(
            "url_original", pc.if_else(http_details, url_original, null_s)
        )
        .append_column("span_destination_service_name", dest_name)
        .append_column(
            "span_destination_service_resource",
            span_destination_service_resource,
        )
        .append_column("span_destination_service_type", dest_type)
    )


_OS_TYPE_MAP = {  # resource.go:250-270 (ECS os.type spec)
    "windows": "windows", "linux": "linux", "darwin": "macos",
    "aix": "unix", "hpux": "unix", "solaris": "unix",
}
_OS_NAME_MAP = {"Android": "android", "iOS": "ios"}


def enrich_resource_batch(batch: pa.Table) -> pa.Table:
    """Vectorized resource.go:187-285 derivations.  Consumes nullable
    string columns ``os_type, os_name, telemetry_sdk_name,
    telemetry_sdk_language, telemetry_sdk_version, telemetry_distro_name,
    telemetry_distro_version, container_id, host_name, k8s_node_name``
    and appends ``host_os_type, agent_name_full, agent_version,
    service_instance_id, host_name_final``."""
    n = batch.num_rows
    null_s = pa.nulls(n, pa.string())

    def col(name):
        if name in batch.column_names:
            c = batch[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            if pa.types.is_null(c.type):
                c = c.cast(pa.string())
            return c
        return null_s

    os_type, os_name = col("os_type"), col("os_name")
    sdk_name = col("telemetry_sdk_name")
    sdk_lang = col("telemetry_sdk_language")
    sdk_ver = col("telemetry_sdk_version")
    distro_name = col("telemetry_distro_name")
    distro_ver = col("telemetry_distro_version")
    container_id = col("container_id")
    host_name = col("host_name")
    k8s_node = col("k8s_node_name")

    # host.os.type: os.type map first, Android/iOS os.name overrides
    ost = pa.array(
        [""] * n, pa.string()
    )
    for k, v in _OS_TYPE_MAP.items():
        ost = pc.if_else(pc.equal(pc.fill_null(os_type, ""), k),
                         pa.scalar(v), ost)
    for k, v in _OS_NAME_MAP.items():
        ost = pc.if_else(pc.equal(pc.fill_null(os_name, ""), k),
                         pa.scalar(v), ost)
    host_os_type = pc.if_else(pc.not_equal(ost, ""), ost, null_s)

    # agent name chain (resource.go:187-212)
    base = pc.if_else(_nonempty(sdk_name), pc.fill_null(sdk_name, ""),
                      pa.scalar("otlp"))
    lang = pc.if_else(_nonempty(sdk_lang), pc.fill_null(sdk_lang, ""),
                      pa.scalar("unknown"))
    agent_name = pc.if_else(
        _nonempty(distro_name),
        pc.binary_join_element_wise(
            base, lang, pc.fill_null(distro_name, ""), "/"
        ),
        pc.if_else(
            _nonempty(sdk_lang),
            pc.binary_join_element_wise(base, pc.fill_null(sdk_lang, ""),
                                        "/"),
            base,
        ),
    )
    # agent version (resource.go:214-227): never fall back to the SDK
    # version when a distro name is present
    agent_version = pc.if_else(
        _nonempty(distro_name),
        pc.if_else(_nonempty(distro_ver), pc.fill_null(distro_ver, ""),
                   pa.scalar("unknown")),
        pc.if_else(_nonempty(sdk_ver), pc.fill_null(sdk_ver, ""),
                   pa.scalar("unknown")),
    )
    # service.instance.id (resource.go:275-285): container.id > host.name
    service_instance_id = pc.if_else(
        _nonempty(container_id), container_id,
        pc.if_else(_nonempty(host_name), host_name, null_s),
    )
    # k8s node name overrides host.name (resource.go:229-243)
    host_name_final = pc.if_else(_nonempty(k8s_node), k8s_node, host_name)

    # deployment.environment (resource.go:140-167): keep the legacy
    # attr, else alias the semconv name, else default "unset"
    dep_env = col("deployment_environment")
    dep_env_name = col("deployment_environment_name")
    deployment_environment_final = pc.if_else(
        _nonempty(dep_env), pc.fill_null(dep_env, ""),
        pc.if_else(
            _nonempty(dep_env_name), pc.fill_null(dep_env_name, ""),
            pa.scalar("unset"),
        ),
    )

    return (
        batch.append_column(
            "deployment_environment_final", deployment_environment_final
        )
        .append_column("host_os_type", host_os_type)
        .append_column("agent_name_full", agent_name)
        .append_column("agent_version", agent_version)
        .append_column("service_instance_id", service_instance_id)
        .append_column("host_name_final", host_name_final)
    )


# Positional group indexes for _URL_RE in DuckDB: 1=scheme, 2=host,
# 3=(:port) wrapper, 4=port, 5=path (pc.extract_regex needs NAMED
# groups; DuckDB reads the same pattern positionally).
def span_dest_sql(inputs: str) -> str:
    """DuckDB twin of :func:`enrich_span_dest_batch` over a subquery
    ``inputs`` providing the kernel's input columns."""
    re = _URL_RE.replace("?P<scheme>", "").replace("?P<host>", "")
    re = re.replace("?P<port>", "").replace("?P<path>", "")
    return f"""
SELECT * EXCLUDE (txn_type, _is_txn, _is_exit_root),
       CASE WHEN _is_exit_root AND COALESCE(type_value, '') = ''
            THEN span_type || COALESCE('.' || span_subtype, '')
            ELSE txn_type END AS txn_type,
       CASE WHEN _is_txn THEN 'transaction' ELSE 'span'
            END AS processor_event,
       CASE WHEN (NOT _is_txn OR _is_exit_root)
                 AND COALESCE(messaging_operation, '') <> ''
            THEN messaging_operation END AS span_action,
       CASE WHEN _is_txn AND COALESCE(messaging_destination, '') <> ''
            THEN messaging_destination END AS txn_message_queue_name,
       CASE WHEN NOT _is_txn
                 AND COALESCE(messaging_destination, '') <> ''
            THEN messaging_destination END AS span_message_queue_name,
       epoch_us(ts) AS timestamp_us
FROM (
SELECT *,
       (trace_root OR COALESCE(span_kind, '') IN ('server', 'consumer'))
         AS _is_txn,
       ((trace_root
         OR COALESCE(span_kind, '') IN ('server', 'consumer'))
        AND COALESCE(span_kind, '') IN ('client', 'producer'))
         AS _is_exit_root
FROM (
SELECT * EXCLUDE (ok_url, scheme, hostname, port_str, has_port,
                  default_port, dest_port, host_as_written, is_default,
                  resource, name_host, is_db, is_msg, is_rpc, is_http,
                  peer, t_type, t_name, destn0, destn),
       CASE WHEN t_type <> '' OR t_name <> '' THEN t_type END
         AS service_target_type,
       CASE WHEN t_type <> '' OR t_name <> '' THEN t_name END
         AS service_target_name,
       CASE WHEN is_http THEN hostname END AS destination_address,
       CASE WHEN is_http AND dest_port > 0 THEN dest_port END
         AS destination_port,
       CASE WHEN is_http THEN url_full END AS url_original,
       CASE WHEN is_http THEN
         CASE WHEN COALESCE(peer, '') <> '' THEN peer
              ELSE scheme || '://' || name_host END
       END AS span_destination_service_name,
       CASE WHEN destn <> '' THEN destn END
         AS span_destination_service_resource,
       CASE WHEN is_http THEN 'external' END
         AS span_destination_service_type,
       CASE WHEN COALESCE(type_value, '') <> '' THEN type_value
            WHEN is_msg THEN 'messaging'
            WHEN is_rpc OR is_http THEN 'request'
            ELSE 'unknown' END AS txn_type,
       COALESCE(parent_span_id, '') = '' AS trace_root,
       CASE WHEN is_db THEN 'db' WHEN is_msg THEN 'messaging'
            WHEN is_rpc OR is_http THEN 'external'
            WHEN COALESCE(genai_system, '') <> '' THEN 'genai'
            WHEN COALESCE(span_kind, '') = 'internal' THEN 'app'
            ELSE 'unknown' END AS span_type,
       NULLIF(CASE WHEN is_db THEN COALESCE(db_system, '')
                   WHEN is_msg THEN COALESCE(messaging_system, '')
                   WHEN is_rpc THEN COALESCE(rpc_system, '')
                   WHEN is_http THEN 'http'
                   WHEN COALESCE(genai_system, '') <> ''
                     THEN genai_system
                   WHEN COALESCE(span_kind, '') = 'internal'
                     THEN 'internal'
                   ELSE '' END, '') AS span_subtype,
       CASE WHEN COALESCE(
              CASE WHEN is_rpc THEN COALESCE(grpc_status, '')
                   WHEN is_http AND COALESCE(http_status, 0) > 0 THEN
                     CASE WHEN http_status // 100 BETWEEN 1 AND 5
                          THEN 'HTTP ' || CAST(http_status // 100
                                               AS VARCHAR) || 'xx'
                          ELSE 'HTTP ' || CAST(http_status AS VARCHAR)
                     END
                   ELSE '' END, '') <> ''
            THEN CASE WHEN is_rpc THEN COALESCE(grpc_status, '')
                      WHEN http_status // 100 BETWEEN 1 AND 5
                        THEN 'HTTP ' || CAST(http_status // 100
                                             AS VARCHAR) || 'xx'
                      ELSE 'HTTP ' || CAST(http_status AS VARCHAR) END
            WHEN COALESCE(span_status, '') = 'error' THEN 'Error'
            ELSE 'Success' END AS txn_result,
       CASE WHEN COALESCE(span_status, '') = 'error' THEN 0.0
            WHEN COALESCE(span_status, '') <> 'ok'
                 AND COALESCE(http_status, 0) >= 500 THEN 0.0
            ELSE 1.0 END AS success_count
FROM (
  SELECT *,
         CASE WHEN is_db THEN
                CASE WHEN COALESCE(db_name, '') <> '' THEN db_name
                     ELSE peer END
              WHEN is_msg THEN
                CASE WHEN NOT COALESCE(messaging_temp, FALSE)
                          AND COALESCE(messaging_destination, '') <> ''
                     THEN messaging_destination ELSE peer END
              WHEN is_rpc THEN
                CASE WHEN COALESCE(rpc_service, '') <> '' THEN rpc_service
                     ELSE peer END
              WHEN is_http THEN resource
              ELSE peer END AS t_name,
         CASE WHEN is_db THEN
                CASE WHEN COALESCE(destn0, '') = ''
                          AND COALESCE(db_system, '') <> ''
                     THEN db_system ELSE destn0 END
              WHEN is_msg THEN
                CASE WHEN COALESCE(CASE WHEN COALESCE(destn0, '') = ''
                                        THEN messaging_system
                                        ELSE destn0 END, '') <> ''
                          AND COALESCE(messaging_destination, '') <> ''
                     THEN (CASE WHEN COALESCE(destn0, '') = ''
                                THEN messaging_system ELSE destn0 END)
                          || '/' || messaging_destination
                     ELSE (CASE WHEN COALESCE(destn0, '') = ''
                                THEN COALESCE(messaging_system, '')
                                ELSE destn0 END) END
              WHEN is_http AND COALESCE(peer, '') = '' THEN resource
              WHEN is_rpc OR is_http THEN
                CASE WHEN COALESCE(destn0, '') = '' THEN
                       CASE WHEN ok_url AND NOT is_http
                            THEN host_as_written
                            WHEN COALESCE(url_domain, '') <> ''
                            THEN CASE WHEN COALESCE(url_port, 0) > 0
                                 THEN url_domain || ':' ||
                                      CAST(CAST(url_port AS BIGINT)
                                           AS VARCHAR)
                                 ELSE url_domain END
                            WHEN COALESCE(server_address, '') <> ''
                            THEN CASE WHEN COALESCE(server_port, 0) > 0
                                 THEN server_address || ':' ||
                                      CAST(CAST(server_port AS BIGINT)
                                           AS VARCHAR)
                                 ELSE server_address END
                            ELSE COALESCE(rpc_service, '') END
                     ELSE destn0 END
              ELSE COALESCE(destn0, '') END AS destn
  FROM (
    SELECT *,
           CASE WHEN is_db THEN COALESCE(NULLIF(db_system, ''), 'db')
                WHEN is_msg
                  THEN COALESCE(NULLIF(messaging_system, ''), 'messaging')
                WHEN is_rpc
                  THEN COALESCE(NULLIF(rpc_system, ''), 'external')
                WHEN is_http THEN 'http'
                ELSE '' END AS t_type,
           CASE WHEN COALESCE(peer, '') <> ''
                     AND COALESCE(peer_address, '') <> ''
                THEN peer_address ELSE COALESCE(peer, '') END AS destn0
    FROM (
      SELECT *,
             COALESCE(db_system, '') <> '' AS is_db,
             COALESCE(db_system, '') = ''
               AND (COALESCE(messaging_system, '') <> ''
                    OR COALESCE(messaging_destination, '') <> ''
                    OR COALESCE(messaging_operation, '') <> '') AS is_msg,
             COALESCE(db_system, '') = ''
               AND COALESCE(messaging_system, '') = ''
               AND COALESCE(messaging_destination, '') = ''
               AND COALESCE(messaging_operation, '') = ''
               AND COALESCE(rpc_system, '') <> '' AS is_rpc,
             COALESCE(db_system, '') = ''
               AND COALESCE(messaging_system, '') = ''
               AND COALESCE(messaging_destination, '') = ''
               AND COALESCE(messaging_operation, '') = ''
               AND COALESCE(rpc_system, '') = '' AND ok_url AS is_http,
             COALESCE(peer_service, '') AS peer
      FROM (
        SELECT *,
               CASE WHEN is_default AND NOT has_port
                    THEN hostname || ':' || CAST(default_port AS VARCHAR)
                    ELSE host_as_written END AS resource,
               CASE WHEN is_default AND has_port THEN hostname
                    ELSE host_as_written END AS name_host
        FROM (
          SELECT *,
                 port_str <> '' AS has_port,
                 CASE scheme WHEN 'http' THEN 80 WHEN 'https' THEN 443
                      ELSE 0 END AS default_port,
                 CASE WHEN port_str <> '' THEN CAST(port_str AS BIGINT)
                      ELSE CASE scheme WHEN 'http' THEN 80
                           WHEN 'https' THEN 443 ELSE 0 END
                      END AS dest_port,
                 CASE WHEN port_str <> '' THEN hostname || ':' || port_str
                      ELSE hostname END AS host_as_written,
                 (CASE scheme WHEN 'http' THEN 80 WHEN 'https' THEN 443
                       ELSE 0 END) > 0
                   AND (CASE WHEN port_str <> ''
                             THEN CAST(port_str AS BIGINT)
                             ELSE CASE scheme WHEN 'http' THEN 80
                                  WHEN 'https' THEN 443 ELSE 0 END END)
                       = (CASE scheme WHEN 'http' THEN 80
                               WHEN 'https' THEN 443 ELSE 0 END)
                   AS is_default
          FROM (
            SELECT i.*,
                   url_full IS NOT NULL
                     AND regexp_matches(url_full, '{re}') AS ok_url,
                   CASE WHEN url_full IS NOT NULL
                        THEN regexp_extract(url_full, '{re}', 1) END
                     AS scheme,
                   CASE WHEN url_full IS NOT NULL
                        THEN regexp_extract(url_full, '{re}', 2) END
                     AS hostname,
                   CASE WHEN url_full IS NOT NULL
                        THEN regexp_extract(url_full, '{re}', 3)
                        ELSE '' END AS port_str
            FROM ({inputs}) i
          )
        )
      )
    )
  )
)
)
)
"""


def resource_enrich_sql(inputs: str) -> str:
    """DuckDB twin of :func:`enrich_resource_batch`."""
    os_type_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _OS_TYPE_MAP.items()
    )
    os_name_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _OS_NAME_MAP.items()
    )
    return f"""
SELECT i.*,
       NULLIF(COALESCE(
         CASE COALESCE(os_name, '') {os_name_case} ELSE NULL END,
         CASE COALESCE(os_type, '') {os_type_case} ELSE NULL END,
         ''), '') AS host_os_type,
       CASE WHEN COALESCE(telemetry_distro_name, '') <> ''
            THEN COALESCE(NULLIF(telemetry_sdk_name, ''), 'otlp')
                 || '/' || COALESCE(NULLIF(telemetry_sdk_language, ''),
                                    'unknown')
                 || '/' || telemetry_distro_name
            WHEN COALESCE(telemetry_sdk_language, '') <> ''
            THEN COALESCE(NULLIF(telemetry_sdk_name, ''), 'otlp')
                 || '/' || telemetry_sdk_language
            ELSE COALESCE(NULLIF(telemetry_sdk_name, ''), 'otlp')
            END AS agent_name_full,
       CASE WHEN COALESCE(telemetry_distro_name, '') <> ''
            THEN COALESCE(NULLIF(telemetry_distro_version, ''), 'unknown')
            ELSE COALESCE(NULLIF(telemetry_sdk_version, ''), 'unknown')
            END AS agent_version,
       COALESCE(NULLIF(container_id, ''), NULLIF(host_name, ''))
         AS service_instance_id,
       COALESCE(NULLIF(k8s_node_name, ''), host_name) AS host_name_final,
       COALESCE(NULLIF(deployment_environment, ''),
                NULLIF(deployment_environment_name, ''),
                'unset') AS deployment_environment_final
FROM ({inputs}) i
"""


# ---------------------------------------------------------------------------
# Log-record error + scope enrichment (elasticapmprocessor log path).
#
# References:
# - exception context capture: internal/enrichments/error.go:33-49;
# - error attrs (handled flag, [EMPTY] message default, md5 grouping
#   key over type+message+stacktrace, µs timestamp with observed-ts
#   fallback, event.kind/event.type): log.go:61-129;
# - scope-derived service.framework.*: scope.go:28-36.
#
# error.id in the reference is a random uuid per event
# (attribute/error_id.go); the engine's deterministic analogue lives in
# enrich_scalar_batch (md5 of identity) — not duplicated here.
# ---------------------------------------------------------------------------

EMPTY_EXCEPTION_MSG = "[EMPTY]"  # log.go:35-36


def enrich_log_error_batch(batch: pa.Table) -> pa.Table:
    """Vectorized log.go:61-129 + scope.go:28-36.  Consumes nullable
    columns ``exception_type, exception_message, exception_stacktrace,
    exception_escaped (bool), ts, observed_ts, scope_name,
    scope_version`` and appends ``error_exception_handled,
    error_exception_message, error_exception_type, error_grouping_key,
    error_timestamp_us, event_kind, event_type,
    service_framework_name, service_framework_version``."""
    from ..functions.md5vec import md5_hex

    n = batch.num_rows
    null_s = pa.nulls(n, pa.string())

    def col(name, typ=pa.string()):
        if name in batch.column_names:
            c = batch[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            if pa.types.is_null(c.type):
                c = c.cast(typ)
            return c
        return pa.nulls(n, typ)

    exc_type = col("exception_type")
    exc_msg = col("exception_message")
    exc_stack = col("exception_stacktrace")
    exc_escaped = col("exception_escaped", pa.bool_())
    has_exc = pc.or_(_nonempty(exc_type), _nonempty(exc_msg))

    msg_filled = pc.if_else(
        _nonempty(exc_msg), exc_msg, pa.scalar(EMPTY_EXCEPTION_MSG)
    )
    # int64 0/1 rather than nullable bool: a null-able BOOLEAN column
    # round-trips as object None on the Arrow side but NaN from DuckDB,
    # so the driver's stringified compare would false-negative
    handled = pc.if_else(
        has_exc,
        pc.cast(pc.invert(pc.fill_null(exc_escaped, False)), pa.int64()),
        pa.nulls(n, pa.int64()),
    )
    out_msg = pc.if_else(has_exc, msg_filled, null_s)
    out_type = pc.if_else(
        pc.and_(has_exc, _nonempty(exc_type)), exc_type, null_s
    )
    out_stack = pc.if_else(
        pc.and_(has_exc, _nonempty(exc_stack)), exc_stack, null_s
    )
    # grouping key: md5 over the non-empty parts, message after the
    # [EMPTY] default was applied (log.go:117-129)
    key = pc.binary_join_element_wise(
        pc.fill_null(exc_type, ""),
        pc.binary_join_element_wise(
            msg_filled, pc.fill_null(exc_stack, ""), ""
        ),
        "",
    )
    grouping_key = pc.if_else(has_exc, md5_hex(key), null_s)

    ts = col("ts", pa.timestamp("us"))
    observed = col("observed_ts", pa.timestamp("us"))
    eff_ts = pc.if_else(pc.is_valid(ts), ts, observed)
    ts_us = pc.cast(pc.cast(eff_ts, pa.timestamp("us")), pa.int64())
    error_ts_us = pc.if_else(has_exc, ts_us, pa.nulls(n, pa.int64()))

    event_kind = pc.if_else(has_exc, pa.scalar("event"), null_s)
    event_type = pc.if_else(has_exc, pa.scalar("error"), null_s)

    scope_name = col("scope_name")
    scope_version = col("scope_version")
    has_scope = _nonempty(scope_name)
    framework_name = pc.if_else(has_scope, scope_name, null_s)
    # PutStr writes the version unconditionally once the name is set,
    # empty string included (scope.go:31-35)
    framework_version = pc.if_else(
        has_scope, pc.fill_null(scope_version, ""), null_s
    )

    return (
        batch.append_column("error_exception_handled", handled)
        .append_column("error_exception_message", out_msg)
        .append_column("error_exception_type", out_type)
        .append_column("error_stack_trace", out_stack)
        .append_column("error_grouping_key", grouping_key)
        .append_column("error_timestamp_us", error_ts_us)
        .append_column("event_kind", event_kind)
        .append_column("event_type", event_type)
        .append_column("service_framework_name", framework_name)
        .append_column("service_framework_version", framework_version)
    )


def log_error_sql(inputs: str) -> str:
    """DuckDB twin of :func:`enrich_log_error_batch`."""
    return f"""
SELECT * EXCLUDE (_has_exc, _msg_filled),
       CASE WHEN _has_exc
            THEN CAST(NOT COALESCE(exception_escaped, FALSE) AS BIGINT)
            END AS error_exception_handled,
       CASE WHEN _has_exc THEN _msg_filled END AS error_exception_message,
       CASE WHEN _has_exc AND COALESCE(exception_type, '') <> ''
            THEN exception_type END AS error_exception_type,
       CASE WHEN _has_exc AND COALESCE(exception_stacktrace, '') <> ''
            THEN exception_stacktrace END AS error_stack_trace,
       CASE WHEN _has_exc
            THEN md5(COALESCE(exception_type, '') || _msg_filled
                     || COALESCE(exception_stacktrace, ''))
            END AS error_grouping_key,
       CASE WHEN _has_exc
            THEN epoch_us(COALESCE(ts, observed_ts))
            END AS error_timestamp_us,
       CASE WHEN _has_exc THEN 'event' END AS event_kind,
       CASE WHEN _has_exc THEN 'error' END AS event_type,
       CASE WHEN COALESCE(scope_name, '') <> '' THEN scope_name
            END AS service_framework_name,
       CASE WHEN COALESCE(scope_name, '') <> ''
            THEN COALESCE(scope_version, '')
            END AS service_framework_version
FROM (
  SELECT *,
         COALESCE(exception_type, '') <> ''
           OR COALESCE(exception_message, '') <> '' AS _has_exc,
         CASE WHEN COALESCE(exception_message, '') <> ''
              THEN exception_message
              ELSE '{EMPTY_EXCEPTION_MSG}' END AS _msg_filled
  FROM ({inputs}) i
)
"""
