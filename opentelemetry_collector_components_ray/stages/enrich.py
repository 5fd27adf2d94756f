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
