"""Pipeline specification + stage registry + post-agg statements.

The reference's user-extension surface, re-expressed:

- **Stage registry** — the OCB manifest's component registry
  (distributions/elastic-components/manifest.yaml): named stage
  factories a spec refers to.
- **PipelineSpec** — the integration-template idea
  (receiver/integrationreceiver/README.md:17-25,
  pkg/integrations): a declarative description of a pipeline
  (source → stages → router → aggregation) with validation at build
  time, mirroring the reference's config Validate() rules (interval
  multiples lsminterval config.go:110-117; routing rules
  dynamicroutingconnector README.md:128-134).
- **Statements** — the OTTL statements applied to aggregated
  datapoints (lsmintervalprocessor config/config.go:70-78, executed
  processor.go:556-605; statements like
  ``set(attributes["metricset.interval"], "1m")`` built at
  elasticapmconnector config.go:171-183).  We support the same two
  shapes the reference builds: ``set(col, "literal")`` and
  ``concat(col, [a, b], "sep")`` — parsed once, applied as a
  vectorized ``map_batches``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.aggregate import validate_intervals
from ..stages.route import RouterConfig

# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------

_SET_RE = re.compile(r'^set\((\w+),\s*"([^"]*)"\)$')
_CONCAT_RE = re.compile(
    r'^concat\((\w+),\s*\[([\w\s,]+)\],\s*"([^"]*)"\)$'
)


def parse_statement(stmt: str) -> Callable[[pa.Table], pa.Table]:
    """Compile one statement string to a batch transform.

    ``set(col, "value")``      → constant column (add or replace)
    ``concat(col, [a, b], ".")`` → col = a || "." || b (existing string
    columns a, b)
    """
    m = _SET_RE.match(stmt.strip())
    if m:
        col, value = m.groups()

        def apply_set(t: pa.Table) -> pa.Table:
            arr = pa.array([value] * t.num_rows, pa.string())
            if col in t.column_names:
                t = t.drop_columns([col])
            return t.append_column(col, arr)

        return apply_set
    m = _CONCAT_RE.match(stmt.strip())
    if m:
        col, parts_s, sep = m.groups()
        parts = [p.strip() for p in parts_s.split(",")]

        def apply_concat(t: pa.Table) -> pa.Table:
            cols = [pc.cast(t[p], pa.string()) for p in parts]
            arr = pc.binary_join_element_wise(*cols, sep)
            if col in t.column_names:
                t = t.drop_columns([col])
            return t.append_column(col, arr)

        return apply_concat
    raise ValueError(f"unparseable statement: {stmt!r}")


def apply_statements(
    ds: rd.Dataset, statements: Sequence[str]
) -> rd.Dataset:
    fns = [parse_statement(s) for s in statements]
    if not fns:
        return ds

    def run(t: pa.Table) -> pa.Table:
        for fn in fns:
            t = fn(t)
        return t

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Stage registry
# ---------------------------------------------------------------------------

StageFn = Callable[..., rd.Dataset]
"""Stage callable contract: ``PipelineSpec.build`` invokes a stage as
``fn(ds, batch_size)`` — and the stage named ``"route"`` as
``fn(ds, router, batch_size)``.  :func:`register_stage` adapts plain
``fn(ds)`` callables automatically (extra build arguments are dropped),
so user stages may ignore tuning parameters they don't need."""

_REGISTRY: Dict[str, StageFn] = {}


def _adapt_stage(fn: StageFn) -> StageFn:
    """Wrap a callable that only accepts (ds) so build-time extras
    (batch_size, router) don't TypeError — the round-1 advice finding:
    the declared Callable[[Dataset], Dataset] contract crashed at build
    time."""
    import inspect

    try:
        params = list(inspect.signature(fn).parameters.values())
    except (TypeError, ValueError):
        return fn
    pos = [
        p
        for p in params
        if p.kind
        in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
    ]
    if any(p.kind == p.VAR_POSITIONAL for p in pos) or len(pos) >= 3:
        return fn
    if len(pos) == 2:

        def two_arg(ds, *extras):
            return fn(ds, extras[-1] if extras else None)

        return two_arg

    def one_arg(ds, *extras):
        return fn(ds)

    return one_arg


def register_stage(name: str, fn: StageFn) -> None:
    if name in _REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = _adapt_stage(fn)


def get_stage(name: str) -> StageFn:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def _register_builtins() -> None:
    from ..stages.enrich import enrich_stage
    from ..stages.parse import parse_stage
    from ..stages.route import route_stage

    if "parse" not in _REGISTRY:
        _REGISTRY["parse"] = parse_stage
        _REGISTRY["enrich"] = enrich_stage
        _REGISTRY["route"] = route_stage


# ---------------------------------------------------------------------------
# PipelineSpec
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PipelineSpec:
    """Declarative pipeline: stage names + router + aggregation config.

    Validation happens at construction (fail fast, like component
    Validate() in the reference), not at execution.
    """

    stages: Tuple[str, ...] = ("parse", "enrich", "route")
    router: RouterConfig = field(default_factory=RouterConfig)
    intervals: Tuple[str, ...] = ("1h", "24h")
    statements: Tuple[str, ...] = ()
    batch_size: int = 65536

    def __post_init__(self):
        _register_builtins()
        for s in self.stages:
            get_stage(s)
        validate_intervals(self.intervals)
        for stmt in self.statements:
            parse_statement(stmt)

    @classmethod
    def from_dict(cls, cfg: dict) -> "PipelineSpec":
        """Build a spec from plain config data (parsed YAML/JSON) —
        the integration-template entry point
        (receiver/integrationreceiver/README.md:17-25): templates are
        data; validation still happens in __post_init__."""
        allowed = {"stages", "intervals", "statements", "batch_size"}
        unknown = set(cfg) - allowed
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        kwargs = {}
        for key in ("stages", "intervals", "statements"):
            if key in cfg:
                kwargs[key] = tuple(cfg[key])
        if "batch_size" in cfg:
            kwargs["batch_size"] = int(cfg["batch_size"])
        return cls(**kwargs)

    def build(self, ds: rd.Dataset) -> rd.Dataset:
        _register_builtins()
        for s in self.stages:
            fn = get_stage(s)
            if s == "route":
                ds = fn(ds, self.router, self.batch_size)
            else:
                ds = fn(ds, self.batch_size)
        return ds

    def aggregate(self, ds: rd.Dataset) -> rd.Dataset:
        from ..stages.aggregate import service_summary

        out = service_summary(ds, self.intervals, self.batch_size * 2)
        return apply_statements(out, self.statements)
