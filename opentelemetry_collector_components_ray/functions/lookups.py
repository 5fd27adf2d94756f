"""Broadcast lookup catalogs (the small side of every 'join').

The reference has no relational joins — its lookups are small static
dicts baked into code (os.type map resource.go:250-270, frame-type
tables frame.go) and metadata→field copies
(processor/elasticmetadataprocessor/README.md:13-21).  We model them as
broadcast tables: a dict shipped once via ``ray.put`` and resolved
per-batch with vectorized ``pc.index_in`` + ``pc.take`` (SURVEY.md §2.7).

Each catalog also knows how to render itself as a SQL CASE expression so
the DuckDB oracle is generated from the SAME source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Catalog:
    """An ordered key→row lookup with a default row for missing keys."""

    name: str
    columns: Tuple[str, ...]           # derived column names
    rows: Dict[str, Tuple]             # key -> tuple(values) aligned w/ columns
    default: Tuple                     # values for unknown keys

    def arrays(self) -> Tuple[pa.Array, Dict[str, pa.Array]]:
        keys = pa.array(list(self.rows.keys()), pa.string())
        cols = {}
        for i, c in enumerate(self.columns):
            vals = [v[i] for v in self.rows.values()]
            cols[c] = pa.array(vals)
        return keys, cols

    def lookup(self, key_col: pa.ChunkedArray | pa.Array) -> Dict[str, pa.Array]:
        """Vectorized lookup: one output array per catalog column."""
        keys, cols = self.arrays()
        idx = pc.index_in(key_col, value_set=keys)
        out = {}
        for i, c in enumerate(self.columns):
            taken = pc.take(cols[c], idx)
            dflt = self.default[i]
            out[c] = pc.fill_null(taken, dflt)
        return out

    def sql_case(self, key_expr: str, column: str) -> str:
        """CASE expression equivalent to :meth:`lookup` for one column."""
        i = self.columns.index(column)
        parts = [f"CASE {key_expr}"]
        for k, v in self.rows.items():
            parts.append(f"WHEN '{k}' THEN {_sql_lit(v[i])}")
        parts.append(f"ELSE {_sql_lit(self.default[i])} END")
        return " ".join(parts)


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


# ---------------------------------------------------------------------------
# The transcript-pipeline catalogs (FIXTURES.md §F2)
# ---------------------------------------------------------------------------

TOOL_CATALOG = Catalog(
    name="tool_catalog",
    columns=("tool_category", "is_external"),
    rows={
        "": ("", False),               # non-tool turns
        "search": ("retrieval", True),
        "calculator": ("math", False),
        "browser": ("retrieval", True),
        "python": ("code", False),
        "sql": ("code", False),
        "shell": ("code", False),
        "email": ("comm", True),
        "calendar": ("comm", False),
        "weather": ("api", True),
        "maps": ("api", True),
        "translate": ("nlp", True),
        "files": ("fs", False),
    },
    default=("unknown", False),
)

ROLE_MAP = Catalog(
    name="role_map",
    columns=("role_group", "agent_name"),
    rows={
        "user": ("human", "none"),
        "assistant": ("ai", "assistant-agent"),
        "system": ("ai", "system-agent"),
        "tool": ("machine", "tool-runner"),
    },
    default=("unknown", "unknown"),
)
