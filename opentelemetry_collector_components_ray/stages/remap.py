"""Declarative column remap / projection — the ECS translation analogue.

The reference renames attribute keys to ECS names and sanitizes
reserved keys (processor/elasticapmprocessor/internal/ecs/
ecs_translation.go:76,271,309,426,534) and remaps infra metrics
(processor/elasticinframetricsprocessor/README.md:19-23).  Columnar
translation is a projection: an ordered (src → dst) map applied per
batch, with unmapped columns either dropped (projection mode) or kept.

The default map renders the enriched transcript to ECS-ish field
names; the SQL twin is generated from the same mapping.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import pyarrow as pa
import ray.data as rd

# enriched column → ECS-style name (dots are the ECS convention; Arrow
# and DuckDB both accept dotted column names)
ECS_MAP: Tuple[Tuple[str, str], ...] = (
    ("conv_id", "session.id"),
    ("turn_idx", "event.sequence"),
    ("role", "event.category"),
    ("service_name", "service.name"),
    ("agent_name", "agent.name"),
    ("event_outcome", "event.outcome"),
    ("result_class", "http.response.status_class"),
    ("status", "http.response.status_code"),
    ("duration_us", "event.duration"),
    ("tool", "tool.name"),
    ("tool_category", "tool.category"),
    ("ts", "@timestamp"),
)


@dataclass(frozen=True)
class RemapSpec:
    mapping: Tuple[Tuple[str, str], ...] = ECS_MAP
    keep_unmapped: bool = False

    def __post_init__(self):
        dsts = [d for _, d in self.mapping]
        if len(set(dsts)) != len(dsts):
            raise ValueError(f"duplicate destination names: {dsts}")

    def apply(self, batch: pa.Table) -> pa.Table:
        cols: Dict[str, pa.ChunkedArray] = {}
        mapped_srcs = set()
        for src, dst in self.mapping:
            if src in batch.column_names:
                cols[dst] = batch[src]
                mapped_srcs.add(src)
        if self.keep_unmapped:
            for name in batch.column_names:
                if name not in mapped_srcs and name not in cols:
                    cols[name] = batch[name]
        return pa.table(cols)

    def sql_select(self, relation: str = "enriched") -> str:
        parts = [
            f'{src} AS "{dst}"' for src, dst in self.mapping
        ]
        return f"SELECT {', '.join(parts)} FROM {relation}"


def remap_stage(
    ds: rd.Dataset, spec: RemapSpec = RemapSpec(), batch_size: int = 65536
) -> rd.Dataset:
    return ds.map_batches(
        spec.apply,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
