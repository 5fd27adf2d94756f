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
from opentelemetry_collector_components_ray.stages.enrich import ENRICHED_SQL
from opentelemetry_collector_components_ray.stages.parse import PARSED_SQL
from opentelemetry_collector_components_ray.stages.route import ROUTED_SQL
from opentelemetry_collector_components_ray.synth import TRANSCRIPTS_SQL

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


def _q_route_counts(sf_dir: str):
    from ray.data.aggregate import Count

    from opentelemetry_collector_components_ray.pipelines.flagship import (
        routed_transcripts,
    )

    return (
        routed_transcripts(sf_dir)
        .groupby("sink")
        .aggregate(Count(alias_name="n"))
    )


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


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "t_transcripts": _q_transcripts,
        "t_parse": _q_parse,
        "t_enrich": _q_enrich,
        "t_route": _q_route,
        "t_route_counts": _q_route_counts,
        "t_service_summary": _q_service_summary,
        "t_latest_state": _q_latest_state,
        "t_capped_tools": _q_capped_tools,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "t_transcripts": f"{_CTE} SELECT * FROM transcripts",
        "t_parse": f"{_CTE} SELECT * FROM parsed",
        "t_enrich": f"{_CTE} SELECT * FROM enriched",
        "t_route": f"{_CTE} SELECT * FROM ({ROUTED_SQL})",
        "t_route_counts": (
            f"{_CTE} SELECT sink, COUNT(*) AS n FROM ({ROUTED_SQL}) "
            "GROUP BY sink"
        ),
        "t_service_summary": (
            f"{_CTE} {_agg.service_summary_sql(('1h', '24h'))}"
        ),
        "t_latest_state": f"{_CTE} {_agg.LATEST_STATE_SQL}",
        "t_capped_tools": f"{_CTE} {_agg.capped_tool_summary_sql(4)}",
    }
