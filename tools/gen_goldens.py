"""Generate committed golden fixtures (tests/golden/<case>/).

Mirrors the reference's golden-file test style
(processor/lsmintervalprocessor/testdata/*/{input,output}.yaml,
connector/elasticapmconnector/testdata/*) as small deterministic
Parquet pairs.  EXPECTED outputs are produced by the DuckDB oracle (or
hand-derived where no SQL twin exists) — never by the engine under
test — so the fixtures are an independent check, not a snapshot.

Run: python tools/gen_goldens.py   (idempotent; rewrites tests/golden)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentelemetry_collector_components_ray.stages.enrich import ENRICHED_SQL
from opentelemetry_collector_components_ray.stages.parse import PARSED_SQL
from opentelemetry_collector_components_ray.stages import aggregate as agg
from opentelemetry_collector_components_ray.stages.route import ROUTED_SQL

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)


def transcripts(rows) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(r[5], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )


# Crafted to hit: both/one/none of the fused status+latency tokens,
# boundary statuses (399/400/499/500), parse misses, p-value weights,
# every route sink, out-of-order turns, >4 tools per role (overflow),
# bucket-boundary latencies (50/51/250).
INPUT_ROWS = [
    ("c1", 0, "user", "GET /api/item/1 status=200 latency_ms=50", "", "2024-01-01T00:00:10"),
    ("c1", 1, "assistant", "POST /api/cart/2 status=399 latency_ms=51", "", "2024-01-01T00:00:40"),
    ("c1", 2, "tool", "tool=sql status=500 latency_ms=250 error: code_1", "sql", "2024-01-01T00:01:10"),
    ("c1", 3, "tool", "tool=maps status=200 latency_ms=251 result=ok", "maps", "2024-01-01T00:09:59"),
    ("c1", 4, "system", "signup welcome user 1", "", "2024-01-01T00:10:00"),
    ("c2", 0, "user", "GET /api/item/9 status=404 latency_ms=0", "", "2024-01-01T00:00:20"),
    ("c2", 1, "tool", "tool=python status=499 latency_ms=1000", "python", "2024-01-01T00:05:00"),
    ("c2", 2, "tool", "tool=shell status=200 p=2 latency_ms=2500", "shell", "2024-01-01T00:11:00"),
    ("c2", 3, "tool", "tool=files status=200 latency_ms=2501", "files", "2024-01-01T00:12:00"),
    ("c2", 4, "tool", "tool=email status=200 latency_ms=7", "email", "2024-01-01T00:13:00"),
    # out-of-order: newest ts appears first in file order
    ("c3", 2, "assistant", "POST /api/cart/5 status=200 latency_ms=30", "", "2024-01-01T01:30:00"),
    ("c3", 0, "user", "status=200 only-status-no-latency", "", "2024-01-01T01:00:00"),
    ("c3", 1, "assistant", "latency_ms=77 only-latency-no-status", "", "2024-01-01T01:10:00"),
    ("c4", 0, "user", "completely unparseable text", "", "2024-01-01T02:00:00"),
]


def main() -> None:
    t = transcripts(INPUT_ROWS)
    con = duckdb.connect()
    con.register("transcripts_v", t)
    con.execute("CREATE VIEW transcripts AS SELECT * FROM transcripts_v")
    con.execute(f"CREATE VIEW parsed AS {PARSED_SQL}")
    con.execute(f"CREATE VIEW enriched AS {ENRICHED_SQL}")

    cases = {
        "parse_basic": "SELECT * FROM parsed ORDER BY conv_id, turn_idx",
        "enrich_outcome": (
            "SELECT * FROM enriched ORDER BY conv_id, turn_idx"
        ),
        "route_4way": (
            f"SELECT * FROM ({ROUTED_SQL}) ORDER BY conv_id, turn_idx"
        ),
        "agg_sum_delta": (
            agg.service_summary_sql(("1m",))
            + " ORDER BY window_start, role, tool"
        ),
        "agg_multi_interval": (
            agg.service_summary_sql(("1m", "10m"))
            + " ORDER BY interval, window_start, role, tool"
        ),
        "agg_cumulative_latest_wins": (
            agg.LATEST_STATE_SQL + " ORDER BY conv_id"
        ),
        "agg_overflow": (
            agg.capped_tool_summary_sql(2) + " ORDER BY role, tool"
        ),
        "agg_histogram": (
            "SELECT * FROM ("
            + agg.latency_histogram_sql(("1h",))
            + ") ORDER BY interval, window_start, role, bucket_idx"
        ),
    }

    for name, sql in cases.items():
        d = os.path.join(GOLDEN, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "input.parquet"))
        expected = con.execute(sql).arrow()
        pq.write_table(expected, os.path.join(d, "expected.parquet"))
        print(f"{name}: {expected.num_rows} expected rows")


if __name__ == "__main__":
    main()
