"""Per-stage metrics extraction from executed Datasets.

The reference collector exports per-component telemetry (accepted /
sent / failed counts per processor — e.g. the obsreport plumbing every
receiver/processor carries); the Ray-Data analogue is the per-operator
execution stats Ray already collects.  ``stage_metrics`` parses
``Dataset.stats()`` into a structured ``{operator: {...}}`` dict so job
entry points and shard manifests can persist per-stage wall time, task
counts, and row/byte throughput alongside the lineage they already
record (state/checkpoint.py).

Parsing is best-effort over the stable-ish text header lines
(``Operator N <name>: T tasks executed, B blocks produced in Xs`` and
the ``* Output num rows per block: ... total`` detail); fields that
fail to parse are simply absent — observability must never fail the
job.
"""

from __future__ import annotations

import re
from typing import Dict

_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (\d+) tasks executed, "
    r"(\d+) blocks produced in ([0-9.]+)s",
    re.MULTILINE,
)
_ROWS_RE = re.compile(
    r"^\* Output num rows per block: .*?, (\d+) total", re.MULTILINE
)
_BYTES_RE = re.compile(
    r"^\* Output size bytes per block: .*?, (\d+) total", re.MULTILINE
)


def stage_metrics(ds) -> Dict[str, dict]:
    """Executed ``Dataset`` (or its ``stats()`` string) → per-operator
    metrics dict, in plan order:

    ``{"1 ReadParquet->...": {"tasks": 32, "blocks": 32,
       "wall_s": 1.3, "rows_out": 10000, "bytes_out": 80000}}``
    """
    stats = ds if isinstance(ds, str) else ds.stats()
    out: Dict[str, dict] = {}
    # split into per-operator sections so detail lines attach to the
    # right operator
    heads = list(_OP_RE.finditer(stats))
    for i, m in enumerate(heads):
        end = heads[i + 1].start() if i + 1 < len(heads) else len(stats)
        section = stats[m.start():end]
        entry = {
            "tasks": int(m.group(3)),
            "blocks": int(m.group(4)),
            "wall_s": float(m.group(5)),
        }
        rows = _ROWS_RE.search(section)
        if rows:
            entry["rows_out"] = int(rows.group(1))
        nbytes = _BYTES_RE.search(section)
        if nbytes:
            entry["bytes_out"] = int(nbytes.group(1))
        out[f"{m.group(1)} {m.group(2)}"] = entry
    return out
