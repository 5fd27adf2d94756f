"""Parquet sources.

The reference ingests over HTTP (receiver/elasticapmintakereceiver); our
batch engine ingests Parquet.  Column pruning is pushed into the read
(``columns=``) so a 2-column transform never lifts 6 columns off
storage; row filters ride the pyarrow dataset expression for row-group
pruning.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray.data as rd

from ..synth import materialize_transcripts


def read_transcripts(
    sf_dir_or_path: str,
    columns: Optional[Sequence[str]] = None,
    **kwargs,
) -> rd.Dataset:
    """Read the transcript table as a Dataset.

    Accepts either a scale-factor directory (``/root/testdata/sf0.01`` —
    the transcript table is derived + cached on first use) or a direct
    parquet file/dir path.
    """
    path = sf_dir_or_path
    if os.path.isdir(path) and os.path.exists(
        os.path.join(path, "events.parquet")
    ):
        path = materialize_transcripts(path)
    return rd.read_parquet(path, columns=list(columns) if columns else None,
                           **kwargs)


def read_table(
    sf_dir: str, name: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> rd.Dataset:
    """Read one of the driver tables (events/documents/embeddings/…)."""
    return rd.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"),
        columns=list(columns) if columns else None,
        **kwargs,
    )
