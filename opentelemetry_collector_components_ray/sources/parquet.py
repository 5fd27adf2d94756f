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

import pyarrow as pa
import ray.data as rd

from ..synth import materialize_transcripts


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    # pandas-written parquet carries a b'pandas' schema-metadata blob;
    # hash(pa.Schema) raises on it and Ray logs a noisy
    # "Failed to hash the schemas (for deduplication)" warning on
    # EVERY downstream stage (the metadata rides along through Arrow
    # transforms).  Dropping it is a schema-pointer change — buffers
    # are shared, and the stripping map fuses with the read.
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def _clean_schema_for(path, columns=None):
    """Metadata-free footer schema for the first parquet file under
    ``path`` — passed to ``read_parquet(schema=)`` so even the READ
    operator's own schema handling (SplitBlocks unify) never sees the
    unhashable pandas metadata blob."""
    import glob as _glob

    import pyarrow.parquet as _pq

    p = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(p):
        files = sorted(
            _glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
        )
        if not files:
            return None
        rel = os.path.relpath(files[0], p)
        if "=" in rel:
            # hive-partitioned layout: the partition column lives in
            # the directory names, not the footer — forcing the footer
            # schema would drop it; let Ray infer (the downstream strip
            # map still cleans the metadata)
            return None
        p = files[0]
    try:
        schema = _pq.read_schema(p).remove_metadata()
    except Exception:
        return None
    if columns:
        try:
            schema = pa.schema([schema.field(c) for c in columns])
        except KeyError:
            return None
    return schema


def read_parquet_clean(path, columns=None, **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` with schema metadata stripped (see
    :func:`_strip_schema_metadata`) — use this for every parquet read
    in the engine."""
    if "schema" not in kwargs:
        schema = _clean_schema_for(path, columns)
        if schema is not None:
            kwargs["schema"] = schema
    ds = rd.read_parquet(
        path, columns=list(columns) if columns else None, **kwargs
    )
    return ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


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
    return read_parquet_clean(path, columns, **kwargs)


def read_table(
    sf_dir: str, name: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> rd.Dataset:
    """Read one of the driver tables (events/documents/embeddings/…)."""
    return read_parquet_clean(
        os.path.join(sf_dir, f"{name}.parquet"), columns, **kwargs
    )
