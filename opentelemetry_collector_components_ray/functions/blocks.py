"""Block-boundary helpers.

``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema-metadata blob;
when a pandas-block stage feeds a shuffle (groupby/sort), Ray converts
the block with exactly that call and the metadata makes ``hash(Schema)``
raise — a noisy "Failed to hash the schemas (for deduplication)"
warning in every reduce task.  Stages that feed a shuffle return
``to_clean_arrow(df)`` instead of the DataFrame so the block enters the
shuffle already Arrow and metadata-free.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def to_clean_arrow(df: pd.DataFrame) -> pa.Table:
    t = pa.Table.from_pandas(df, preserve_index=False)
    return t.replace_schema_metadata(None) if t.schema.metadata else t
