from .parquet import (  # noqa: F401
    read_parquet_clean,
    read_table,
    read_transcripts,
)
