from .parquet import read_transcripts, read_table  # noqa: F401
