from .flagship import enriched_transcripts, flagship_aggregate  # noqa: F401
