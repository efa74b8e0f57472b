from .ingest import compact, compact_incremental, ingest_available_now  # noqa: F401
