from .ingest import compact, compact_incremental, delete_docs, ingest_available_now  # noqa: F401
