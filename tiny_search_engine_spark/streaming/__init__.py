from .ingest import compact, ingest_available_now  # noqa: F401
