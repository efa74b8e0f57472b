from .dedup_stream import (  # noqa: F401
    dedup_ingest_available_now,
    stream_buckets,
    stream_pairs,
)
from .event_stream import windowed_stats_stream  # noqa: F401
from .percolate_stream import percolate_available_now, stream_alerts  # noqa: F401
from .ingest import compact, compact_incremental, delete_docs, ingest_available_now  # noqa: F401
from .query_stream import read_results, serve_query_stream  # noqa: F401
from .session_stream import sessionize_stream  # noqa: F401
from .sketch_stream import (  # noqa: F401
    confirm_heavy_hitters,
    hh_ingest_available_now,
    stream_heavy_hitters,
    stream_sketch,
)
from .trigram_stream import trigram_ingest_available_now  # noqa: F401
