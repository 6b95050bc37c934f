from .ingest_stream import (  # noqa: F401
    available_now_to_memory,
    stream_chunks,
    stream_parquet,
    watermark_dedup,
    windowed_event_counts,
)
