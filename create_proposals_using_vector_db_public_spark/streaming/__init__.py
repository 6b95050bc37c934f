from .ingest_stream import (  # noqa: F401
    available_now_to_memory,
    available_now_to_parquet,
    stream_chunks,
    stream_parquet,
    watermark_dedup,
    windowed_event_counts,
)
