from .ingest_stream import (  # noqa: F401
    available_now_to_memory,
    available_now_to_parquet,
    stream_chunks,
    stream_parquet,
    watermark_dedup,
    windowed_event_counts,
)
from .stateful import (  # noqa: F401
    run_update_to_parquet,
    running_counts_stateful,
)
