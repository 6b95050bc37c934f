from .ingest_stream import (  # noqa: F401
    available_now_to_memory,
    available_now_to_parquet,
    commit_version,
    read_versioned,
    read_versioned_as_of,
    stream_chunks,
    stream_parquet,
    stream_upsert_to_versioned,
    watermark_dedup,
    windowed_event_counts,
)
from .stateful import (  # noqa: F401
    run_update_to_parquet,
    running_counts_stateful,
)
