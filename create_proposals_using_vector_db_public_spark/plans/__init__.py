from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects — each module fills QUERIES/ORACLES.
from . import (  # noqa: F401,E402
    analytics_queries,
    dedup_queries,
    ingest_queries,
    relational_queries,
    scale_queries,
    streaming_queries,
    temporal_queries,
    text_queries,
    udf_queries,
    vector_queries,
)
