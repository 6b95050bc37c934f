from . import dedup, ingest, knn  # noqa: F401
