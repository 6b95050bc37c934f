from . import dedup, ingest, knn, ml, multimodal  # noqa: F401
