"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference document-search / proposal-generation app
(dntfndjnh/create-Proposals-Using-Vector-DB-Public), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builders tuned for local + cluster use
- ``functions``  : pure Column-expression builders (vectors, text, hashing)
- ``operators``  : composed DataFrame operators (knn, dedup, ingest, ...)
- ``sources``    : data source helpers (parquet star schema, binary files)
- ``plans``      : declared query registry + DuckDB oracle SQL
- ``streaming``  : Structured Streaming forms of the ingest pipeline

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the publicly readable reference repo.
"""

__version__ = "0.1.0"
