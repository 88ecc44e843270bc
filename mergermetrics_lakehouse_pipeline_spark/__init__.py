"""PySpark-native analytics engine with the query and data-processing
capabilities of ``tejalpalwankar/MergerMetrics-Lakehouse-Pipeline``.

A clean-room, Spark-first re-expression of the reference's medallion
(bronze -> silver -> gold) lakehouse semantics:

- ``functions/``  pure Column-level cleaning/standardization expressions
- ``operators/``  DataFrame -> DataFrame operators (dedup, merge/upsert,
                  windows, incremental recompute, similarity search)
- ``sources/``    ingest (CSV + lineage metadata), catalog helpers, archival
- ``plans/``      star-schema serving layer (denormalized view, KPI pack)
- ``pipeline/``   the reference's four pipelines re-built on the engine
- ``streaming/``  Structured Streaming variant of the incremental load

Everything is declarative DataFrame API so Catalyst handles pushdown,
pruning, join strategy and AQE; no RDDs, no row-at-a-time Python UDFs in
hot paths.
"""

__version__ = "0.1.0"
