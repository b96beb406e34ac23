"""PySpark-native analytics engine with the query/data-processing
capabilities of YCMatthewTong/harmony-energy-data-pipeline.

A from-scratch Spark-first engine (DataFrame / SQL / Structured
Streaming): the reference (Polars + SQLAlchemy + SQLite, see
/root/reference) defines WHAT is computed; this package expresses it
as declarative Spark plans so Catalyst/Tungsten pick the physical
strategy and the same code scales from local[32] to a 1000-executor
cluster.

Layout
------
- ``session``    : SparkSession factory with engine defaults
                   (ANSI off, UTC, AQE on).
- ``schemas``    : declared StructTypes (generation fact table,
                   run-history audit table, testdata tables).
- ``io``         : parquet table loaders.
- ``operators/`` : cleaning, analytics, dedup, similarity, text —
                   expression-level builders (no row-at-a-time UDFs
                   on hot paths).
- ``sources/``   : incremental keyset scan (cursor pagination).
- ``sinks/``     : idempotent merge-upsert, run-history audit sink.
- ``pipeline/``  : the incremental ETL driver (ingest → transform →
                   upsert → audit).
- ``streaming/`` : Structured Streaming variant (foreachBatch merge).
"""

__version__ = "0.1.0"
