"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL (Huss8in/bigquery-postgres-events-etl).

Layers
------
- ``session`` / ``schemas`` / ``io``: SparkSession factory, explicit
  schemas, fixture table loading.
- ``functions``: scalar column expressions (date parsing, µs-epoch
  conversions, nested/JSON param extraction) — all built-in Catalyst
  expressions, zero Python UDFs on the hot path.
- ``operators``: the query library — ETL parity ops, relational
  operators (joins/aggs/windows/set-ops), LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing),
  temporal ops (as-of join, sessionization, tumbling windows).
- ``sources``: sinks (CSV header-parity exporter, idempotent JDBC
  upsert writer) and the batch watermark store.
- ``streaming``: batch-incremental runner and Structured Streaming
  variant of the reference's watermarked daily job.

Designed for 100 TB scale: declarative DataFrame plans (Catalyst does
pruning/pushdown/codegen), broadcast joins for dims, no driver-side
materialization, no row-at-a-time Python.
"""

__version__ = "0.1.0"
