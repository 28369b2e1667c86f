"""citibike_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of mikeboyle/citibike-pipeline
(batch medallion ETL: Python ingestion -> BigQuery -> dbt -> analytics) as an
idiomatic Spark DataFrame/SQL engine:

- bronze/silver/gold lake tables with atomic snapshot commits (``lake``)
- WAL/binlog-tail CDC replay with LSN last-writer-wins dedup, keyed MERGE,
  exactly-once commit manifests, checkpoint/resume, schema evolution,
  hot-key skew salting (``cdc``)
- the reference's full relational operator surface re-expressed Spark-first
  (``operators``), plus training-data-pipeline ops: dedup (exact/MinHash/
  SimHash/Jaccard/embedding), similarity search, text analysis, multimodal
  plumbing
- scalar function library mirroring the reference's Jinja macros
  (``functions``)

Reference semantics are cited per-site as ``file:line`` into /root/reference.
Nothing is ported; the architecture is DataFrame/Catalyst-first.
"""

__version__ = "0.1.0"
