"""File sources with the reference's strict-ingestion semantics.

≙ SURVEY.md §2.1: S3 (CSV scan with declared schema, no inference, hard-fail
on drift — `pd.read_csv` + validation.py:9-47), S4 (JSON/REST payload ->
rows, skip-and-count rows missing the PK, stations.py:22-24), S5 (local
GeoJSON-style nested JSON, borough_boundaries.py:7-38), S6 (CSV seed dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv_strict(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Declared-schema CSV scan; any unparseable row fails the job
    (≙ strict per-column casts, validation.py:33-47)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json_strict(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Declared-schema JSON-lines scan (S5); FAILFAST on drift."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def rows_with_pk_filter(
    spark: SparkSession, rows: list[dict], schema: StructType, pk: str
) -> tuple[DataFrame, int]:
    """In-memory payload -> DataFrame, dropping rows with a NULL primary key
    and reporting how many were dropped (≙ stations.py:22-24 skip-with-log).
    """
    df = spark.createDataFrame(rows, schema)
    n_total = df.count()
    good = df.filter(F.col(pk).isNotNull())
    return good, n_total - good.count()


def parse_json_column(df: DataFrame, col: str, schema: StructType) -> DataFrame:
    """Typed extraction of a JSON-string column (≙ JSON_VALUE field-at-a-time,
    silver_stations.sql:5-16 — but one from_json pass instead of 11 calls)."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))
