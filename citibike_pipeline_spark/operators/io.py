"""Testdata table loader (S3/S10-style scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with pushdown-friendly lazy projection — never cache here;
    Catalyst prunes columns/filters into the scan per query."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
