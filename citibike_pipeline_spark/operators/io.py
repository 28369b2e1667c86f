"""Testdata table loader (S3/S10-style scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with pushdown-friendly lazy projection — never cache here;
    Catalyst prunes columns/filters into the scan per query."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Raise scan parallelism for per-row-compute-heavy pipelines.

    The testdata tables are single parquet files with ONE row group, so a
    scan — and everything narrow above it, which for the hash/fold-heavy
    operators is most of the query — runs as ONE task regardless of core
    count (guide §6: split count bounds scan parallelism; a row group is
    unsplittable). A keyless round-robin repartition of the (small) base
    table costs one tiny exchange and unlocks the full session parallelism
    for the compute above it.

    Scale-adaptive by construction (NOT a local[32] constant): the target is
    the session's shuffle parallelism and the repartition only happens when
    the scan's own split count is BELOW it — on a real multi-split table
    layout at warehouse scale this is a no-op, so no extra corpus-wide
    shuffle is ever introduced there. Row-to-partition assignment is
    retry-deterministic (Spark sorts before round-robin, SPARK-23207), and
    every consumer below is order-insensitive (exact decimal sums, min/max,
    counts, explicitly-ordered windows), so results are unchanged.
    """
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread_ranged(df: DataFrame, col: str) -> DataFrame:
    """spread() for consumers with a PER-TASK memo over row content (the
    d04/d05 shingle-vocabulary caches): range-partition on ``col`` instead
    of round-robin, so content-adjacent rows (documents written near each
    other share boilerplate/vocabulary) land on the SAME task and the
    task-local cache absorbs their repeats, instead of every task re-hashing
    most of the global vocabulary. Same no-op-at-scale guard as spread();
    results are unchanged for any row-order-insensitive consumer (the only
    kind allowed above a spread)."""
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < target:
        return df.repartitionByRange(target, col)
    return df
