"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``citibike_pipeline_spark.operators`` (SURVEY.md
§2 coverage + training-data ops); this module is the thin contract shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citibike_pipeline_spark.operators import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the CDC engine's signature idiom on the events table:
    last-writer-wins latest event per user (W1/I3)."""
    return REGISTRY["q04_lww_latest_event"].fn(spark, "/root/testdata/sf0.001")


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS query's scoped CACHES before building the next
    plan (operators/resources.py lifecycle): the driver's gate runs every
    registry entry in one long-lived session without calling the release
    hook, so cached blocks would otherwise accumulate across all entries.
    Cache release is unconditionally safe — a plan still referencing the
    data recomputes instead of failing — so this imposes NO consumption
    ordering on the caller. Scratch dirs (which BACK returned DataFrames,
    e.g. d08's barrier files) are deliberately NOT freed here; they are
    bounded per call and reclaimed by any harness that calls
    release_query_resources, or with the warehouse ``_scratch`` root."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from citibike_pipeline_spark.operators.resources import release_caches

        release_caches(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + training-data ops."""
    return {name: _released(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query (DuckDB), omitted for non-SQL ops."""
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
