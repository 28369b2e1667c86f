"""Per-query resource scoping for registry operators.

Some operators materialize an intermediate index that the rest of their plan
probes more than once (d05's MinHash signature table, e03's bucketed ANN
index) or iterate through on-disk barriers (d08's connected-components
rounds). Because a registry callable returns a LAZY DataFrame — the caller
collects it — those resources must outlive the call, so the operator cannot
release them itself. This module is the contract that closes the gap:

- operators register what they hold via ``scoped_persist`` / ``scratch_dir``;
- the harness (bench.py, tests, any long-lived session driving the registry)
  calls ``release_query_resources(spark)`` AFTER consuming each result.

A short-lived session (the driver's per-round gate) gets cleanup for free at
session exit; a long-lived session that never calls release would otherwise
accumulate cached blocks and scratch files — the round-3 verdict's leak.

``scratch_dir`` lives under ``spark.sql.warehouse.dir`` (the cluster-shared
filesystem), NOT ``tempfile``/driver-local ``/tmp``: executors on a real
cluster must be able to read the barrier files the driver's plan references.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_PERSISTED: list[DataFrame] = []
_SCRATCH: list[str] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for harness-driven release."""
    df.persist()
    _PERSISTED.append(df)
    return df


def strip_file_scheme(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://"):] or "/"
    if uri.startswith("file:"):
        return uri[len("file:"):]
    return uri


def warehouse_scratch_root(spark: SparkSession) -> str:
    """Root for operator scratch space: ``$SPARK_GRAFT_SCRATCH`` if set, else
    ``<spark.sql.warehouse.dir>/_scratch``. Both resolve to a path every
    executor can reach on a real deployment (the warehouse dir is by
    definition the shared store); an object-store deployment swaps the local
    mkdir/rmtree in lake.fs, same seam as the table metadata."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    wh = strip_file_scheme(spark.conf.get("spark.sql.warehouse.dir"))
    return os.path.join(wh, "_scratch")


def scratch_dir(spark: SparkSession, name: str) -> str:
    """Create a fresh scratch dir for one operator invocation and register it
    for release after the caller consumes the result."""
    p = os.path.join(warehouse_scratch_root(spark), f"{name}_{uuid.uuid4().hex[:8]}")
    os.makedirs(p, exist_ok=True)
    _SCRATCH.append(p)
    return p


def release_query_resources(spark: SparkSession | None = None) -> None:
    """Release every resource registered since the last call. Call after the
    consuming action (collect/write) of the registry query that ran."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    while _SCRATCH:
        shutil.rmtree(_SCRATCH.pop(), ignore_errors=True)


def live_resource_counts(spark: SparkSession) -> tuple[int, int]:
    """(persistent RDD count, live scratch dirs) — for harness asserts."""
    jpersist = spark.sparkContext._jsc.getPersistentRDDs().size()
    return int(jpersist), len(_SCRATCH)
