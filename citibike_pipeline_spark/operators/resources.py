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

Registrations are keyed by SparkSession and the registry is lock-guarded, so
a deployment running analytics and the engine in SEPARATE sessions (the
documented AQE-scoping layout) can never release another session's live
resources, and concurrent harness threads don't corrupt the bookkeeping.

Release granularity: ``release_caches`` only unpersists — always safe, a
plan that still references the data merely recomputes. ``release_scratch``
DELETES barrier files, which is safe only after the owning result has been
consumed; ``release_query_resources`` does both and is the normal harness
call. The driver-contract wrapper (``__spark_entry__``) releases caches
only, so even a caller that interleaves plan-building with consumption can
never hit missing files — at the cost of scratch dirs surviving until the
session's harness (or the OS) cleans the warehouse ``_scratch`` root.

``scratch_dir`` lives under ``spark.sql.warehouse.dir`` (the cluster-shared
filesystem), NOT ``tempfile``/driver-local ``/tmp``: executors on a real
cluster must be able to read the barrier files the driver's plan references.
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..lake import fs

_LOCK = threading.Lock()
_PERSISTED: list[tuple[SparkSession, DataFrame]] = []
_SCRATCH: list[tuple[SparkSession, str]] = []
# Session-lifetime driver-side memos (flow's Edmonds-Karp solve, the k-means
# fit) register their dicts here. They deliberately SURVIVE per-query
# release — sharing one solve/fit across a registry pass is the point — but
# a benchmark pass must clear them between REPS, or best-of-k records
# memoized, work-free times for the producing queries and a regression in
# the solve/fit becomes invisible (round-5 review finding).
_MEMOS: list[dict] = []


def register_session_memo(memo: dict) -> dict:
    with _LOCK:
        _MEMOS.append(memo)
    return memo


def clear_session_memos() -> None:
    """Drop all registered driver-side memos (call between benchmark reps)."""
    with _LOCK:
        for m in _MEMOS:
            m.clear()


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for harness-driven release."""
    df.persist()
    with _LOCK:
        _PERSISTED.append((df.sparkSession, df))
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
    definition the shared store); all directory create/delete here goes
    through ``lake.fs`` (makedirs/rmtree), the same adapter seam the table
    metadata uses, so an object-store deployment swaps one module."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    wh = strip_file_scheme(spark.conf.get("spark.sql.warehouse.dir"))
    return os.path.join(wh, "_scratch")


def scratch_dir(spark: SparkSession, name: str) -> str:
    """Create a fresh scratch dir for one operator invocation and register it
    for release after the caller consumes the result."""
    p = os.path.join(warehouse_scratch_root(spark), f"{name}_{uuid.uuid4().hex[:8]}")
    fs.makedirs(p)
    with _LOCK:
        _SCRATCH.append((spark, p))
    return p


def _drain(registry: list, spark: SparkSession | None) -> list:
    """Pop and return entries belonging to ``spark`` (or all, if None)."""
    with _LOCK:
        if spark is None:
            taken, keep = list(registry), []
        else:
            taken = [e for e in registry if e[0] is spark]
            keep = [e for e in registry if e[0] is not spark]
        registry[:] = keep
    return taken


def release_caches(spark: SparkSession | None = None) -> None:
    """Unpersist registered caches for ``spark`` (all sessions if None).
    Always safe: a still-referenced plan recomputes instead of failing."""
    for _, df in _drain(_PERSISTED, spark):
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release


def release_scratch(spark: SparkSession | None = None) -> None:
    """Delete registered scratch dirs for ``spark`` (all sessions if None).
    Only safe after the owning results have been consumed — scratch files
    BACK returned DataFrames (d08's barriers)."""
    for _, p in _drain(_SCRATCH, spark):
        fs.rmtree(p)


def release_query_resources(spark: SparkSession | None = None) -> None:
    """Release every resource registered by ``spark`` since the last call
    (all sessions if None). Call after the consuming action (collect/write)
    of the registry query that ran."""
    release_caches(spark)
    release_scratch(spark)


def live_resource_counts(spark: SparkSession) -> tuple[int, int]:
    """(persistent RDD count, live scratch dirs) — for harness asserts."""
    jpersist = spark.sparkContext._jsc.getPersistentRDDs().size()
    with _LOCK:
        n_scratch = len(_SCRATCH)
    return int(jpersist), n_scratch
