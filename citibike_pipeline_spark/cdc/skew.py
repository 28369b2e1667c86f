"""Hot-conversation detection and salted repartitioning (SURVEY.md §4.2).

A 10^10-event log over conversations is Zipf-skewed: a handful of hot
conversations carry a large share of events. Two different skew surfaces:

- JOIN side (MERGE's implicit join): handled by AQE skew-join splitting
  (enabled in session.py) — no code here.
- SHUFFLE-BY-CONV side (explicit `repartition(hash(conv_id))` before the
  bucketed write, and any groupBy(conv_id)): one hot conv = one fat task.
  Fix: detect hot conv_ids from the epoch's own change-set (cheap count over
  data already in memory), then salt ONLY those keys with
  hash(conv_id, turn_idx) % salt_factor so one conversation spreads over
  `salt_factor` tasks while cold keys keep locality (SURVEY.md §7.3 hard-part d).

The detection collect is safe: it returns only conv_ids whose event count
exceeds the threshold — bounded by change_set_size / threshold rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def detect_hot_keys(
    df: DataFrame, key: str = "conv_id", threshold: int = 10_000
) -> list[str]:
    """conv_ids carrying more than `threshold` rows in df (small by design)."""
    hot = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in hot]


def with_salt(
    df: DataFrame,
    hot_keys: list[str],
    key: str = "conv_id",
    fine_col: str = "turn_idx",
    salt_factor: int = 16,
) -> DataFrame:
    """Add SALT_COL: 0 for cold keys; hash(key, fine_col) % salt_factor for hot.

    Deterministic (no rand()) so a retried task salts identically — required
    for exactly-once replay.
    """
    if not hot_keys:
        return df.withColumn(SALT_COL, F.lit(0))
    is_hot = F.col(key).isin(hot_keys)
    salt = F.pmod(F.xxhash64(F.col(key), F.col(fine_col)), F.lit(salt_factor)).cast("int")
    return df.withColumn(SALT_COL, F.when(is_hot, salt).otherwise(F.lit(0)))


def repartition_salted(
    df: DataFrame,
    num_partitions: int,
    hot_keys: list[str],
    key: str = "conv_id",
    fine_col: str = "turn_idx",
    salt_factor: int = 16,
) -> DataFrame:
    """Explicit repartition on hash(conv_id) with hot keys spread over
    salt_factor sub-partitions (north_star requirement)."""
    salted = with_salt(df, hot_keys, key, fine_col, salt_factor)
    return salted.repartition(num_partitions, F.col(key), F.col(SALT_COL)).drop(SALT_COL)
