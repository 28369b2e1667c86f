"""Gold layer: the reference's analytic capabilities re-keyed to transcripts.

Each function is a pure DataFrame -> DataFrame plan over the silver view
(conv_id, turn_idx, role, text, tool, ts, lsn) — full-refresh materializations
(≙ dbt `materialized='table'` rebuilds, silver_stations.sql:1 / SURVEY §2.9 I6)
executed after each checkpoint epoch or on demand.

Operator parity map (SURVEY.md §2):
- gold_conv_stats        : A1-A5 hash aggregates + conditional agg + span math
                           (stg_combined_trip_metrics.sql:5-32)
- gold_running_turns     : U1 unpivot + W3 running sum with frame spec
                           (gold_fact_trips.sql:68-100)
- gold_quality_flags     : P6 quality-flag columns (silver_trips.sql:111-144)
- gold_dim_dates         : G1 date spine + J5 broadcast dim join
                           (gold_dim_dates.sql:5-28)
- gold_tool_usage        : J5-style broadcast enrichment + A7 pivot-style
                           conditional sums (gold_station_performance_dashboard.sql:38-65)
- gold_top_conversations : A1 + HAVING thresholds + ORDER/LIMIT
                           (gold_commuter_edges.sql:18-69)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.dims import tool_catalog


def gold_conv_stats(silver: DataFrame) -> DataFrame:
    """Per-conversation metrics. Hash agg with map-side partials (Spark does
    partial+final automatically, ≙ A10); conditional aggregates via
    count(when(...)) — the FILTER-clause idiom of A2."""
    return (
        silver.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("tool").alias("n_tool_turns"),
            F.count(F.when(F.col("role") == "assistant", 1)).alias("n_assistant_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .withColumn(
            "duration_sec",
            F.expr("timestampdiff(SECOND, first_ts, last_ts)"),
        )
    )


def gold_running_turns(silver: DataFrame) -> DataFrame:
    """Cumulative turn/tool counters per conversation ordered by
    (ts, turn_idx) with deterministic tiebreak — the exact running-balance
    window shape of gold_fact_trips.sql:91-100 (ROWS UNBOUNDED PRECEDING)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return silver.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.sum(F.lit(1)).over(w).alias("cum_turns"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
        .over(w)
        .alias("cum_tool_turns"),
    )


def gold_quality_flags(silver: DataFrame) -> DataFrame:
    """Data-quality booleans computed into the data, not asserted —
    the reference's QA stance (silver_trips.sql:111-144):
    - is_empty_text    : NULL/blank text on a live row
    - is_ts_regression : ts decreases vs the previous turn (lag window)
    - is_duplicate_key : >1 live row per key (window count, avoids the
                         self-join of J3 entirely)
    """
    w_lag = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_key = Window.partitionBy("conv_id", "turn_idx")
    return silver.select(
        "conv_id",
        "turn_idx",
        (F.col("text").isNull() | (F.trim(F.col("text")) == "")).alias("is_empty_text"),
        (F.col("ts") < F.lag("ts").over(w_lag)).alias("is_ts_regression"),
        (F.count(F.lit(1)).over(w_key) > 1).alias("is_duplicate_key"),
    )


def gold_dim_dates(spark: SparkSession, silver: DataFrame) -> DataFrame:
    """Date spine spanning the corpus + calendar attributes.

    sequence(min,max)+explode ≙ UNNEST(GENERATE_DATE_ARRAY(...)),
    gold_dim_dates.sql:5-8; attribute extraction ≙ :12-19. The bounds come
    from a 1-row aggregate cross-joined in (scalar-subquery shape, A5)."""
    bounds = silver.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("date_key")
    )
    return spine.select(
        "date_key",
        F.year("date_key").alias("year"),
        F.quarter("date_key").alias("quarter"),
        F.month("date_key").alias("month"),
        F.dayofmonth("date_key").alias("day"),
        F.dayofweek("date_key").alias("day_of_week"),
        F.date_format("date_key", "MMMM").alias("month_name"),
        F.date_format("date_key", "EEEE").alias("day_name"),
        F.dayofweek("date_key").isin(1, 7).alias("is_weekend"),
    )


def gold_tool_usage(silver: DataFrame) -> DataFrame:
    """Tool usage enriched by the broadcast tool catalog; COALESCE on miss
    (≙ holiday join gold_dim_dates.sql:26-28 + silver_stations.sql:73-79)."""
    spark = silver.sparkSession
    dim = tool_catalog(spark)
    used = silver.filter(F.col("tool").isNotNull())
    return (
        used.join(F.broadcast(dim), on="tool", how="left")
        .groupBy("tool", F.coalesce("category", F.lit("unknown")).alias("category"))
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )


def gold_top_conversations(
    silver: DataFrame, min_turns: int = 10, top_k: int = 100
) -> DataFrame:
    """Busiest conversations above a floor — GROUP BY + HAVING + ORDER/LIMIT
    (gold_commuter_edges.sql:18-33,64-69 shape)."""
    return (
        gold_conv_stats(silver)
        .filter(F.col("n_turns") >= min_turns)
        .orderBy(F.desc("n_turns"), "conv_id")
        .limit(top_k)
    )


def build_gold(engine) -> dict[str, int]:
    """Full gold refresh after replay (I6): each plan materialized as a lake
    table via one atomic overwrite. Returns row counts."""
    spark = engine.spark
    silver = engine.silver_view()
    plans = {
        "gold.conv_stats": gold_conv_stats(silver),
        "gold.running_turns": gold_running_turns(silver),
        "gold.quality_flags": gold_quality_flags(silver),
        "gold.dim_dates": gold_dim_dates(spark, silver),
        "gold.tool_usage": gold_tool_usage(silver),
        "gold.top_conversations": gold_top_conversations(silver),
    }
    keys = {
        "gold.conv_stats": ["conv_id"],
        "gold.running_turns": ["conv_id", "turn_idx"],
        "gold.quality_flags": ["conv_id", "turn_idx"],
        "gold.dim_dates": ["date_key"],
        "gold.tool_usage": ["tool"],
        "gold.top_conversations": ["conv_id"],
    }
    counts = {}
    for name, df in plans.items():
        if not engine.catalog.table_exists(name):
            engine.catalog.create_table(
                name, df.schema, key_cols=keys[name], n_buckets=8, write_salt=1
            )
        t = engine.catalog.load_table(name)
        t.overwrite(df)
        counts[name] = t.read().count()
    return counts
