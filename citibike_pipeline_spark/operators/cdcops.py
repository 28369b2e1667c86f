"""CDC-native batch operators: SCD2 history build and as-of state enrichment.

The engine's whole CDC surface (W1/I3 LWW collapse, I2 incremental MERGE —
reference: silver_stations.sql:46-67 keeps only the LATEST row per station,
silver_trips.sql:2-3 merges by unique key) answers "what is the state NOW".
These two operators answer the other two questions a change stream raises:

* q34 — "what was every state and WHEN" (type-2 slowly-changing dimension:
  the full version history with validity intervals, the generalization of
  silver_stations' latest-snapshot QUALIFY to all rows);
* q35 — "what was the state AS OF each fact's own timestamp" (temporal/as-of
  join: enrich each fact row with the most recent state change at-or-before
  its event time — the time-travel variant of gold_fact_trips.sql's
  dimension enrichment joins).

Both run over the ``events`` table as the change stream (user_id = entity
key, ts = change time, event_id = total tiebreak, value = state payload).

Scale shape (100 TB):
* q34 is ONE hash shuffle on the entity key followed by per-key windows —
  identical layout to the CDC merge itself, so on a bucketed silver table
  the exchange disappears entirely (the window reuses the bucket layout).
* q35 uses the union-and-window as-of pattern: tag state/probe sides, union
  (no shuffle — both sides are the same scan), ONE hash shuffle on the
  entity key, and a running `last(ignorenulls)` fill. This is the
  scale-correct as-of plan: no range-explode, no per-row subquery, no
  broadcast of the state side (which at 100 TB is as big as the fact side).
  A sort-merge ASOF join would also work but needs both sides re-sorted;
  the union form sorts ONCE over the combined stream.

Tie semantics (both engines, hash-verified): state changes at the same
(user_id, ts) collapse LWW to the highest event_id (q34) / are visible to a
probe at exactly that ts with the highest event_id winning (q35: state sorts
before probe at equal ts via the side tag, then event_id ascending, so the
running last() sees the max-event_id state). The organic gate corpus has no
(user_id, ts) ties, so q34 PLANTS one per 50th event (the d13 pattern —
without planting, the LWW tiebreak path would be hash-verified nowhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import T

# planted (user_id, ts) ties: a shadow copy of every 50th event with a higher
# event_id and a shifted value — LWW must keep the SHADOW (higher event_id);
# the output hash proves both engines picked the same side of the tie
SCD2_TIE_EVERY = 50
SCD2_TIE_ID = 10_000_000
SCD2_TIE_SHIFT = 1000.0


def _events_with_ties(ev: DataFrame) -> DataFrame:
    tie = ev.filter(F.col("event_id") % SCD2_TIE_EVERY == 0).select(
        (F.col("event_id") + SCD2_TIE_ID).alias("event_id"),
        "ts", "user_id", "event_type",
        (F.col("value") + F.lit(SCD2_TIE_SHIFT)).alias("value"),
    )
    return ev.select("event_id", "ts", "user_id", "event_type", "value").unionByName(tie)


# --------------------------------------------------------------------------
# q34: SCD2 dimension build — change stream -> versioned history with
# [valid_from, valid_to) intervals and an is_current flag.
# ≙ silver_stations.sql:46-67 (its QUALIFY rn=1 keeps version_n = max;
# SCD2 keeps them all and adds the interval); gold_dim_stations.sql is the
# downstream consumer shape.
# --------------------------------------------------------------------------

def q34_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events_with_ties(T(spark, sf, "events"))
    # LWW collapse of same-(key, ts) ties: max event_id wins — the W1 idiom.
    # Expressed INSIDE the user_id partitioning (ordered ts ASC, event_id
    # DESC, the tie winner is the first row of each ts run, detected with a
    # lag(ts) run-boundary test) rather than the textbook
    # ROW_NUMBER() OVER (PARTITION BY user_id, ts): that form would hash-
    # exchange on (user_id, ts) and then AGAIN on (user_id) for the interval
    # window — this form shares ONE exchange between both windows (the
    # second window only re-sorts within the same partitions; plan-asserted
    # in test_plans). At 100 TB that halves the shuffle of the whole build.
    w_tie = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").desc())
    versions = ev.withColumn(
        "_is_winner",
        F.lag("ts").over(w_tie).isNull() | (F.lag("ts").over(w_tie) != F.col("ts")),
    ).filter(F.col("_is_winner")).drop("_is_winner")
    # interval assembly: valid_to = next change's ts (NULL = current row).
    # ts alone is a total order per key after the LWW collapse; event_id
    # stays in the ORDER BY as a structural guarantee, not a semantic one.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return versions.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.when(F.lead("ts").over(w).isNull(), 1).otherwise(0).alias("is_current"),
        F.row_number().over(w).cast("long").alias("version_n"),
    )


_TIES_CTE = f"""
planted AS (
  SELECT event_id, ts, user_id, event_type, value FROM events
  UNION ALL
  SELECT event_id + {SCD2_TIE_ID}, ts, user_id, event_type, value + {SCD2_TIE_SHIFT}
  FROM events WHERE event_id % {SCD2_TIE_EVERY} = 0
)"""

Q34_SQL = f"""
WITH {_TIES_CTE},
dedup AS (
  SELECT event_id, ts, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS _rn
    FROM planted
  ) WHERE _rn = 1
)
SELECT user_id, event_id, event_type, value AS state_value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
       ROW_NUMBER() OVER w AS version_n
FROM dedup
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# q35: as-of state enrichment — each 'purchase' fact picks up the most
# recent non-purchase state change at-or-before its own ts (union-and-window
# form; see module docstring for the scale argument).
# ≙ gold_fact_trips.sql's dim-enrichment joins, made temporal.
# --------------------------------------------------------------------------

def q35_asof_enrich(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    state = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("_side"),
        F.col("value").alias("_sv"),
        F.col("event_id").alias("_sid"),
        F.col("event_type").alias("_stype"),
        F.col("ts").alias("_sts"),
        F.lit(None).cast("double").alias("_pv"),
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_sv"),
        F.lit(None).cast("long").alias("_sid"),
        F.lit(None).cast("string").alias("_stype"),
        F.lit(None).cast("timestamp").alias("_sts"),
        F.col("value").alias("_pv"),
    )
    # ONE window over the merged stream: the running last() of the state
    # columns (ignorenulls skips probe rows) IS the as-of lookup
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        state.unionByName(probe)
        .withColumn("asof_value", F.last("_sv", ignorenulls=True).over(w))
        .withColumn("asof_event_id", F.last("_sid", ignorenulls=True).over(w))
        .withColumn("asof_event_type", F.last("_stype", ignorenulls=True).over(w))
        .withColumn("asof_ts", F.last("_sts", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            "event_id", "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("_pv").alias("purchase_value"),
            "asof_event_id", "asof_event_type", "asof_ts", "asof_value",
        )
    )


Q35_SQL = """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS _side,
         value AS _sv, event_id AS _sid, event_type AS _stype, ts AS _sts,
         CAST(NULL AS DOUBLE) AS _pv
  FROM events WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS _side,
         NULL, NULL, NULL, NULL, value
  FROM events WHERE event_type = 'purchase'
),
filled AS (
  SELECT event_id, user_id, ts, _side, _pv,
         LAST_VALUE(_sv IGNORE NULLS) OVER w AS asof_value,
         LAST_VALUE(_sid IGNORE NULLS) OVER w AS asof_event_id,
         LAST_VALUE(_stype IGNORE NULLS) OVER w AS asof_event_type,
         LAST_VALUE(_sts IGNORE NULLS) OVER w AS asof_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, _side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts AS purchase_ts, _pv AS purchase_value,
       asof_event_id, asof_event_type, asof_ts, asof_value
FROM filled WHERE _side = 1
"""


CDCOPS = {
    "q34_scd2_history": (q34_scd2_history, Q34_SQL),
    "q35_asof_enrich": (q35_asof_enrich, Q35_SQL),
}
