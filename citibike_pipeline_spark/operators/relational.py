"""Relational operator queries (SURVEY.md §2.1-§2.7) over the testdata tables.

Each entry returns (spark_fn, oracle_sql). The Spark side is pure DataFrame
API; the oracle is ANSI SQL DuckDB runs on the same parquet. Column names are
aliased identically on both sides (driver hash-compares after sorting by
column name).

Numeric parity policy: money/quantity sums go through DECIMAL(18,4) (exact,
order-independent) and are cast to DOUBLE only at the end; averages divide an
exact decimal sum by an exact count in double and round(6); ad-hoc double
expressions round(4). This removes float-summation-order nondeterminism
between engines without hiding real differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import normalize_entity_id, stable_md5_key
from .io import T, spread


def _dec(c, p=18, s=4):
    return (F.col(c) if isinstance(c, str) else c).cast(f"decimal({p},{s})")


# --------------------------------------------------------------------------
# q01: hash aggregate + conditional agg + filter pushdown (A1/A2/A10, P4)
#      ≙ gold_commuter_edges.sql:18-33 / stg_combined_trip_metrics.sql:10
# --------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 4).alias("sum_base_price"),
            F.round(
                F.sum(
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
                ).cast("double"),
                4,
            ).alias("sum_disc_price"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_high_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02: multi-way broadcast join chain (J1/J2/J8/J11) + agg
#      ≙ silver_trips.sql:95-101 enrichment joins
# --------------------------------------------------------------------------

def q02_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    li, o, c, n, r = (T(spark, sf, t) for t in ("lineitem", "orders", "customer", "nation", "region"))
    # Pre-aggregate the fact side to order grain BEFORE the join chain: the
    # probe side shrinks ~4x (lines -> orders), the per-order partial sums
    # combine map-side, and COUNT(DISTINCT o_orderkey) degenerates to
    # COUNT(*) (orderkey unique after the rollup) — no Expand/two-phase
    # distinct. Semantics identical: each lineitem belongs to exactly one
    # order; orders without lines drop in both formulations (inner join).
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
        ).alias("order_rev")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum("order_rev").cast("double"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


Q02_SQL = """
SELECT n_name, r_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# --------------------------------------------------------------------------
# q03: derived-scalar rolling window (P7/A5) + top-k
#      ≙ gold_commuter_edges.sql:6-16,64-69 (90-day lookback from max date)
# --------------------------------------------------------------------------

def q03_rolling_90d_top_parts(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    bounds = li.agg(F.date_sub(F.max(F.to_date("l_shipdate")), 90).alias("start_date"))
    return (
        li.crossJoin(F.broadcast(bounds))
        .filter(F.to_date("l_shipdate") >= F.col("start_date"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 4).alias("qty_90d"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("qty_90d"), "l_partkey")
        .limit(10)
    )


Q03_SQL = """
WITH b AS (SELECT CAST(MAX(CAST(l_shipdate AS DATE)) AS DATE) - 90 AS start_date FROM lineitem)
SELECT l_partkey,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS qty_90d,
       COUNT(*) AS n_lines
FROM lineitem, b
WHERE CAST(l_shipdate AS DATE) >= b.start_date
GROUP BY l_partkey
ORDER BY qty_90d DESC, l_partkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q04: last-writer-wins window (W1/I3) — THE CDC dedup idiom on testdata
#      ≙ silver_stations.sql:46-54
# --------------------------------------------------------------------------

def q04_lww_latest_event(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts", F.round("value", 4).alias("value"))
    )


Q04_SQL = """
SELECT user_id, event_id, event_type, ts, ROUND(value, 4) AS value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q05: running balance with frame spec (W3)
#      ≙ gold_fact_trips.sql:91-100 (ROWS UNBOUNDED PRECEDING, tiebreak)
# --------------------------------------------------------------------------

def q05_running_balance(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum(_dec("value", 18, 2)).over(w).cast("double"), 4).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_events"),
    )


Q05_SQL = """
SELECT user_id, event_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 4) AS running_value,
       COUNT(*) OVER w AS running_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
"""


# --------------------------------------------------------------------------
# q06: two-pass dedup, different keys (W1 then W2) ≙ silver_stations.sql:46-63
# --------------------------------------------------------------------------

def q06_two_pass_dedup(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w1 = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = ev.withColumn("rn", F.row_number().over(w1)).filter(F.col("rn") == 1).drop("rn")
    w2 = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        latest.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") == 1)
        .select("event_type", "user_id", "event_id", "ts")
    )


Q06_SQL = """
WITH latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT event_type, user_id, event_id, ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn2
  FROM latest
) WHERE rn2 = 1
"""


# --------------------------------------------------------------------------
# q07: unpivot rows->events + daily net aggregation (U1 + A7/SO1)
#      ≙ gold_fact_trips.sql:68-89 (trip -> start/end event rows)
# --------------------------------------------------------------------------

def q07_unpivot_daily_net(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    events = li.select(
        F.to_date("l_shipdate").alias("event_date"),
        F.expr(
            "stack(2, 'ship', CAST(l_quantity AS DECIMAL(18,4)), "
            "'backorder', CAST(-l_quantity AS DECIMAL(18,4))) AS (event_kind, qty_change)"
        ),
    )
    return (
        events.groupBy("event_date", "event_kind")
        .agg(
            F.round(F.sum("qty_change").cast("double"), 4).alias("net_qty"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q07_SQL = """
WITH ev AS (
  SELECT CAST(l_shipdate AS DATE) AS event_date, 'ship' AS event_kind,
         CAST(l_quantity AS DECIMAL(18,4)) AS qty_change FROM lineitem
  UNION ALL
  SELECT CAST(l_shipdate AS DATE), 'backorder', CAST(-l_quantity AS DECIMAL(18,4)) FROM lineitem
)
SELECT event_date, event_kind,
       ROUND(CAST(SUM(qty_change) AS DOUBLE), 4) AS net_qty, COUNT(*) AS n_events
FROM ev GROUP BY event_date, event_kind
"""


# --------------------------------------------------------------------------
# q08: anti join (J6) ≙ stg_reconstructed_station_metadata.sql:26-32
# --------------------------------------------------------------------------

def q08_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    # Anti-join against a *filtered* probe side (customers with no 1-URGENT
    # order) so the result is non-empty at every SF: the generator gives every
    # customer at least one order, which made the plain "no orders" variant
    # trivially green on zero rows (VERDICT r1 "What's wrong" #1).
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q08_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


# --------------------------------------------------------------------------
# q09: semi join ≙ the EXISTS-shaped inner-probe joins (J13/J14)
# --------------------------------------------------------------------------

def q09_customers_with_urgent_orders(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


Q09_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


# --------------------------------------------------------------------------
# q10: full outer degree join + COALESCE key merge (J9/A8)
#      ≙ gold_commuter_hubs.sql:6-46 (in-degree ⟗ out-degree)
# --------------------------------------------------------------------------

def q10_full_outer_degrees(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    buys = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum(_dec("value", 18, 2)).cast("double"), 4).alias("purchase_value"),
    )
    return (
        clicks.join(buys, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
        )
    )


Q10_SQL = """
WITH clicks AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY user_id
), buys AS (
  SELECT user_id, COUNT(*) AS n_purchases,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT COALESCE(c.user_id, b.user_id) AS user_id,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(n_purchases, 0) AS n_purchases,
       COALESCE(purchase_value, 0.0) AS purchase_value
FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
"""


# --------------------------------------------------------------------------
# q11: duplicate detection via window count — avoids self-join (A6/J3)
#      ≙ silver_trips.sql:104-109,139-143
# --------------------------------------------------------------------------

def q11_multi_line_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("n_lines") > 1)
    )


Q11_SQL = """
SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem
GROUP BY l_orderkey HAVING COUNT(*) > 1
"""


# --------------------------------------------------------------------------
# q12: ANY_VALUE on functionally-dependent group (A4)
#      ≙ stg_trips_legacy.sql:94 (pre-join dedup helper)
# --------------------------------------------------------------------------

def q12_any_value_order_status(spark: SparkSession, sf: str) -> DataFrame:
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.any_value("o_orderstatus").alias("order_status"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q12_SQL = """
SELECT l_orderkey, ANY_VALUE(o_orderstatus) AS order_status, COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# q13: date spine generation + broadcast left join + zero-fill (G1/J5)
#      ≙ gold_dim_dates.sql:5-28
# --------------------------------------------------------------------------

def q13_date_spine_daily_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("date_key"))
    daily = o.groupBy(F.to_date("o_orderdate").alias("date_key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(_dec("o_totalprice")).cast("double"), 4).alias("total"),
    )
    return spine.join(daily, "date_key", "left").select(
        "date_key",
        F.coalesce("n", F.lit(0)).alias("n_orders"),
        F.coalesce("total", F.lit(0.0)).alias("total_price"),
        F.dayofweek("date_key").isin(1, 7).alias("is_weekend"),
    )


Q13_SQL = """
WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0, MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
spine AS (SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS date_key FROM b),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date_key, COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
  FROM orders GROUP BY 1
)
SELECT s.date_key,
       COALESCE(n, 0) AS n_orders,
       COALESCE(total, 0.0) AS total_price,
       (dayofweek(s.date_key) + 1) IN (1, 7) AS is_weekend
FROM spine s LEFT JOIN daily d ON s.date_key = d.date_key
"""


# --------------------------------------------------------------------------
# q14: pivot-style conditional sums in ONE aggregate (A7, improving the
#      reference's UNION-ALL indicator idiom, dashboard :38-65) + filtered avg
# --------------------------------------------------------------------------

def q14_user_event_pivot(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("purchases"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", _dec("value", 18, 2))).cast("double")
            / F.sum(F.when(F.col("event_type") == "purchase", 1)),
            6,
        ).alias("avg_purchase_value"),
    )


Q14_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       ROUND(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 6) AS avg_purchase_value
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q15: two-level aggregation (A9) ≙ dashboard :67-111 (daily then station)
# --------------------------------------------------------------------------

def q15_two_level_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(_dec("value", 18, 2)).alias("lo"),
        F.max(_dec("value", 18, 2)).alias("hi"),
    )
    return daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("active_days"),
        F.round(F.sum("n").cast("double") / F.count(F.lit(1)), 6).alias("avg_daily_events"),
        F.round(F.sum(F.col("hi") - F.col("lo")).cast("double") / F.count(F.lit(1)), 6).alias("avg_daily_range"),
    )


Q15_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n,
         MIN(CAST(value AS DECIMAL(18,2))) AS lo, MAX(CAST(value AS DECIMAL(18,2))) AS hi
  FROM events GROUP BY user_id, CAST(ts AS DATE)
)
SELECT user_id, COUNT(*) AS active_days,
       ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS avg_daily_events,
       ROUND(CAST(SUM(hi - lo) AS DOUBLE) / COUNT(*), 6) AS avg_daily_range
FROM daily GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q16: UNION DISTINCT set op (SO2) ≙ stg_reconstructed_station_metadata.sql:15
# --------------------------------------------------------------------------

def q16_union_distinct_nations(spark: SparkSession, sf: str) -> DataFrame:
    c, s = T(spark, sf, "customer"), T(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


Q16_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


# --------------------------------------------------------------------------
# q17: schema-fork projection seam (P1/P2/P3 + CASE recode + unionByName)
#      ≙ stg_trips_legacy.sql:14-56 / stg_trips_current.sql:27-40
# --------------------------------------------------------------------------

def q17_schema_fork_union(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    # "legacy" rows (pre-2024): rename/recode, pad current-only column with
    # typed NULL, tag lineage
    legacy = ev.filter(F.year("ts") < 2024).select(
        F.col("event_id").alias("id"),
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "purchase", "conversion")
        .otherwise("other")
        .alias("event_class"),
        F.lit(None).cast("string").alias("props_json"),
        F.lit("legacy").alias("data_source_schema"),
    )
    current = ev.filter(F.year("ts") >= 2024).select(
        F.col("event_id").alias("id"),
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "purchase", "conversion")
        .otherwise("other")
        .alias("event_class"),
        F.col("props").alias("props_json"),
        F.lit("current").alias("data_source_schema"),
    )
    return legacy.unionByName(current).groupBy("event_class", "data_source_schema").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("props_json").alias("n_with_props"),
    )


Q17_SQL = """
WITH u AS (
  SELECT event_id AS id,
         CASE WHEN event_type IN ('click','view') THEN 'engagement'
              WHEN event_type = 'purchase' THEN 'conversion'
              ELSE 'other' END AS event_class,
         CAST(NULL AS VARCHAR) AS props_json,
         'legacy' AS data_source_schema
  FROM events WHERE year(ts) < 2024
  UNION ALL
  SELECT event_id,
         CASE WHEN event_type IN ('click','view') THEN 'engagement'
              WHEN event_type = 'purchase' THEN 'conversion'
              ELSE 'other' END,
         props, 'current'
  FROM events WHERE year(ts) >= 2024
)
SELECT event_class, data_source_schema, COUNT(*) AS n, COUNT(props_json) AS n_with_props
FROM u GROUP BY event_class, data_source_schema
"""


# --------------------------------------------------------------------------
# q18: synthetic stable key + null/empty key guard (P5 + md5 key idiom)
#      ≙ stg_trips_legacy.sql:5-12
# --------------------------------------------------------------------------

def q18_synthetic_keys(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_orderkey").isNotNull() & F.col("l_linenumber").isNotNull())
        .select(
            F.concat(F.lit("line_"), stable_md5_key("l_orderkey", "l_linenumber")).alias("line_uid"),
            "l_orderkey",
            "l_linenumber",
        )
    )


Q18_SQL = """
SELECT 'line_' || md5(CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS line_uid,
       l_orderkey, l_linenumber
FROM lineitem
WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
"""


# --------------------------------------------------------------------------
# q19: regex-gated id normalization ≙ macros/normalize_station_id.sql:1-7
# --------------------------------------------------------------------------

def q19_normalize_ids(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    raw = p.select(
        "p_partkey", F.col("p_retailprice").cast("string").alias("raw_id")
    )
    return raw.select(
        "p_partkey", "raw_id", normalize_entity_id("raw_id").alias("norm_id")
    )


Q19_SQL = """
SELECT p_partkey, CAST(p_retailprice AS VARCHAR) AS raw_id,
       CASE WHEN regexp_matches(CAST(p_retailprice AS VARCHAR), '^[0-9]+\\.[0-9]+$')
            THEN printf('%.2f', CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE))
            ELSE CAST(p_retailprice AS VARCHAR) END AS norm_id
FROM part
"""


# --------------------------------------------------------------------------
# q20: quality-flag columns + multi-flag gate (P6) ≙ silver_trips.sql:111-144
# --------------------------------------------------------------------------

def q20_quality_flags(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    flagged = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") > 45).alias("is_qty_outlier"),
        (F.col("l_discount") > F.col("l_tax")).alias("is_disc_gt_tax"),
        (F.col("l_extendedprice") < 1000).alias("is_low_price"),
    )
    return flagged.groupBy("is_qty_outlier", "is_disc_gt_tax", "is_low_price").agg(
        F.count(F.lit(1)).alias("n")
    )


Q20_SQL = """
SELECT l_quantity > 45 AS is_qty_outlier,
       l_discount > l_tax AS is_disc_gt_tax,
       l_extendedprice < 1000 AS is_low_price,
       COUNT(*) AS n
FROM lineitem GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q21: latest-snapshot scalar filter (P9) ≙ silver_nyc_borough_boundaries.sql:13-17
# --------------------------------------------------------------------------

def q21_latest_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    latest_day = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    return (
        ev.crossJoin(F.broadcast(latest_day))
        .filter(F.to_date("ts") == F.col("max_d"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("event_id").alias("max_event_id"))
    )


Q21_SQL = """
SELECT event_type, COUNT(*) AS n, MAX(event_id) AS max_event_id
FROM events
WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q22: date/time scalar family + hour-band filter (P8, §2.7 date row)
#      ≙ silver_trips.sql:77-79, gold_dim_dates.sql:12-19, derive_season
# --------------------------------------------------------------------------

def q22_time_features(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.scalar import derive_season

    ev = T(spark, sf, "events")
    feats = ev.select(
        "event_id",
        F.year("ts").alias("year"),
        F.quarter("ts").alias("quarter"),
        F.month("ts").alias("month"),
        F.dayofweek("ts").alias("day_of_week"),  # Sunday=1 (BQ-compatible)
        F.hour("ts").alias("hour"),
        F.date_format("ts", "MMMM").alias("month_name"),
        F.date_format("ts", "EEEE").alias("day_name"),
        derive_season("ts").alias("season"),
        F.hour("ts").between(7, 10).alias("is_morning_rush"),
        F.hour("ts").between(16, 19).alias("is_evening_rush"),
    )
    return feats.groupBy(
        "year", "quarter", "month", "month_name", "season"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("is_morning_rush"), 1).otherwise(0)).alias("n_morning_rush"),
        F.sum(F.when(F.col("is_evening_rush"), 1).otherwise(0)).alias("n_evening_rush"),
        F.sum(F.when(F.col("day_of_week").isin(1, 7), 1).otherwise(0)).alias("n_weekend"),
    )


Q22_SQL = """
SELECT year(ts) AS year, quarter(ts) AS quarter, month(ts) AS month,
       monthname(ts) AS month_name,
       CASE WHEN month(ts) IN (12,1,2) THEN 'winter'
            WHEN month(ts) IN (3,4,5) THEN 'spring'
            WHEN month(ts) IN (6,7,8) THEN 'summer'
            ELSE 'fall' END AS season,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN hour(ts) BETWEEN 7 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_morning_rush,
       CAST(SUM(CASE WHEN hour(ts) BETWEEN 16 AND 19 THEN 1 ELSE 0 END) AS BIGINT) AS n_evening_rush,
       CAST(SUM(CASE WHEN (dayofweek(ts) + 1) IN (1,7) THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
FROM events
GROUP BY 1, 2, 3, 4, 5
"""


# --------------------------------------------------------------------------
# q23: geo expressions — haversine + bbox outlier (§2.7 geo row) over
#      deterministic synthesized coordinates ≙ gold_fact_trips.sql:47,
#      macros/geo_utils.sql:12-15
# --------------------------------------------------------------------------

def q23_geo_distances(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.scalar import haversine_km, is_bbox_outlier

    c = T(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        (F.lit(40.5) + (F.col("c_custkey") % 100) / 200.0).alias("lat"),
        (F.lit(-74.2) + (F.col("c_custkey") % 140) / 250.0).alias("lng"),
    )
    return pts.select(
        "c_custkey",
        F.round(haversine_km(F.lit(40.7128), F.lit(-74.0060), F.col("lat"), F.col("lng")), 4).alias("km_from_center"),
        is_bbox_outlier("lat", "lng").alias("is_geo_outlier"),
    )


Q23_SQL = """
WITH pts AS (
  SELECT c_custkey,
         40.5 + (c_custkey % 100) / 200.0 AS lat,
         -74.2 + (c_custkey % 140) / 250.0 AS lng
  FROM customer
)
SELECT c_custkey,
       ROUND(2 * 6371.0088 * ASIN(SQRT(
         POW(SIN((RADIANS(lat) - RADIANS(40.7128)) / 2), 2) +
         COS(RADIANS(40.7128)) * COS(RADIANS(lat)) *
         POW(SIN((RADIANS(lng) - RADIANS(-74.0060)) / 2), 2)
       )), 4) AS km_from_center,
       NOT (lat BETWEEN 40.4 AND 41.0 AND lng BETWEEN -74.3 AND -73.6) AS is_geo_outlier
FROM pts
"""


# --------------------------------------------------------------------------
# q24: JSON field extraction (§2.7 JSON row) ≙ silver_stations.sql:5-16
# --------------------------------------------------------------------------

def q24_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    # spread: get_json_object parses every row — the single-file events scan
    # otherwise runs the whole parse on one task (io.spread, no-op at scale)
    ev = spread(T(spark, sf, "events"))
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        )
        .filter(F.col("k_value").isNotNull())
        .groupBy((F.col("k_value") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("k_value").alias("max_k"))
    )


Q24_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q36: exact percentile aggregates (A-family gap: distributional stats).
# Spark's `percentile` and DuckDB's `quantile_cont` both use linear
# interpolation at index p*(n-1) over the sorted values — identical doubles
# on identical inputs (probed; ROUND 6 guards formatting only). Exact
# percentiles sort within each group: fine per-group cost at any scale
# because the shuffle is on the GROUP key and each group sorts locally
# (Spark's exact-percentile aggregate buffers per group — for hot groups at
# 100 TB the approx_percentile/t-digest family is the escape hatch; this
# operator is the exactness baseline those are judged against).
# --------------------------------------------------------------------------

def q36_event_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("v_max"),
    )


Q36_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       ROUND(MIN(value), 6) AS v_min,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99,
       ROUND(MAX(value), 6) AS v_max
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q37: ROLLUP hierarchy totals (SO-family: grouping sets). Spark's rollup +
# grouping_id and DuckDB's GROUP BY ROLLUP + GROUPING produce the same
# lattice (detail rows, per-status subtotals, grand total) with the same
# bitmask ids and NULL markers. One Expand + one hash aggregate — the Expand
# multiplies input by the grouping-set count (3 here), all partial-agg'd
# map-side before the single exchange; at 100 TB a rollup costs ~sets×scan,
# not sets×shuffles.
# --------------------------------------------------------------------------

def q37_rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 4).alias("revenue"),
            F.grouping_id().alias("gid"),
        )
    )


Q37_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# q38: time-RANGE window frame (W-family depth): per-user trailing-7-day
# event count and value sum at every event. RANGE frames need a numeric
# ORDER BY key in Spark — epoch seconds (timestampdiff from the epoch on
# the NTZ column; DuckDB FLOOR(epoch(ts)) is the same integer, probed
# equal). Frame sums are SETS (order-independent), so the decimal sum is
# exact in both engines. One hash exchange on the user key.
# --------------------------------------------------------------------------

_WEEK_S = 7 * 86400


def q38_trailing_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP'1970-01-01 00:00:00', ts)")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_sec"))
        .rangeBetween(-_WEEK_S, 0)
    )
    return (
        ev.withColumn("_sec", sec)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_7d"),
            F.round(F.sum(_dec("value", 18, 6)).over(w).cast("double"), 6).alias("sum_7d"),
        )
    )


Q38_SQL = f"""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_7d,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6) AS sum_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN {_WEEK_S} PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q39: INTERSECT / EXCEPT (SO-family completion — q16 covers UNION
# DISTINCT; these are the other two set operators, both with SQL's
# distinct-set semantics). Spark plans both as aggregated joins (left-semi
# / left-anti over distinct keys): one shuffle each, partial-distinct
# map-side.
# --------------------------------------------------------------------------

def q39_set_operations(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = ev.filter(F.col("event_type") == "error").select("user_id")
    both = purchasers.intersect(erroring).withColumn(
        "set_op", F.lit("purchase_and_error")
    )
    only = purchasers.subtract(erroring).withColumn(
        "set_op", F.lit("purchase_only")
    )
    return both.unionByName(only)


Q39_SQL = """
SELECT user_id, 'purchase_and_error' AS set_op FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT user_id, 'purchase_only' AS set_op FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)
"""


# --------------------------------------------------------------------------
# q40: sketch aggregates (A-family: the approximate tier q36's exact
# percentiles are the baseline for). At 100 TB exact COUNT(DISTINCT) is a
# full re-shuffle of the key universe; the scale path is a single-pass
# mergeable sketch (HyperLogLog++ via approx_count_distinct, KLL-style via
# approx_percentile) combined map-side like any other partial aggregate.
# Sketch outputs are engine-specific, so the cross-engine attestation is a
# TOLERANCE CONTRACT: the query emits the exact value plus a boolean
# "sketch within rsd bound" per group, and the DuckDB oracle emits the same
# exact values with the flags pinned TRUE — the hash matches iff every
# sketch landed inside its advertised error bound. Both sketches are
# deterministic for a fixed input, so the gate is stable.
# Reference analog: trip_summary.sql:12-19 (COUNT(DISTINCT bikeid) per
# month — the aggregate a 10^10-row table forces onto the sketch path).
# --------------------------------------------------------------------------

def q40_sketch_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    # TWO aggregates broadcast-joined on event_type (round-5 verdict #5,
    # BENCH/BASELINE.md "known-not-taken" rewrite, now taken): mixing
    # COUNT(DISTINCT) with percentile aggregates in one groupBy makes
    # Catalyst's distinct-rewrite Expand carry the percentile buffers
    # through a doubled row stream (2 exchanges x 2N rows). Split, the
    # distinct family expands only (event_type, user_id) pairs and the
    # percentile family aggregates the raw stream once; the 5-row join is
    # a broadcast. Per-group values are identical — same aggregates over
    # the same groups — so the output hash is unchanged.
    dist_fam = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.05).alias("_hll_users"),
    )
    pct_fam = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_exact"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("_p90_sketch"),
        F.min("value").alias("_v_min"),
        F.max("value").alias("_v_max"),
    )
    agg = dist_fam.join(F.broadcast(pct_fam), "event_type")
    # HLL++ at rsd=0.05: flag |approx-exact| <= 3*rsd*exact (3-sigma).
    # approx_percentile at accuracy=10000: rank error <= n/accuracy, so the
    # sketch p90 must land within the group's value range scaled by 1% —
    # bounded here as within 1% of the value span around the exact p90.
    # CAVEAT (r6 advice, documented): both flags are HEURISTIC bounds, not
    # hard guarantees — the sketch's contract is RANK error, which implies a
    # small VALUE error only for non-pathological distributions, and the HLL
    # 3-sigma band has a nonzero legitimate-exceedance probability. The
    # frozen oracle pins both flags TRUE for THIS deterministic corpus
    # (stable across runs); on a new corpus a legitimate exceedance would
    # surface as a gate diff, to be re-derived via a rank-bracket test
    # (compare the sketch against exact values at ranks p90*n +/- n/acc)
    # rather than by widening these constants.
    span = F.col("_v_max") - F.col("_v_min")
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_hll_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("hll_in_bound"),
        "p90_exact",
        (
            F.abs(F.col("_p90_sketch") - F.col("p90_exact")) <= 0.01 * span
        ).alias("p90_sketch_in_bound"),
    )


Q40_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_in_bound,
       ROUND(quantile_cont(value, 0.9), 6) AS p90_exact,
       TRUE AS p90_sketch_in_bound
FROM events GROUP BY event_type
"""


RELATIONAL = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_revenue_by_nation": (q02_revenue_by_nation, Q02_SQL),
    "q03_rolling_90d_top_parts": (q03_rolling_90d_top_parts, Q03_SQL),
    "q04_lww_latest_event": (q04_lww_latest_event, Q04_SQL),
    "q05_running_balance": (q05_running_balance, Q05_SQL),
    "q06_two_pass_dedup": (q06_two_pass_dedup, Q06_SQL),
    "q07_unpivot_daily_net": (q07_unpivot_daily_net, Q07_SQL),
    "q08_customers_without_orders": (q08_customers_without_orders, Q08_SQL),
    "q09_customers_with_urgent_orders": (q09_customers_with_urgent_orders, Q09_SQL),
    "q10_full_outer_degrees": (q10_full_outer_degrees, Q10_SQL),
    "q11_multi_line_orders": (q11_multi_line_orders, Q11_SQL),
    "q12_any_value_order_status": (q12_any_value_order_status, Q12_SQL),
    "q13_date_spine_daily_orders": (q13_date_spine_daily_orders, Q13_SQL),
    "q14_user_event_pivot": (q14_user_event_pivot, Q14_SQL),
    "q15_two_level_agg": (q15_two_level_agg, Q15_SQL),
    "q16_union_distinct_nations": (q16_union_distinct_nations, Q16_SQL),
    "q17_schema_fork_union": (q17_schema_fork_union, Q17_SQL),
    "q18_synthetic_keys": (q18_synthetic_keys, Q18_SQL),
    "q19_normalize_ids": (q19_normalize_ids, Q19_SQL),
    "q20_quality_flags": (q20_quality_flags, Q20_SQL),
    "q21_latest_snapshot": (q21_latest_snapshot, Q21_SQL),
    "q22_time_features": (q22_time_features, Q22_SQL),
    "q23_geo_distances": (q23_geo_distances, Q23_SQL),
    "q24_json_extract": (q24_json_extract, Q24_SQL),
    "q36_event_percentiles": (q36_event_percentiles, Q36_SQL),
    "q37_rollup_revenue": (q37_rollup_revenue, Q37_SQL),
    "q38_trailing_window": (q38_trailing_window, Q38_SQL),
    "q39_set_operations": (q39_set_operations, Q39_SQL),
    "q40_sketch_aggregates": (q40_sketch_aggregates, Q40_SQL),
}
