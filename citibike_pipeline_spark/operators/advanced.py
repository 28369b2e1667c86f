"""Advanced operator shapes: disjunctive-join rewrite, grouped applyInPandas,
sessionization, iterative PageRank.

These close out the last SURVEY.md §2 rows: the J7 IN-disjunction join
(rewritten to unpivot + equi-join, avoiding a theta join), §2.11's grouped
applyInPandas surface, session windows (the streaming-adjacent semantics the
reference lacks but a transcript pipeline needs), and §2.8's graph metrics as
DataFrame iteration (no driver-side NetworkX).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .io import T
from .resources import scoped_persist


# --------------------------------------------------------------------------
# q25: metadata reconstruction — UNION DISTINCT ids + anti-join to find
# missing + unpivot-and-equi-join to re-attach usage stats. The exact shape of
# stg_reconstructed_station_metadata.sql:10-66, whose original J7 join is the
# non-equi `m.station_id IN (t.start_station_id, t.end_station_id)`; we
# rewrite it as unpivot -> equi join (SURVEY.md J7 note) so Catalyst gets a
# hash join instead of a nested loop.
# --------------------------------------------------------------------------

def q25_reconstructed_ids(spark: SparkSession, sf: str) -> DataFrame:
    li, part = T(spark, sf, "lineitem"), T(spark, sf, "part")
    ids = (
        li.select(F.col("l_partkey").alias("id"))
        .union(li.select(F.col("l_suppkey").alias("id")))
        .distinct()
    )
    # dim restricted to a subset (p_size > 10) so reconstruction has work to
    # do — mirrors the reference, where many trip station ids are absent from
    # the stations dim (stg_reconstructed_station_metadata.sql:26-32)
    known = part.filter(F.col("p_size") > 10)
    missing = ids.join(known, ids.id == known.p_partkey, "left_anti")
    # unpivot the two id roles to rows -> equi join replaces IN-disjunction
    unpivoted = li.select(
        F.expr(
            "stack(2, 'part', l_partkey, 'supp', l_suppkey) AS (id_role, id)"
        ),
        "l_quantity",
    )
    # missing is a bounded id set (distinct keys absent from the dim);
    # broadcast it so the 2|lineitem|-row unpivot side never shuffles for
    # the join (guide §3.1 — the post-anti-join size estimate otherwise
    # defeats auto-broadcast and plans a sort-merge join of the fact side)
    return (
        unpivoted.join(F.broadcast(missing), "id")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"), 4).alias("total_qty"),
            F.sum(F.when(F.col("id_role") == "part", 1).otherwise(0)).alias("n_as_part"),
            F.sum(F.when(F.col("id_role") == "supp", 1).otherwise(0)).alias("n_as_supp"),
        )
    )


Q25_SQL = """
WITH ids AS (
  SELECT l_partkey AS id FROM lineitem UNION SELECT l_suppkey FROM lineitem
),
missing AS (
  SELECT id FROM ids
  WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = id AND p_size > 10)
),
unpivoted AS (
  SELECT 'part' AS id_role, l_partkey AS id, l_quantity FROM lineitem
  UNION ALL
  SELECT 'supp', l_suppkey, l_quantity FROM lineitem
)
SELECT m.id AS id, COUNT(*) AS n_lines,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_qty,
       CAST(SUM(CASE WHEN id_role = 'part' THEN 1 ELSE 0 END) AS BIGINT) AS n_as_part,
       CAST(SUM(CASE WHEN id_role = 'supp' THEN 1 ELSE 0 END) AS BIGINT) AS n_as_supp
FROM missing m JOIN unpivoted u ON u.id = m.id
GROUP BY m.id
"""


# --------------------------------------------------------------------------
# q26: grouped applyInPandas — per-group ordered reconstruction (§2.11).
# Per user: ordered event walk computing max inter-event gap and count of
# value regressions. Arrow-batched per group; the oracle does it with lag
# windows (same semantics, different engine idiom).
# --------------------------------------------------------------------------

_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", IntegerType(), False),
        StructField("max_gap_sec", LongType(), True),
        StructField("n_value_drops", IntegerType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)


def q26_grouped_apply_stats(spark: SparkSession, sf: str) -> DataFrame:
    # guide §4.1: applyInPandas is opaque to column pruning — without the
    # explicit select, every group ships event_type and the JSON props
    # payload through Arrow (most of the table's bytes) for a function
    # that reads four columns
    ev = T(spark, sf, "events").select("user_id", "ts", "event_id", "value")

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-user walk over a SALT BUCKET of users: one lexsort
        # by (user, ts, event_id), per-user segments via boundary masks +
        # ufunc.reduceat. Identical math to the one-user-per-call form this
        # replaces: gap seconds are the same ns-int64 diff / 1e9 double
        # total_seconds computed, the sequential reduceat sum of the
        # 2-decimal-rounded values can only differ from pandas' sum by ULPs
        # that the final round(., 2) absorbs (2-decimal rationals sit 0.005
        # from a rounding boundary, fp error is ~1e-12), and the final
        # int(floor)/round(., 2) are the same Python scalar ops per group.
        import numpy as np

        uid = pdf["user_id"].to_numpy()
        ts = pdf["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        eid = pdf["event_id"].to_numpy()
        val = pdf["value"].to_numpy().astype(np.float64)
        o = np.lexsort((eid, ts, uid))
        uid, ts, val = uid[o], ts[o], val[o]
        n = len(uid)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, n))
        within = ~new[1:]  # pair (i, i+1) is inside one user's run
        secs = np.where(within, (ts[1:] - ts[:-1]) / 1e9, -np.inf)
        gmax = np.maximum.reduceat(np.append(secs, -np.inf), starts)
        dv = np.where(within & (val[1:] - val[:-1] < 0), 1, 0)
        drops = np.add.reduceat(np.append(dv, 0), starts)
        totals = np.add.reduceat(np.round(val, 2), starts)
        return pd.DataFrame(
            {
                "user_id": pd.Series(uid[starts], dtype="int64"),
                "n_events": pd.Series(counts, dtype="int32"),
                "max_gap_sec": [
                    None if c < 2 else int(g // 1)
                    for c, g in zip(counts, gmax)
                ],
                "n_value_drops": pd.Series(drops, dtype="int32"),
                "total_value": [round(float(t), 2) for t in totals],
            }
        )

    # salt users into ~2x-parallelism buckets so the grouped-apply pays the
    # per-call Arrow/pandas overhead per BUCKET, not per user (15k calls ->
    # ~64 at sf1.0; the per-group semantics live in the reduceat segments).
    # Bucket count never affects the result — it only sizes the tasks.
    n_buckets = max(spark.sparkContext.defaultParallelism * 2, 8)
    return (
        ev.withColumn("_bkt", F.pmod("user_id", F.lit(n_buckets)))
        .groupBy("_bkt")
        .applyInPandas(walk, schema=_SESSION_SCHEMA)
    )


Q26_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS INT) AS n_events,
       CAST(FLOOR(MAX(epoch(ts) - epoch(prev_ts))) AS BIGINT) AS max_gap_sec,
       CAST(SUM(CASE WHEN value < prev_v THEN 1 ELSE 0 END) AS INT) AS n_value_drops,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
FROM ordered GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q27: sessionization — 30-minute-gap session ids via window cumsum; the
# batch expression of session windows (streaming §2.10 analog)
# --------------------------------------------------------------------------

def q27_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.expr("timestampdiff(SECOND, _prev_ts, ts)")
    with_gap = (
        ev.withColumn("_prev_ts", prev)
        .withColumn(
            "is_new_session",
            F.when(F.col("_prev_ts").isNull() | (gap > 1800), 1).otherwise(0),
        )
        .drop("_prev_ts")
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = with_gap.withColumn("session_id", F.sum("is_new_session").over(wcum))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


Q27_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR FLOOR(epoch(ts) - epoch(lag(ts) OVER w)) > 1800 THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# q28: PageRank as DataFrame iteration (§2.8 N2) — no driver-side graph lib.
# Graph: supplier -> part edges from lineitem, weighted by line count.
# Fixed 3 iterations, damping 0.85, deterministic. Oracle: the same 3
# iterations unrolled as chained CTEs.
# --------------------------------------------------------------------------

_PR_ITers = 3
_DAMP = 0.85
# internal long node encoding for the graph operators: supplier = key,
# part = key + 2^32 (keys are 32-bit positive, so the map is bijective and
# order within each side is preserved)
_NODE_OFF = 1 << 32


def q28_pagerank(
    spark: SparkSession, sf: str, _full_unroll: bool = False
) -> DataFrame:
    # _full_unroll=True runs all _PR_ITers rounds with no bipartite
    # short-circuit — test-only, for pinning the 2-round equivalence
    li = T(spark, sf, "lineitem")
    # node ids are prefixed: supplier k and part k are DIFFERENT nodes.
    # INTERNAL ids are longs (supplier = key, part = key + 2^32 — bijective
    # to the "s{k}"/"p{k}" strings, rendered only at the output boundary):
    # every iteration join/aggregate hashes longs instead of strings
    # (guide §2.3 narrower types). edges is PERSISTED: out-weights, the
    # transition build and the node set all consume it — uncached, the 6M-
    # row lineitem aggregation re-runs per consumer (cross-job exchange
    # reuse does not apply across actions).
    # the edge aggregate groups by ONE packed long (suppkey << 32 | partkey
    # — bijective to the pair, both keys < 2^32) instead of two columns:
    # same groups, narrower shuffle rows and a single-column hash for the
    # 6M-row build exchange (guide §2.3). src/dst unpack after the agg;
    # dst = partkey + 2^32 is exactly the packed key's low half + _NODE_OFF.
    pack = F.shiftleft(F.col("l_suppkey").cast("long"), 32).bitwiseOR(
        F.col("l_partkey").cast("long")
    )
    edges = scoped_persist(
        li.select(pack.alias("sd"))
        .groupBy("sd")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            F.shiftright("sd", 32).alias("src"),
            (F.col("sd").bitwiseAND(F.lit((1 << 32) - 1)) + F.lit(_NODE_OFF)).alias(
                "dst"
            ),
            "w",
        )
    )
    # out-weight per src, edge transition probability.
    # trans/nodes are PERSISTED: every power iteration references both, so
    # without a cache the final plan re-aggregates lineitem ~2x per
    # iteration (the q31 compounding trap). Released by the harness via
    # operators/resources.py.
    out = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    # out is O(suppliers) rows — broadcast so the edge table never shuffles
    trans = scoped_persist(
        edges.join(F.broadcast(out), "src").select(
            "src", "dst", (F.col("w").cast("double") / F.col("w_out")).alias("p")
        )
    )
    nodes = scoped_persist(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # small driver scalar (node count, not data)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    # The graph is STRUCTURALLY bipartite src -> dst (src = supplier key
    # < 2^32 <= dst = part key + 2^32, disjoint by construction), so no
    # node both sends and receives: supplier ranks get zero inflow and are
    # the constant (1-d)/n from iteration 1 on, and part ranks — a pure
    # function of the constant supplier ranks — are BIT-IDENTICAL from
    # iteration 2 on (iteration k >= 2 re-evaluates the same expression on
    # the same inputs). Iterations beyond 2 are therefore exact identities;
    # running min(_PR_ITers, 2) matches the _PR_ITers-round unrolled oracle
    # hash-for-hash while dropping one |E|-sized join+aggregate pass per
    # skipped round (pinned by test_graph_metrics' 2-vs-N equality test).
    for _ in range(_PR_ITers if _full_unroll else min(_PR_ITers, 2)):
        # rank/contrib tables are O(nodes) rows — broadcast both sides each
        # round so the edge-sized transition table is NEVER shuffled: the
        # unhinted plan sort-merge-joined ~|E| rows per iteration (guide
        # §2.4/§3.1; |E| ~ 6M at sf1.0 vs ~210k node rows)
        contribs = (
            trans.join(F.broadcast(ranks), trans.src == ranks.node)
            .select("dst", (F.col("p") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(F.broadcast(contribs), nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit((1 - _DAMP) / n_nodes)
                    + F.lit(_DAMP) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
    # render the string node ids only for the ranked projection; ties in
    # rank order by the SAME string form as before
    node_str = F.when(
        F.col("node") < _NODE_OFF,
        F.concat(F.lit("s"), F.col("node").cast("string")),
    ).otherwise(
        F.concat(F.lit("p"), (F.col("node") - F.lit(_NODE_OFF)).cast("string"))
    )
    return ranks.select(
        node_str.alias("node"), F.round("rank", 9).alias("rank")
    ).orderBy(F.desc("rank"), "node").limit(20)


Q28_SQL = f"""
WITH edges AS (
  SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst, COUNT(*) AS w
  FROM lineitem GROUP BY 1, 2
),
outw AS (SELECT src, SUM(w) AS w_out FROM edges GROUP BY src),
trans AS (
  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.w_out AS p
  FROM edges e JOIN outw o ON e.src = o.src
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
r1 AS (
  SELECT n.node,
         (1 - {_DAMP}) / nn.n + {_DAMP} * COALESCE(SUM(t.p * r.rank), 0.0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN trans t ON t.dst = n.node LEFT JOIN r0 r ON r.node = t.src
  GROUP BY n.node, nn.n
),
r2 AS (
  SELECT n.node,
         (1 - {_DAMP}) / nn.n + {_DAMP} * COALESCE(SUM(t.p * r.rank), 0.0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN trans t ON t.dst = n.node LEFT JOIN r1 r ON r.node = t.src
  GROUP BY n.node, nn.n
),
r3 AS (
  SELECT n.node,
         (1 - {_DAMP}) / nn.n + {_DAMP} * COALESCE(SUM(t.p * r.rank), 0.0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN trans t ON t.dst = n.node LEFT JOIN r0x r ON r.node = t.src
  GROUP BY n.node, nn.n
)
SELECT node, ROUND(rank, 9) AS rank FROM r3 ORDER BY rank DESC, node LIMIT 20
"""

# fix the r3 reference (built above programmatically to mirror iterations)
Q28_SQL = Q28_SQL.replace("LEFT JOIN r0x r", "LEFT JOIN r2 r")


# --------------------------------------------------------------------------
# q29: spatial enrichment join (J4) ≙ silver_stations.sql:83-86 /
#      stg_reconstructed_station_metadata.sql:61-66 — points joined into a
#      broadcast polygon dim by containment (bbox-per-region is the
#      sanctioned polygon approximation). Physical shape at scale:
#      BroadcastNestedLoopJoin against a tiny dim — no shuffle of the fact
#      side at all; misses flow through the left join as 'outside'.
# --------------------------------------------------------------------------

def q29_spatial_enrichment(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.dims import geo_zones

    c = T(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        (F.lit(40.5) + (F.col("c_custkey") % 100) / 200.0).alias("lat"),
        (F.lit(-74.2) + (F.col("c_custkey") % 140) / 250.0).alias("lng"),
    )
    z = geo_zones(spark)
    contained = (
        (pts["lat"] >= z["lat_min"]) & (pts["lat"] < z["lat_max"])
        & (pts["lng"] >= z["lng_min"]) & (pts["lng"] < z["lng_max"])
    )
    return (
        pts.join(F.broadcast(z), contained, "left")
        .groupBy(F.coalesce("zone", F.lit("outside")).alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("c_custkey").alias("min_custkey"),
            F.round(F.avg("lat"), 6).alias("avg_lat"),
            F.round(F.avg("lng"), 6).alias("avg_lng"),
        )
    )


def _zones_values_sql() -> str:
    from ..sources.dims import GEO_ZONE_ROWS

    rows = ", ".join(
        f"('{z}', {a}, {b}, {c0}, {d})" for z, a, b, c0, d in GEO_ZONE_ROWS
    )
    return f"(VALUES {rows}) AS z(zone, lat_min, lat_max, lng_min, lng_max)"


Q29_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         40.5 + (c_custkey % 100) / 200.0 AS lat,
         -74.2 + (c_custkey % 140) / 250.0 AS lng
  FROM customer
)
SELECT COALESCE(z.zone, 'outside') AS zone,
       COUNT(*) AS n_points,
       MIN(c_custkey) AS min_custkey,
       ROUND(AVG(lat), 6) AS avg_lat,
       ROUND(AVG(lng), 6) AS avg_lng
FROM pts LEFT JOIN {_zones_values_sql()}
  ON pts.lat >= z.lat_min AND pts.lat < z.lat_max
 AND pts.lng >= z.lng_min AND pts.lng < z.lng_max
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q29b: EXACT polygon containment (≙ ST_CONTAINS, silver_stations.sql:83-86)
# — the upgrade over q29's sanctioned bbox approximation. Physical shape:
# broadcast the tiny polygon dim, bbox as the cheap JVM-side pre-filter, then
# a vectorized Arrow-batched pandas UDF runs the exact ray-crossing
# (PNPOLY) test only on the bbox candidates. The UDF vectorizes per distinct
# polygon (numpy over all its candidate points), so Python cost is
# O(polygons) per batch, not O(rows). The DuckDB oracle computes the same
# crossings as edge-table SQL (COUNT parity), pinning the UDF's math
# cross-engine.
# --------------------------------------------------------------------------


def _pip_udf():
    import numpy as np
    import pandas as pd

    @F.pandas_udf("boolean")
    def point_in_polygon(
        lat: pd.Series, lng: pd.Series, verts: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(lat), dtype=bool)
        if not len(lat):
            return pd.Series(out)
        # CASE WHEN doesn't short-circuit UDF evaluation: left-join misses
        # arrive with null verts — they are outside by definition
        keys = verts.map(
            lambda v: b"" if v is None else np.asarray(list(v), dtype=float).tobytes()
        )
        plat, plng = lat.to_numpy(dtype=float), lng.to_numpy(dtype=float)
        for k in keys.unique():
            if k == b"":
                continue
            mask = (keys == k).to_numpy()
            ring = np.frombuffer(k).reshape(-1, 2)
            px, py = plat[mask], plng[mask]
            inside = np.zeros(px.shape, dtype=bool)
            n = len(ring)
            for i in range(n):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % n]
                spans = (y1 > py) != (y2 > py)
                if not spans.any():
                    continue
                # identical expression/order to the oracle SQL — same IEEE754
                # doubles on both engines
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                inside ^= spans & (px < xint)
            out[mask] = inside
        return pd.Series(out)

    return point_in_polygon


def q29b_polygon_enrichment(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.dims import geo_polygons

    c = T(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        (F.lit(40.5) + (F.col("c_custkey") % 100) / 200.0).alias("lat"),
        (F.lit(-74.2) + (F.col("c_custkey") % 140) / 250.0).alias("lng"),
    )
    z = geo_polygons(spark)
    in_bbox = (
        (pts["lat"] >= z["lat_min"]) & (pts["lat"] <= z["lat_max"])
        & (pts["lng"] >= z["lng_min"]) & (pts["lng"] <= z["lng_max"])
    )
    pip = _pip_udf()
    cand = pts.join(F.broadcast(z), in_bbox, "left")
    marked = cand.withColumn(
        "inside",
        F.when(F.col("zone").isNull(), F.lit(False)).otherwise(
            pip("lat", "lng", "verts")
        ),
    )
    per_point = marked.groupBy("c_custkey", "lat", "lng").agg(
        F.max(F.when(F.col("inside"), F.col("zone"))).alias("zone")
    )
    return per_point.groupBy(
        F.coalesce("zone", F.lit("outside")).alias("zone")
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("c_custkey").alias("min_custkey"),
        F.round(F.avg("lat"), 6).alias("avg_lat"),
        F.round(F.avg("lng"), 6).alias("avg_lng"),
    )


def _poly_sql_tables() -> tuple[str, str]:
    from ..sources.dims import GEO_POLY_ROWS, poly_bbox

    bboxes = ", ".join(
        "('{z}', {a}, {b}, {c}, {d})".format(z=z, a=a, b=b, c=c, d=d)
        for z, verts in GEO_POLY_ROWS
        for a, b, c, d in [poly_bbox(verts)]
    )
    edges = ", ".join(
        f"('{z}', {ring[i][0]}, {ring[i][1]}, "
        f"{ring[(i + 1) % len(ring)][0]}, {ring[(i + 1) % len(ring)][1]})"
        for z, ring in GEO_POLY_ROWS
        for i in range(len(ring))
    )
    return (
        f"(VALUES {bboxes}) AS b(zone, lat_min, lat_max, lng_min, lng_max)",
        f"(VALUES {edges}) AS e(zone, x1, y1, x2, y2)",
    )


def _q29b_sql() -> str:
    bboxes, edges = _poly_sql_tables()
    return f"""
WITH pts AS (
  SELECT c_custkey,
         40.5 + (c_custkey % 100) / 200.0 AS lat,
         -74.2 + (c_custkey % 140) / 250.0 AS lng
  FROM customer
),
inside AS (
  SELECT p.c_custkey, e.zone
  FROM pts p
  JOIN {bboxes}
    ON p.lat >= b.lat_min AND p.lat <= b.lat_max
   AND p.lng >= b.lng_min AND p.lng <= b.lng_max
  JOIN {edges} ON e.zone = b.zone
  WHERE ((e.y1 > p.lng) != (e.y2 > p.lng))
    AND p.lat < (e.x2 - e.x1) * (p.lng - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY 1, 2
  HAVING COUNT(*) % 2 = 1
),
labeled AS (
  SELECT p.c_custkey, p.lat, p.lng, MAX(i.zone) AS zone
  FROM pts p LEFT JOIN inside i ON p.c_custkey = i.c_custkey
  GROUP BY 1, 2, 3
)
SELECT COALESCE(zone, 'outside') AS zone,
       COUNT(*) AS n_points,
       MIN(c_custkey) AS min_custkey,
       ROUND(AVG(lat), 6) AS avg_lat,
       ROUND(AVG(lng), 6) AS avg_lng
FROM labeled GROUP BY 1
"""


Q29B_SQL = _q29b_sql()


# --------------------------------------------------------------------------
# q30: holiday-seed broadcast join into a date spine (J5) ≙
#      gold_dim_dates.sql:26-28 + generate_holidays.py:8-31 — the seed-dim
#      enrichment shape: generated spine LEFT JOIN tiny seed, miss -> flag.
# --------------------------------------------------------------------------

def q30_holiday_spine(spark: SparkSession, sf: str) -> DataFrame:
    from ..plans.gold import HOLIDAY_YEARS
    from ..sources.dims import holidays

    ev = T(spark, sf, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("date_key"))
    hol = holidays(spark, HOLIDAY_YEARS)
    return spine.join(F.broadcast(hol), on="date_key", how="left").select(
        "date_key",
        F.col("holiday_name").isNotNull().alias("is_holiday"),
        "holiday_name",
    )


def _holiday_values_sql() -> str:
    from ..plans.gold import HOLIDAY_YEARS
    from ..sources.dims import holiday_rows

    rows = ", ".join(
        f"(DATE '{d.isoformat()}', '{n}')" for d, n in holiday_rows(HOLIDAY_YEARS)
    )
    return f"(VALUES {rows}) AS h(date_key, holiday_name)"


Q30_SQL = f"""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
),
spine AS (
  SELECT CAST(u.d AS DATE) AS date_key
  FROM bounds, UNNEST(generate_series(bounds.d0, bounds.d1, INTERVAL 1 DAY)) AS u(d)
)
SELECT spine.date_key,
       h.holiday_name IS NOT NULL AS is_holiday,
       h.holiday_name
FROM spine LEFT JOIN {_holiday_values_sql()} ON spine.date_key = h.date_key
"""


# --------------------------------------------------------------------------
# q31: truncated closeness centrality (§2.8 N2, closing the round-1 partial)
# — multi-source BFS to depth D as DataFrame frontier iteration (the
# Pregel-on-DataFrames shape: one edge join + min-dist aggregate per level).
# Truncation at fixed depth keeps it deterministic, oracle-expressible
# (unrolled min-dist CTEs), and bounded at scale: per level exactly one
# shuffle on node, state = (seed, node, dist) for the seed set only.
# closeness(seed) = n_reached / sum(dist) over nodes within depth D.
# --------------------------------------------------------------------------

_BFS_DEPTH = 4
_N_SEEDS = 3  # suppliers s1..s3


def q31_closeness(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    # internal node ids are the q28 long encoding (supplier = key, part =
    # key + 2^32) — bijective to the "s{k}"/"p{k}" strings, so BFS layers
    # and counts are identical while every per-round join hashes longs.
    # NO edge-level distinct: each round's hop already distincts its
    # (seed, node) output, so duplicate (supp, part) rows cannot change any
    # BFS layer — dropping the distinct removes a full |lineitem|-row
    # shuffle and caches the raw scan projection instead (guide §2.4).
    e = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.col("l_partkey").cast("long") + F.lit(_NODE_OFF)).alias("b"),
    )
    # undirected walk over a BIPARTITE edge set: a supplier-side frontier
    # can only match the forward direction and a part-side frontier only
    # the reverse (the long encoding makes the sides disjoint), so instead
    # of caching the 2|E|-row undirected union, cache the |E| forward pairs
    # ONCE and probe the matching direction per round — half the cache
    # build and half the probe bytes, identical hops. PERSISTED: every BFS
    # round joins against it (released via operators/resources.py).
    edges = scoped_persist(e)
    seeds = spark.range(1, _N_SEEDS + 1).select(F.col("id").alias("node"))
    dist = seeds.select(
        F.col("node").alias("seed"), "node", F.lit(0).alias("dist")
    )
    # FRONTIER BFS, broadcast-side: only nodes first reached in round i
    # expand in round i+1 (visited nodes can never improve a min-dist), and
    # the frontier/visited sets are BOUNDED BY seeds × nodes — orders of
    # magnitude smaller than the edge set — so both sides the rounds add
    # are broadcast, and the 2|E|-row edge table is NEVER shuffled: each
    # round is one in-place hash probe over the cached edges plus a small
    # distinct (the naive layering re-shuffled ~2|E| rows per round).
    # The count per round materializes the
    # persisted frontier and stops early once BFS has covered the graph.
    # Same min-dist result by BFS layer induction; the DuckDB oracle keeps
    # the naive unroll (it materializes per-level CTEs, where the simpler
    # shape wins).
    frontier = dist
    for i in range(_BFS_DEPTH):
        # seeds are suppliers, so even rounds expand supplier->part
        # (forward) and odd rounds part->supplier (reverse) — the other
        # direction can never match a bipartite frontier
        if i % 2 == 0:
            hop = (
                edges.join(F.broadcast(frontier), frontier.node == edges.a)
                .select("seed", F.col("b").alias("node"))
                .distinct()
            )
        else:
            hop = (
                edges.join(F.broadcast(frontier), frontier.node == edges.b)
                .select("seed", F.col("a").alias("node"))
                .distinct()
            )
        frontier = scoped_persist(
            hop.join(
                F.broadcast(dist.select("seed", "node")),
                ["seed", "node"],
                "left_anti",
            ).withColumn("dist", F.lit(i + 1))
        )
        # dist stays a lazy union OF persisted frontiers — cheap to rebuild
        # from caches; persisting the union itself just added a job/round
        dist = dist.unionByName(frontier)
        if frontier.count() == 0:
            break  # graph covered — further rounds are no-ops
    return (
        dist.filter(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum("dist").alias("total_dist"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("dist"), 6
            ).alias("closeness"),
        )
        # seeds are suppliers — render the "s{k}" string form at the edge
        .select(
            F.concat(F.lit("s"), F.col("seed").cast("string")).alias("seed"),
            "n_reached",
            "total_dist",
            "closeness",
        )
    )


def _closeness_sql() -> str:
    levels = []
    prev = "d0"
    for i in range(1, _BFS_DEPTH + 1):
        levels.append(
            f"d{i} AS (\n"
            f"  SELECT seed, node, MIN(dist) AS dist FROM (\n"
            f"    SELECT seed, node, dist FROM {prev}\n"
            f"    UNION ALL\n"
            f"    SELECT p.seed, e.b AS node, p.dist + 1 AS dist\n"
            f"    FROM {prev} p JOIN edges e ON p.node = e.a\n"
            f"  ) GROUP BY seed, node\n"
            f")"
        )
        prev = f"d{i}"
    seeds = ", ".join(f"'s{i}'" for i in range(1, _N_SEEDS + 1))
    return f"""
WITH e0 AS (
  SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b FROM lineitem
),
edges AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
d0 AS (
  SELECT node AS seed, node, 0 AS dist
  FROM (SELECT DISTINCT a AS node FROM e0 WHERE a IN ({seeds}))
),
{", ".join(levels)}
SELECT seed, COUNT(*) AS n_reached,
       CAST(SUM(dist) AS BIGINT) AS total_dist,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(dist), 6) AS closeness
FROM {prev} WHERE dist > 0 GROUP BY seed
"""


Q31_SQL = _closeness_sql()


# --------------------------------------------------------------------------
# q33: truncated betweenness centrality (§2.8 N2 — the last sub-item,
# ≙ nx.betweenness_centrality in citibike/networks/analysis.py:60).
# Exact Brandes is inherently sequential per source; the Spark-first shape
# is (a) a distributed reduction to a bounded hub graph (top-K nodes per
# side, same contract as q32a), then (b) shortest-path COUNTING over paths
# of length ≤ 3 expressed as edge self-joins — deterministic, one bounded
# shuffle per hop, and oracle-expressible. On the undirected bipartite hub
# graph all same-side pairs sit at distance 2 and cross-side at 1 or 3, so
# the ≤3 truncation covers every finite pair unless the graph is
# disconnected (then, like q31's truncation, farther pairs are excluded by
# construction — documented truncated semantics, pinned vs networkx in
# tests/test_graph_metrics.py).
# B(v) = Σ_{s<t, d(s,t)≤3} σ_st(v) / σ_st  (unnormalized, unordered pairs)
# --------------------------------------------------------------------------

_BC_TOP = 12  # hubs per side — bounds the path-counting joins at 24 nodes


def q33_betweenness(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")

    def top_keys(prefix: str, col: str) -> DataFrame:
        # aggregate on the raw int key; build the node string only for the
        # |keys|-row ranked projection (same deterministic string tiebreak)
        return (
            li.groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.concat(F.lit(prefix), F.col("k")).alias("node"), "k", "c")
            .orderBy(F.desc("c"), "node")
            .limit(_BC_TOP)
        )

    sup_k, part_k = top_keys("s", "l_suppkey"), top_keys("p", "l_partkey")
    sup, part = sup_k.select("node"), part_k.select("node")
    e0 = (
        li.select(F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk"))
        .join(F.broadcast(sup_k.select(F.col("k").alias("sk"))), "sk")
        .join(F.broadcast(part_k.select(F.col("k").alias("pk"))), "pk")
        .distinct()
        .select(
            F.concat(F.lit("s"), F.col("sk")).alias("a"),
            F.concat(F.lit("p"), F.col("pk")).alias("b"),
        )
    )
    # undirected walk space over the bounded graph (≤ 2·K² edge rows).
    # PERSISTED: the path-counting joins below reference this frame six
    # times (e1/e2/e3 aliases, d1, and both anti-join probes) and the union
    # references e0 twice — uncached, every reference re-runs the lineitem
    # reduction (the q31/q28 compounding trap).
    edges = scoped_persist(
        e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )

    d1 = edges.filter(F.col("a") < F.col("b")).select(
        F.col("a").alias("s"), F.col("b").alias("t")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    w2 = e1.join(
        e2, (F.col("e1.b") == F.col("e2.a")) & (F.col("e1.a") < F.col("e2.b"))
    ).select(
        F.col("e1.a").alias("s"), F.col("e1.b").alias("m"), F.col("e2.b").alias("t")
    )
    # distance exactly 2: drop pairs with a direct edge (all of d1/sig2/sig3
    # are bounded by the K²-node pair space — broadcast, never shuffle)
    d2 = w2.join(F.broadcast(d1), ["s", "t"], "left_anti")
    sig2 = d2.groupBy("s", "t").agg(F.count(F.lit(1)).alias("sigma"))
    bc2 = d2.join(F.broadcast(sig2), ["s", "t"]).select(
        F.col("m").alias("node"), (F.lit(1.0) / F.col("sigma")).alias("contrib")
    )

    w3 = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, F.col("e2.b") == F.col("e3.a"))
        .filter(
            (F.col("e1.a") < F.col("e3.b"))
            & (F.col("e1.b") != F.col("e3.b"))
            & (F.col("e2.b") != F.col("e1.a"))
        )
        .select(
            F.col("e1.a").alias("s"), F.col("e1.b").alias("m1"),
            F.col("e2.b").alias("m2"), F.col("e3.b").alias("t"),
        )
    )
    # distance exactly 3: no direct edge and no 2-path
    d3 = w3.join(F.broadcast(d1), ["s", "t"], "left_anti").join(
        F.broadcast(sig2.select("s", "t")), ["s", "t"], "left_anti"
    )
    sig3 = d3.groupBy("s", "t").agg(F.count(F.lit(1)).alias("sigma"))
    bc3 = (
        d3.join(F.broadcast(sig3), ["s", "t"])
        .select(
            F.explode(F.array("m1", "m2")).alias("node"),
            (F.lit(1.0) / F.col("sigma")).alias("contrib"),
        )
    )

    contribs = bc2.unionByName(bc3).groupBy("node").agg(
        F.sum("contrib").alias("bc")
    )
    return (
        sup.unionByName(part)
        .join(contribs, "node", "left")
        .select(
            "node",
            F.round(F.coalesce(F.col("bc"), F.lit(0.0)), 6).alias("betweenness"),
        )
    )


Q33_SQL = f"""
WITH sup AS (
  SELECT 's' || l_suppkey AS node, COUNT(*) AS c
  FROM lineitem GROUP BY 1 ORDER BY c DESC, node LIMIT {_BC_TOP}
),
part AS (
  SELECT 'p' || l_partkey AS node, COUNT(*) AS c
  FROM lineitem GROUP BY 1 ORDER BY c DESC, node LIMIT {_BC_TOP}
),
e0 AS (
  SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
  FROM lineitem
  WHERE 's' || l_suppkey IN (SELECT node FROM sup)
    AND 'p' || l_partkey IN (SELECT node FROM part)
),
edges AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
d1 AS (SELECT a AS s, b AS t FROM edges WHERE a < b),
w2 AS (
  SELECT e1.a AS s, e1.b AS m, e2.b AS t
  FROM edges e1 JOIN edges e2 ON e1.b = e2.a AND e1.a < e2.b
),
d2 AS (
  SELECT * FROM w2
  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.s = w2.s AND d1.t = w2.t)
),
sig2 AS (SELECT s, t, COUNT(*) AS sigma FROM d2 GROUP BY s, t),
bc2 AS (
  SELECT d2.m AS node, 1.0 / sig2.sigma AS contrib
  FROM d2 JOIN sig2 ON d2.s = sig2.s AND d2.t = sig2.t
),
w3 AS (
  SELECT e1.a AS s, e1.b AS m1, e2.b AS m2, e3.b AS t
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e2.b = e3.a
  WHERE e1.a < e3.b AND e1.b != e3.b AND e2.b != e1.a
),
d3 AS (
  SELECT * FROM w3
  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.s = w3.s AND d1.t = w3.t)
    AND NOT EXISTS (SELECT 1 FROM sig2 WHERE sig2.s = w3.s AND sig2.t = w3.t)
),
sig3 AS (SELECT s, t, COUNT(*) AS sigma FROM d3 GROUP BY s, t),
bc3 AS (
  SELECT UNNEST([m1, m2]) AS node, 1.0 / sig3.sigma AS contrib
  FROM d3 JOIN sig3 ON d3.s = sig3.s AND d3.t = sig3.t
),
contribs AS (
  SELECT node, SUM(contrib) AS bc
  FROM (SELECT * FROM bc2 UNION ALL SELECT * FROM bc3) GROUP BY node
),
all_nodes AS (SELECT node FROM sup UNION ALL SELECT node FROM part)
SELECT all_nodes.node, ROUND(COALESCE(contribs.bc, 0.0), 6) AS betweenness
FROM all_nodes LEFT JOIN contribs ON all_nodes.node = contribs.node
"""


ADVANCED = {
    "q25_reconstructed_ids": (q25_reconstructed_ids, Q25_SQL),
    "q26_grouped_apply_stats": (q26_grouped_apply_stats, Q26_SQL),
    "q27_sessionization": (q27_sessionization, Q27_SQL),
    "q28_pagerank": (q28_pagerank, Q28_SQL),
    "q29_spatial_enrichment": (q29_spatial_enrichment, Q29_SQL),
    "q29b_polygon_enrichment": (q29b_polygon_enrichment, Q29B_SQL),
    "q30_holiday_spine": (q30_holiday_spine, Q30_SQL),
    "q31_closeness": (q31_closeness, Q31_SQL),
    "q33_betweenness": (q33_betweenness, Q33_SQL),
}
