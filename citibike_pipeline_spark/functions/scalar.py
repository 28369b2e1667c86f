"""Scalar expressions mirroring the reference's macro layer (SURVEY.md §2.7).

Each function returns a pyspark Column built from built-in functions only —
the Spark-side equivalent of dbt Jinja macros expanded inline (the reference
has no engine-registered UDFs; neither do we for scalars).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_entity_id(col: Column | str) -> Column:
    """Canonicalize float-formatted ids: '72.0' -> '72.00' style.

    ≙ macros/normalize_station_id.sql:1-7 — REGEXP_CONTAINS(id, r'^\\d+\\.\\d+$')
    ? FORMAT('%.2f', CAST(id AS FLOAT64)) : id. Used at silver_trips.sql:18,20.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.rlike(r"^\d+\.\d+$"), F.format_string("%.2f", c.cast("double"))
    ).otherwise(c)


def derive_season(ts_col: Column | str) -> Column:
    """Month -> season mapping. ≙ macros/datetime_utils.sql:24-31."""
    m = F.month(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    return (
        F.when(m.isin(12, 1, 2), F.lit("winter"))
        .when(m.isin(3, 4, 5), F.lit("spring"))
        .when(m.isin(6, 7, 8), F.lit("summer"))
        .otherwise(F.lit("fall"))
    )


def is_bbox_outlier(
    lat: Column | str,
    lng: Column | str,
    lat_min: float = 40.4,
    lat_max: float = 41.0,
    lng_min: float = -74.3,
    lng_max: float = -73.6,
) -> Column:
    """Bounding-box geographic outlier check. ≙ macros/geo_utils.sql:12-15
    (NYC box). Plain comparisons — no geo library needed."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lng) if isinstance(lng, str) else lng
    return ~(la.between(lat_min, lat_max) & lo.between(lng_min, lng_max))


def haversine_km(lat1, lng1, lat2, lng2) -> Column:
    """Great-circle distance in km — native-function replacement for
    BigQuery ST_DISTANCE (gold_fact_trips.sql:47, gold_commuter_edges.sql:49)."""
    to_c = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    rlat1, rlng1, rlat2, rlng2 = (F.radians(to_c(c)) for c in (lat1, lng1, lat2, lng2))
    dlat = rlat2 - rlat1
    dlng = rlng2 - rlng1
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))


def stable_md5_key(*cols) -> Column:
    """Deterministic synthetic key: hex(md5(concat(parts))).

    ≙ stg_trips_legacy.sql:5-12 — 'legacy_' || TO_HEX(MD5(CONCAT(...))) gives
    rows without a natural key a stable one. Callers prepend their own prefix.
    """
    parts = [F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws("||", *parts))


def guarded_div(num: Column, den: Column, scale: int | None = None) -> Column:
    """NULL-safe ratio: CASE WHEN den>0 THEN num/den END.
    ≙ stg_combined_trip_metrics.sql:69-90 guarded divisions."""
    out = F.when(den != 0, num / den)
    return F.round(out, scale) if scale is not None else out
