"""Semantic tests for the CDC-native batch operators (q34/q35) and the
incremental text ops (d15/d16): interval algebra, as-of visibility, planted
drop-path behavior — properties the DuckDB hash gate proves only in bulk."""

import pytest
from pyspark.sql import functions as F

from citibike_pipeline_spark.operators.cdcops import (
    SCD2_TIE_EVERY,
    SCD2_TIE_ID,
    SCD2_TIE_SHIFT,
    q34_scd2_history,
    q35_asof_enrich,
)
from citibike_pipeline_spark.operators.textops import (
    D16_ID_INBATCH,
    D16_ID_XBATCH,
    d15_quality_rules,
    d16_incremental_dedup,
)
from citibike_pipeline_spark.operators.io import T


@pytest.fixture(scope="module")
def scd2(spark, sf_dir):
    df = q34_scd2_history(spark, sf_dir).cache()
    yield df
    df.unpersist()


def test_scd2_lww_keeps_planted_shadow(spark, sf_dir, scd2):
    """Every planted (user_id, ts) tie must resolve to the SHADOW row
    (higher event_id, value + SCD2_TIE_SHIFT) — the LWW tiebreak path."""
    ev = T(spark, sf_dir, "events")
    n_planted = ev.filter(F.col("event_id") % SCD2_TIE_EVERY == 0).count()
    shadows = scd2.filter(F.col("event_id") >= SCD2_TIE_ID)
    assert shadows.count() == n_planted
    # and no original of a tied pair survived
    originals = ev.filter(F.col("event_id") % SCD2_TIE_EVERY == 0).select(
        "event_id"
    )
    leaked = scd2.join(originals, "event_id", "inner").count()
    assert leaked == 0
    # the shadow carries the shifted state value
    joined = (
        shadows.withColumn("orig_id", F.col("event_id") - SCD2_TIE_ID)
        .join(
            ev.select(F.col("event_id").alias("orig_id"), "value"),
            "orig_id",
        )
        .filter(
            F.abs(F.col("state_value") - F.col("value") - SCD2_TIE_SHIFT) > 1e-9
        )
    )
    assert joined.count() == 0


def test_scd2_intervals_tile_per_user(scd2):
    """Versions per user form a gapless chain: valid_to == next valid_from,
    exactly one open (is_current) interval per user, version_n contiguous."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    chained = scd2.withColumn("_next_from", F.lead("valid_from").over(w))
    bad_chain = chained.filter(
        (F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("_next_from")))
        | (F.col("valid_to").isNull() & F.col("_next_from").isNotNull())
    )
    assert bad_chain.count() == 0
    per_user = scd2.groupBy("user_id").agg(
        F.sum("is_current").alias("n_open"),
        F.count(F.lit(1)).alias("n"),
        F.max("version_n").alias("vmax"),
        F.min("version_n").alias("vmin"),
    )
    assert per_user.filter(
        (F.col("n_open") != 1) | (F.col("vmax") != F.col("n")) | (F.col("vmin") != 1)
    ).count() == 0


def test_asof_visibility_and_sides(spark, sf_dir):
    """Every enriched purchase sees a non-purchase state at-or-before its
    own ts; rows with no prior state carry NULLs throughout."""
    out = q35_asof_enrich(spark, sf_dir).cache()
    try:
        ev = T(spark, sf_dir, "events")
        n_purch = ev.filter(F.col("event_type") == "purchase").count()
        assert out.count() == n_purch  # as-of never drops or duplicates facts
        assert out.filter(F.col("asof_ts") > F.col("purchase_ts")).count() == 0
        assert out.filter(F.col("asof_event_type") == "purchase").count() == 0
        # NULL columns travel together
        mixed = out.filter(
            F.col("asof_event_id").isNull() != F.col("asof_value").isNull()
        )
        assert mixed.count() == 0
        # spot-verify one row against a driver-side recompute
        row = out.filter(F.col("asof_event_id").isNotNull()).orderBy("event_id").first()
        states = (
            ev.filter(
                (F.col("user_id") == row.user_id)
                & (F.col("event_type") != "purchase")
                & (F.col("ts") <= row.purchase_ts)
            )
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .first()
        )
        assert states.event_id == row.asof_event_id
    finally:
        out.unpersist()


def test_d15_planted_cohorts_fail_their_rule(spark, sf_dir):
    out = d15_quality_rules(spark, sf_dir).cache()
    try:
        planted = out.filter(F.col("doc_id") % 25 == 0)
        assert planted.filter(F.col("dup_line_frac") <= 0.3).count() == 0
        bullets = out.filter(F.col("doc_id") % 25 == 7)
        assert bullets.filter(F.col("bullet_frac") <= 0.5).count() == 0
        organic = out.filter(~(F.col("doc_id") % 25).isin(0, 7, 13, 19))
        assert organic.filter(F.col("keep") == 0).count() == 0
        assert out.filter(
            (F.col("doc_id") % 25).isin(0, 7, 13, 19) & (F.col("keep") == 1)
        ).count() == 0
    finally:
        out.unpersist()


def test_d16_drop_paths(spark, sf_dir):
    out = d16_incremental_dedup(spark, sf_dir).cache()
    try:
        docs = T(spark, sf_dir, "documents")
        # in-batch shadows never surface (canonical min doc_id wins)
        assert out.filter(F.col("doc_id") >= D16_ID_INBATCH).count() == 0
        # every planted base copy surfaces, labeled as a cross-batch dup
        n_xbatch = docs.filter(
            (F.col("doc_id") % 5 != 4) & (F.col("doc_id") % 20 == 0)
        ).count()
        dup_rows = out.filter(F.col("status") == "dup_vs_base")
        assert dup_rows.count() == n_xbatch
        assert dup_rows.filter(F.col("doc_id") < D16_ID_XBATCH).count() == 0
        # organic incoming docs all survive as 'new'
        n_incoming = docs.filter(F.col("doc_id") % 5 == 4).count()
        assert out.filter(F.col("status") == "new").count() == n_incoming
    finally:
        out.unpersist()


def test_d17_first_occurrence_wins(spark, sf_dir):
    from citibike_pipeline_spark.operators.textops import d17_line_dedup

    out = d17_line_dedup(spark, sf_dir).cache()
    try:
        docs = T(spark, sf_dir, "documents")
        assert out.count() == docs.count()  # no doc vanishes entirely
        # doc 0 carries both boilerplate lines and is their first
        # occurrence: it keeps all 3 lines; every later carrier keeps 1
        assert out.filter(F.col("doc_id") == 0).first().n_kept == 3
        later_carriers = out.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") > 0)
        )
        assert later_carriers.filter(F.col("n_kept") != 1).count() == 0
        organic = out.filter(
            (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 15 != 0)
        )
        assert organic.filter(F.col("n_kept") != 1).count() == 0
    finally:
        out.unpersist()
