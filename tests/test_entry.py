"""Driver-contract smoke: entry() produces rows; every queries() entry runs
at sf0.001 with a stable schema; oracle keys are consistent."""

import pytest

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(isinstance(v, str) and v.strip().upper().startswith(("SELECT", "WITH")) for v in oracles.values())


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_smoke_sf(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.columns, "query must return named columns"
    df.limit(5).collect()  # executes the plan end-to-end


def test_d07_planted_overlap_signal(spark):
    """d07 must carry real signal (r2 verdict: it passed on 1 organic row):
    the planted cohorts guarantee ≥20 pairs spanning two similarity levels."""
    from citibike_pipeline_spark.operators.textops import d07_jaccard_pairs

    pdf = d07_jaccard_pairs(spark, "/root/testdata/sf0.01").toPandas()
    assert len(pdf) >= 20
    assert (pdf.jaccard >= 0.8).sum() >= 5      # near-identical cohort
    assert ((pdf.jaccard >= 0.3) & (pdf.jaccard < 0.8)).sum() >= 5  # half-overlap
