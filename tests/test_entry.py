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
