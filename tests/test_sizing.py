"""Corpus-proportional knob auto-sizing (r3 verdict #5).

Three properties: (1) the formulas reproduce the round-1..3 constants at the
gate corpus EXACTLY — this is what keeps the static DuckDB oracles
hash-green at sf0.01, so these pins are load-bearing; (2) the same code
picks wider structures at sf0.1 (5000 docs / 2000 vectors) and the widths
are visible in the executed plans, not just in the formulas; (3) bucket
occupancy stays bounded at both scales, and the auto width beats the anchor
width where the corpus outgrew it.
"""

import pyspark.sql.functions as F
import pytest

from citibike_pipeline_spark.operators.embeddings import (
    N_PLANES,
    NPROBE,
    e02_lsh_buckets,
)
from citibike_pipeline_spark.operators.resources import release_query_resources
from citibike_pipeline_spark.operators.sizing import (
    GATE_N_DOCS,
    GATE_N_LABELS,
    GATE_N_VECS,
    auto_lsh_planes,
    auto_minhash_bands,
    auto_nprobe,
    auto_simhash_bits,
)
from citibike_pipeline_spark.operators.textops import (
    MINHASH_B,
    MINHASH_R,
    SIMHASH_BITS,
    d06_simhash,
)

SF_SMALL = "/root/testdata/sf0.001"   # 500 docs / 500 vecs (gate-sized)
SF_BIG = "/root/testdata/sf0.1"       # 5000 docs / 2000 vecs


def test_gate_corpus_anchors_are_pinned():
    """Formula drift that changes the gate-corpus resolution would silently
    hash-break the static oracles at the driver — pin the literals."""
    assert auto_minhash_bands(GATE_N_DOCS) == (4, 2) == (MINHASH_B, MINHASH_R)
    assert auto_simhash_bits(GATE_N_DOCS) == 8 == SIMHASH_BITS
    assert auto_lsh_planes(GATE_N_VECS) == 8 == N_PLANES
    assert auto_nprobe(GATE_N_LABELS) == 3 == NPROBE


def test_widths_scale_with_corpus():
    assert auto_minhash_bands(5_000) == (8, 3)       # sharper S-curve knee
    assert auto_simhash_bits(5_000) == 12
    assert auto_lsh_planes(2_000) == 10
    # monotone at the far end; >32 simhash bits select the xxhash64 bit
    # source (the md5-nibble source covers only 32 — see textops.d06)
    assert auto_minhash_bands(10_000_000_000) == (32, 8)
    assert auto_simhash_bits(10_000_000_000) == 33
    assert auto_lsh_planes(10_000_000_000) == 33
    assert auto_simhash_bits(2 ** 70) == 64          # formula ceiling
    assert auto_lsh_planes(2 ** 70) == 62            # positive-BIGINT cap
    assert auto_nprobe(300) == 100


def test_auto_width_active_in_executed_plan(spark):
    """The wider structures must show up in the actual results at sf0.1:
    values above 2^8 prove the plan was built with >8 bits/planes."""
    max_sim = d06_simhash(spark, SF_BIG).agg(F.max("simhash")).collect()[0][0]
    assert max_sim > 255, "simhash width did not widen beyond the 8-bit anchor"
    max_bucket = e02_lsh_buckets(spark, SF_BIG).agg(F.max("bucket")).collect()[0][0]
    assert max_bucket > 255, "LSH plane count did not widen beyond the anchor"
    release_query_resources(spark)


@pytest.mark.parametrize("sf,n_docs,n_vecs", [(SF_SMALL, 500, 500), (SF_BIG, 5000, 2000)])
def test_occupancy_bounded_at_both_scales(spark, sf, n_docs, n_vecs):
    """Max bucket size stays a bounded fraction of the corpus at BOTH scales
    (the synthetic corpus is near-dup-heavy, so buckets legitimately carry
    duplicate clusters — the bound is about the quadratic candidate work
    staying sane, not about perfect uniformity)."""
    d6 = d06_simhash(spark, sf).agg(F.max("n_docs")).collect()[0][0]
    assert d6 <= 0.20 * n_docs, f"simhash max occupancy {d6} of {n_docs}"
    e2 = e02_lsh_buckets(spark, sf).agg(F.max("n_vecs")).collect()[0][0]
    assert e2 <= 0.16 * n_vecs, f"LSH max occupancy {e2} of {n_vecs}"
    release_query_resources(spark)


def test_auto_width_beats_anchor_width_when_corpus_outgrows_it(spark):
    """At sf0.1 the auto width must strictly reduce max occupancy vs forcing
    the gate anchors (measured 815->551 simhash, 265->188 LSH)."""
    auto_occ = d06_simhash(spark, SF_BIG).agg(F.max("n_docs")).collect()[0][0]
    anchor_occ = (
        d06_simhash(spark, SF_BIG, bits=8).agg(F.max("n_docs")).collect()[0][0]
    )
    assert auto_occ < anchor_occ
    auto_e = e02_lsh_buckets(spark, SF_BIG).agg(F.max("n_vecs")).collect()[0][0]
    anchor_e = (
        e02_lsh_buckets(spark, SF_BIG, n_planes=8)
        .agg(F.max("n_vecs"))
        .collect()[0][0]
    )
    assert auto_e < anchor_e
    release_query_resources(spark)
