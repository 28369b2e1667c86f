"""Product quantization (e11/e12). The DuckDB oracles prove cross-engine
determinism; these prove the construction is PQ:

1. a numpy reimplementation of the per-block Lloyd recipe reproduces the
   fitted codebooks on the real sf0.001 corpus;
2. ADC distance approximates the true L2²: for every scored pair, the ADC
   estimate equals the true distance of the QUANTIZED vector (sum of
   per-block distances to the assigned centroids) — exactly, not just
   approximately — and correlates with the true vector distance well
   enough that the mean relative error is bounded;
3. structural invariants: M x ksub codebook rows, per-block counts sum to
   n, exactly TOP_K ranked rows per query with contiguous ranks.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from citibike_pipeline_spark.operators.embeddings import (
    N_QUERY,
    PQ_ITERS,
    PQ_M,
    PQ_SUB,
    TOP_K,
    _pq_fit,
    e11_pq_codebooks,
    e12_pq_adc_topk,
)
from citibike_pipeline_spark.operators.io import T
from citibike_pipeline_spark.operators.sizing import auto_pq_ksub


def _corpus(spark, sf_dir) -> np.ndarray:
    rows = (
        T(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r.embedding for r in rows], dtype=np.float64)


def _numpy_pq(vecs: np.ndarray, ksub: int, iters: int):
    """Independent per-block Lloyd: same seeds/update/tiebreak as _pq_fit."""
    n = len(vecs)
    stride = max(n // ksub, 1)
    books = {}
    for b in range(PQ_M):
        sub = vecs[:, b * PQ_SUB : (b + 1) * PQ_SUB]
        cents = np.round(sub[[j * stride for j in range(ksub)]], 6)
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for cid in range(ksub):
                members = sub[assign == cid]
                if len(members):
                    cents[cid] = np.round(members.mean(axis=0), 6)
        books[b] = cents
    return books


def test_pq_fit_matches_numpy(spark, sf_dir):
    vecs = _corpus(spark, sf_dir)
    ksub = auto_pq_ksub(len(vecs))
    fitted = _pq_fit(spark, sf_dir, ksub, PQ_ITERS)
    books = _numpy_pq(vecs, ksub, PQ_ITERS)
    for (b, cid), c in fitted.items():
        np.testing.assert_allclose(
            np.array(c), books[b][cid], atol=1e-5,
            err_msg=f"block {b} code {cid}",
        )


def test_e11_structure(spark, sf_dir):
    out = e11_pq_codebooks(spark, sf_dir).cache()
    try:
        n = T(spark, sf_dir, "embeddings").count()
        ksub = auto_pq_ksub(n)
        assert out.count() == PQ_M * ksub
        sums = out.groupBy("block").agg(F.sum("n_vecs").alias("s"))
        assert sums.filter(F.col("s") != n).count() == 0
    finally:
        out.unpersist()


def test_e12_adc_equals_quantized_distance(spark, sf_dir):
    """ADC is EXACT on the quantized representation: recompute each scored
    pair's distance from the fitted codebooks + codes in numpy and match."""
    vecs = _corpus(spark, sf_dir)
    ksub = auto_pq_ksub(len(vecs))
    fitted = _pq_fit(spark, sf_dir, ksub, PQ_ITERS)
    out = e12_pq_adc_topk(spark, sf_dir).collect()
    assert len(out) == N_QUERY * TOP_K
    for q in range(N_QUERY):
        ranks = sorted(r.rank for r in out if r.query_id == q)
        assert ranks == list(range(1, TOP_K + 1))
    books = {b: np.array([fitted[(b, c)] for c in range(ksub)]) for b in range(PQ_M)}
    rel_errs = []
    for r in out:
        adc = 0.0
        true = 0.0
        for b in range(PQ_M):
            qsub = vecs[r.query_id, b * PQ_SUB : (b + 1) * PQ_SUB]
            nsub = vecs[r.neighbor_id, b * PQ_SUB : (b + 1) * PQ_SUB]
            d = ((nsub[None, :] - books[b]) ** 2).sum(axis=1)
            code = int(d.argmin())
            adc += round(float(((qsub - books[b][code]) ** 2).sum()), 6)
            true += float(((qsub - nsub) ** 2).sum())
        assert abs(adc - r.adc_dist) < 1e-4, (r, adc)
        if true > 0:
            rel_errs.append(abs(adc - true) / true)
    # sanity rail, deliberately loose: the gate corpus is STRUCTURELESS
    # random data — the worst case for vector quantization (observed mean
    # relative error ~0.52 at ksub=8; real clustered embeddings sit far
    # lower). The rail only guards against ADC degenerating to noise
    # (errors ~1 would mean the estimate carries no distance signal).
    assert np.mean(rel_errs) < 0.85, np.mean(rel_errs)


# -- e13 IVF-PQ on a corpus WITH cluster structure -------------------------
# (the test_kmeans blob fixture, duplicated: module-scoped fixtures don't
# cross test modules without promotion to conftest)

N_BLOB_VECS = 2000
N_BLOBS = 20


@pytest.fixture(scope="module")
def blob_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pq_blobs")
    blob = F.col("id") % N_BLOBS

    def comp(k, scale, basis):
        v = F.sin((basis * 64 + k.cast("long")) * 12.9898) * 43758.5453
        return (v - F.floor(v) - F.lit(0.5)) * scale

    vecs = spark.range(N_BLOB_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda k: (
                comp(k, F.lit(1.0), blob) + comp(k, F.lit(0.05), F.col("id") + 7919)
            ).cast("float"),
        ).alias("embedding"),
        blob.cast("int").alias("label"),
    )
    vecs.write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_e13_ivf_pq_stays_in_blob(spark, blob_dir):
    """On well-separated blobs, every IVF-PQ top-k neighbor must come from
    the query's own blob: the coarse probe has to find the right lists and
    residual-ADC must not rank a cross-blob vector (distance ~ the center
    separation) above in-blob vectors (distance ~ the noise scale). This is
    the composition-level correctness PQ quantization noise cannot break —
    unlike within-blob ORDERING, which quantization legitimately blurs."""
    from citibike_pipeline_spark.operators.embeddings import e13_ivf_pq_topk
    from citibike_pipeline_spark.operators.resources import release_query_resources

    out = e13_ivf_pq_topk(spark, blob_dir).collect()
    release_query_resources(spark)
    assert len(out) == N_QUERY * TOP_K
    for r in out:
        assert r.neighbor_id % N_BLOBS == r.query_id % N_BLOBS, r
        assert r.adc_dist >= 0.0
    for q in range(N_QUERY):
        ranks = sorted(r.rank for r in out if r.query_id == q)
        assert ranks == list(range(1, TOP_K + 1))


def test_pq_fit_is_kmeans_fit_on_one_block(spark, sf_dir):
    """_kmeans_fit (e09/e10) and _pq_fit (e11-e13) implement the SAME
    deterministic Lloyd recipe — seeds, decimal update, empty-cluster
    keep, (dist, cid) tiebreak. They are separate implementations (the
    e09 path is codegen-tuned for full-width vectors); this pins them
    together: trained on the identical input (the full vector as one
    block), every centroid must match EXACTLY — a recipe change applied
    to one but not the other fails here before it can split the oracles."""
    from citibike_pipeline_spark.operators.embeddings import (
        KMEANS_ITERS,
        _kmeans_fit,
    )
    from citibike_pipeline_spark.operators.io import T as _T

    k = 7
    full = _T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.lit(0).alias("block"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    pq = _pq_fit(spark, sf_dir, k, KMEANS_ITERS, blocks=full, tag="equiv")
    km = _kmeans_fit(spark, sf_dir, k, KMEANS_ITERS)
    assert set(pq) == {(0, cid) for cid in km}
    for cid, c in km.items():
        assert pq[(0, cid)] == c, cid
