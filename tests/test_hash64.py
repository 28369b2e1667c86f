"""64-bit hash source for SimHash / embedding LSH (r4 verdict #4).

The md5-nibble bit source covers 32 bits; corpora past ~2^33 docs need wider
buckets, so ``d06_simhash`` switches to ``F.xxhash64`` when the (auto-sized
or explicit) width exceeds 32, and ``auto_lsh_planes`` now scales to 62
hyperplanes. DuckDB has no xxhash64, so the 64-bit path cannot ride the
driver's hash gate — these tests are its verification instead:

1. a pure-Python xxhash64 (seed 42, the Spark default) pinned against
   ``F.xxhash64`` across every tail-length class (0..100 bytes, unicode) —
   the bit source is exactly the public XXH64 spec;
2. full-pipeline equivalence on a fixture: the Spark d06 output at 40 bits
   equals an independent Python reimplementation (tokenize → xxh64 → per-bit
   majority → bucket id) of the same definition;
3. scale behavior on a >10^5-doc deterministic synthetic corpus at 64-bit
   width: planted duplicate groups collide, occupancy stays bounded,
   output is deterministic;
4. embedding LSH at 40 hyperplanes on >10^5 synthetic vectors: planted
   copies share a bucket and occupancy stays bounded.

The corpora are generated JVM-side (no testdata writes) into tmp parquet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citibike_pipeline_spark.operators.embeddings import e02_lsh_buckets
from citibike_pipeline_spark.operators.resources import release_query_resources
from citibike_pipeline_spark.operators.textops import d06_simhash

# --------------------------------------------------------------------------
# Pure-Python XXH64 (public spec, seed 42 = Spark's default)
# --------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc, inp):
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge(acc, val):
    return (((acc ^ _round(0, val)) * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M
        v3, v4 = seed & _M, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1); h = _merge(h, v2); h = _merge(h, v3); h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def test_python_xxh64_matches_spark(spark):
    """The bit source IS the public XXH64 spec: pin F.xxhash64 against an
    independent implementation across all tail-length classes."""
    strs = ["", "a", "ab", "abc", "abcd", "abcde", "hello world", "w12345",
            "x" * 7, "y" * 8, "z" * 9, "t" * 15, "u" * 16, "v" * 31,
            "q" * 32, "r" * 33, "s" * 40, "unicode-éü漢字", "tok|123",
            "m" * 100]
    rows = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in rows:
        assert _signed64(xxh64(r.s.encode("utf-8"))) == r.h, repr(r.s)


# --------------------------------------------------------------------------
# Full-pipeline fixture equivalence at 40 bits
# --------------------------------------------------------------------------

def _py_simhash(text: str, bits: int) -> int:
    """Independent reimplementation of d06's 64-bit definition."""
    sums = [0] * bits
    for tok in text.split(" "):
        h = xxh64(tok.encode("utf-8"))
        for j in range(bits):
            sums[j] += 1 if (h >> j) & 1 else -1
    return _signed64(
        sum(1 << j for j in range(bits) if sums[j] > 0)
    )


def test_d06_64bit_pipeline_matches_reimplementation(spark, tmp_path):
    bits = 40
    texts = [
        " ".join(f"a{(i * 13 + k) % 37}" for k in range(8)) for i in range(199)
    ] + [""]  # empty text splits to one "" token — must not be dropped
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    got = {
        r.simhash: (r.n_docs, r.min_doc_id)
        for r in d06_simhash(spark, str(tmp_path), bits=bits).collect()
    }
    release_query_resources(spark)

    want: dict[int, list[int]] = {}
    for i, t in enumerate(texts):
        want.setdefault(_py_simhash(t, bits), []).append(i)
    assert got == {h: (len(ids), min(ids)) for h, ids in want.items()}
    # the empty doc is present: its bucket is the bit pattern of xxh64("")
    assert sum(n for n, _ in got.values()) == len(texts)


# --------------------------------------------------------------------------
# >10^5-doc synthetic corpus at full 64-bit width
# --------------------------------------------------------------------------

N_DOCS = 120_000
DUP_STRIDE = 997            # every 997th doc duplicates doc 0's text
N_DUPS = (N_DOCS - 1) // DUP_STRIDE + 1  # 121


@pytest.fixture(scope="module")
def big_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hash64_docs")
    base = F.when(F.col("id") % DUP_STRIDE == 0, F.lit(0)).otherwise(F.col("id"))
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda k: F.concat(
                    F.lit("w"),
                    ((base * 104729 + k.cast("long") * 31) % 1000003).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    docs.write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_d06_64bit_collisions_occupancy_determinism(spark, big_docs_dir):
    out = d06_simhash(spark, big_docs_dir, bits=64).collect()
    release_query_resources(spark)
    by_bucket = {r.simhash: (r.n_docs, r.min_doc_id) for r in out}
    total = sum(n for n, _ in by_bucket.values())
    assert total == N_DOCS  # nothing dropped
    # the planted duplicate group (identical text => identical simhash)
    # lands in ONE bucket anchored at doc 0
    dup_buckets = [h for h, (_, mn) in by_bucket.items() if mn == 0]
    assert len(dup_buckets) == 1
    assert by_bucket[dup_buckets[0]][0] == N_DUPS
    # occupancy bound: at 64-bit width the expected random collision count
    # is ~n^2/2^64 ≈ 0 — every non-planted bucket stays tiny (simhash is
    # similarity-preserving, so allow a few near-identical token sets)
    second = sorted((n for n, _ in by_bucket.values()), reverse=True)[1]
    assert second <= 4, f"unexpected 64-bit bucket occupancy {second}"
    # determinism: an independent second run reproduces the exact result
    again = {
        r.simhash: (r.n_docs, r.min_doc_id)
        for r in d06_simhash(spark, big_docs_dir, bits=64).collect()
    }
    release_query_resources(spark)
    assert again == by_bucket


# --------------------------------------------------------------------------
# Embedding LSH at 40 hyperplanes on >10^5 vectors
# --------------------------------------------------------------------------

N_VECS = 120_000
COPY_STRIDE = 10_000        # every 10000th vector copies vector 0
N_COPIES = (N_VECS - 1) // COPY_STRIDE + 1  # 12


@pytest.fixture(scope="module")
def big_vecs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hash64_vecs")
    base = F.when(F.col("id") % COPY_STRIDE == 0, F.lit(0)).otherwise(F.col("id"))
    # components must be iid-ish across dims — a plain sin(base*64+k) ramp
    # collapses every vector into the 2-D subspace span(sin(k), cos(k)) and
    # LSH legitimately produces huge buckets. frac(sin(x*12.9898)*43758.5453)
    # (the classic shader hash) gives pseudo-random uniform(-0.5, 0.5) per
    # (vector, dim) — genuinely high-dimensional, still deterministic.
    def comp(k):
        v = F.sin((base * 64 + k.cast("long")) * 12.9898) * 43758.5453
        return (v - F.floor(v) - 0.5).cast("float")

    vecs = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)), comp).alias("embedding"),
    )
    vecs.write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_e02_40planes_collisions_and_occupancy(spark, big_vecs_dir):
    out = e02_lsh_buckets(spark, big_vecs_dir, n_planes=40).collect()
    release_query_resources(spark)
    total = sum(r.n_vecs for r in out)
    assert total == N_VECS
    # planted identical vectors share one bucket anchored at vec 0
    anchored = [r for r in out if r.min_vec_id == 0]
    assert len(anchored) == 1
    assert anchored[0].n_vecs >= N_COPIES
    # 40 sign bits shatter 1.2e5 near-orthogonal vectors: max occupancy is
    # the planted group plus at most a handful of sign-pattern collisions
    assert max(r.n_vecs for r in out) <= N_COPIES + 8
    # bucket ids genuinely use the >32-bit range
    assert max(r.bucket for r in out) > (1 << 32)
