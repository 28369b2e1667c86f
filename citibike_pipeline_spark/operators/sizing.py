"""Corpus-proportional auto-sizing of the dedup/ANN knobs (r3 verdict #5).

Round 1-3 hard-coded MinHash bands, SimHash width, and hyperplane count to
values tuned for the sf0.01 gate corpus; running the same code at 100 TB
meant hand-editing constants. These formulas derive each knob from the
corpus size the operator is actually looking at (one count per invocation —
a metadata-cheap aggregate; at warehouse scale it comes from table stats /
snapshot manifests instead of a scan). Every operator still takes the knob
as an explicit override.

ORACLE ANCHORING — the part that makes auto-sizing compatible with the
correctness gate: the DuckDB oracle SQL strings are generated at import time
and therefore cannot adapt to corpus size, and the driver gates at sf0.01.
Each formula is anchored to reproduce the round-1..3 constants EXACTLY at
the gate corpus (500 documents, 500 embeddings, 10 labels), so the static
oracles stay hash-green there, while any other corpus size resolves to
scale-appropriate widths. ``tests/test_sizing.py`` pins the anchors so a
formula change that would silently break the gate fails fast.

Sizing rationale per knob:

- MinHash (b bands × r rows): keep the S-curve knee ``(1/b)^(1/r)`` at the
  dedup threshold while sharpening it (raising r) as the corpus grows —
  more docs ⇒ more random pairs under the knee ⇒ a shallow curve drowns the
  LSH buckets in false candidates. b follows as ``(1/t)^r`` so the knee
  stays put. (Leskovec/Rajaraman/Ullman, MMDS ch.3.)
- SimHash width / LSH hyperplanes: ~log2(n) sign bits keeps EXPECTED bucket
  occupancy (n / 2^bits) constant as n grows, which is exactly what bounds
  the quadratic within-bucket candidate work. SimHash widths ≤32 draw bit j
  from md5 hex nibble j+1 (DuckDB-oracle parity at gate widths); widths >32
  switch the bit source to xxhash64 automatically (textops.d06) — the
  formula's 64-bit ceiling, reached around 2^65 docs, i.e. never. LSH
  hyperplane count is capped at 62 so the bucket id Σ 2^p stays an exact
  positive BIGINT (no sign-bit wrap) in both engines.
- IVF nprobe: a constant fraction (~1/3) of the inverted lists, the
  standard recall/cost dial; nlists itself equals the label cardinality by
  construction (the coarse quantizer is the label assignment — at true
  scale a k-means quantizer raises nlists and the probe fraction carries).
"""

from __future__ import annotations

import math

# The driver's gate corpus (sf0.01): the anchor the formulas must reproduce.
GATE_N_DOCS = 500
GATE_N_VECS = 500
GATE_N_LABELS = 10


def auto_minhash_bands(n_docs: int, threshold: float = 0.5) -> tuple[int, int]:
    """(b, r) with the S-curve knee pinned at ``threshold``.
    500 -> (4, 2) [anchor]; 5_000 -> (8, 3); 10^10 -> (32, 8)."""
    r = min(8, max(2, round(math.log10(max(n_docs, 10))) - 1))
    b = min(32, round((1.0 / threshold) ** r))
    return b, r


def auto_simhash_bits(n_docs: int) -> int:
    """~log2(n) bits for constant expected bucket occupancy. 500 -> 8
    [anchor]; 5_000 -> 12; 10^10 -> 33 (>32 selects the xxhash64 bit source
    in textops.d06 — the md5-nibble source only covers 32 bits)."""
    return min(64, max(8, math.ceil(math.log2(max(n_docs, 2))) - 1))


def auto_lsh_planes(n_vecs: int) -> int:
    """Random-hyperplane count for the embedding LSH: expected occupancy
    n / 2^planes stays a small constant. 500 -> 8 [anchor]; 2_000 -> 10;
    10^10 -> 33. Cap 62 keeps Σ 2^p an exact positive BIGINT bucket id."""
    return min(62, max(4, math.ceil(math.log2(max(n_vecs, 2))) - 1))


def auto_nprobe(n_lists: int) -> int:
    """Probe ~1/3 of the inverted lists. 10 -> 3 [anchor]."""
    return max(1, round(n_lists / 3))


def auto_kmeans_k(n_vecs: int) -> int:
    """Coarse-quantizer list count for the label-free IVF (e09/e10):
    k ~ sqrt(n), the standard nlists heuristic — per-list scan cost and
    list-ranking cost balance at sqrt. 500 -> 22; 10^10 -> 4096 (cap: the
    centroid table stays driver-collectable at k*d doubles)."""
    return min(4096, max(2, round(math.sqrt(max(n_vecs, 4)))))


def auto_pq_ksub(n_vecs: int) -> int:
    """Per-block PQ codebook size (e11/e12): ~n^(1/3), floored at 8 (the
    gate anchor) and capped at 256 (the FAISS production norm — one byte
    per block code). 500 -> 8 [anchor]; 5_000 -> 17; 10^10 -> 256."""
    return min(256, max(8, round(n_vecs ** (1.0 / 3.0))))
