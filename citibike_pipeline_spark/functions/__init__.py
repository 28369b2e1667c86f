"""Scalar function library — the reference's Jinja "macro UDFs" and scalar
SQL surface (SURVEY.md §2.7) as native Column expressions (JVM-side,
whole-stage-codegen; never per-row Python)."""

from .scalar import (
    derive_season,
    haversine_km,
    is_bbox_outlier,
    normalize_entity_id,
    stable_md5_key,
    guarded_div,
)
from .text import (
    normalize_text_udf,
    token_count,
    ngrams,
    rolling_fingerprint,
)

__all__ = [
    "derive_season",
    "haversine_km",
    "is_bbox_outlier",
    "normalize_entity_id",
    "stable_md5_key",
    "guarded_div",
    "normalize_text_udf",
    "token_count",
    "ngrams",
    "rolling_fingerprint",
]
