"""Text functions for the transcript payload + training-data pipeline ops.

The reference's text surface is id/name normalization (LOWER(TRIM(...)),
stg_trips_legacy.sql:93,99); transcripts add real text analytics. Everything
row-parallel stays in built-in functions; the one genuinely-Python step
(unicode normalization) is a vectorized pandas UDF over Arrow batches
(BASELINE.json:input_hint — no per-row Python).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Whitespace + BPE-ish token splitting: unicode words, numbers, or single
# non-space symbols — a deterministic stand-in for a real tokenizer.
# (\p{L} is Java-regex unicode-letter — this constant is for JVM-side
# regexp_extract_all, not Python re.)
TOKEN_REGEX = r"\p{L}+|[0-9]+|[^\s\p{L}0-9]"


# returnType passed as a DataType instance (not DDL string) so the decorator
# works at import time without an active SparkSession.
@pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    """NFC-normalize + strip — vectorized over Arrow batches.

    The transcript analog of the reference's per-batch pandas cleaning
    (validation.py:33-47), kept deliberately cheap: normalization must be a
    pure function so replay parity holds.
    """
    return s.map(
        lambda x: unicodedata.normalize("NFC", x).strip() if x is not None else None
    )


def token_count(col: Column | str) -> Column:
    """Token count via regexp extraction — JVM-side, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_REGEX), F.lit(0))


def ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles of the lowercased text (array<string>).

    Built from built-ins: sequence + transform + substring — stays in codegen.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(c, i, n))


def rolling_fingerprint(col: Column | str, n: int = 8) -> Column:
    """Document fingerprint: min xxhash64 over rolling n-gram shingles
    (winnowing-style single-band); equal fingerprints => likely near-dups."""
    return F.array_min(
        F.transform(ngrams(col, n), lambda g: F.xxhash64(g))
    )
