"""Operator inventory re-expressed over the driver's testdata tables.

Every operator family in SURVEY.md §2 has at least one registered query here,
each paired with an ANSI-SQL oracle (DuckDB) that must hash-match at sf=0.01.
Training-data-pipeline ops (dedup, similarity search, text analysis,
multimodal plumbing) are first-class entries alongside the relational core.
"""

from .registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
