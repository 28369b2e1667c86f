"""Query registry: every implemented operator exposed to the driver contract.

Keys map 1:1 to `__spark_entry__.queries()` / `oracle_sql()`. A None oracle
marks a genuinely non-SQL-expressible op (driver falls back to rows-only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from .relational import RELATIONAL
from .advanced import ADVANCED
from .textops import TEXTOPS, TEXTOPS_ADAPTIVE_SQL
from .embeddings import EMBEDDINGS, EMBEDDINGS_ADAPTIVE_SQL
from .multimodal import MULTIMODAL
from .flow import FLOW
from .cdcops import CDCOPS


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(fn, sql)
    for group in (RELATIONAL, ADVANCED, TEXTOPS, EMBEDDINGS, MULTIMODAL, FLOW, CDCOPS)
    for name, (fn, sql) in group.items()
}

# name -> callable({"n_docs", "n_vecs", "n_labels"}) -> oracle SQL rendered at
# the measured corpus size, for the auto-sized operators whose static oracle
# is anchored to the sf0.01 gate corpus (tools/check_gate.py --adaptive).
ADAPTIVE_SQL = {**TEXTOPS_ADAPTIVE_SQL, **EMBEDDINGS_ADAPTIVE_SQL}
