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
from .textops import TEXTOPS
from .embeddings import EMBEDDINGS
from .multimodal import MULTIMODAL
from .flow import FLOW


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(fn, sql)
    for group in (RELATIONAL, ADVANCED, TEXTOPS, EMBEDDINGS, MULTIMODAL, FLOW)
    for name, (fn, sql) in group.items()
}
