"""Lake table layer: snapshot-committed, bucket-partitioned parquet tables.

Implements the Iceberg semantics the engine needs — atomic snapshot commits,
copy-on-write MERGE at partition granularity, in-place schema evolution,
snapshot history — as a thin manifest format over parquet. The primary design
(SURVEY.md §7.0) is Iceberg's ``MERGE INTO``; this fallback reproduces it
because no Iceberg runtime jar is reachable in the sandbox. The public API
(`LakeCatalog`, `LakeTable`, `merge_into`) is what the rest of the engine
programs against, so swapping in Iceberg later is a catalog-level change only.

Reference analog: the raw-table + ``_staging`` twin + delete/insert protocol
(``citibike/database/staging.py:15-73``, ``create_tables.py:11``) — made
atomic (one snapshot pointer swap) instead of two non-atomic DML statements.
"""

from . import fs
from .catalog import LakeCatalog
from .table import LakeTable
from .merge import merge_into, replace_groups

__all__ = ["LakeCatalog", "LakeTable", "merge_into", "replace_groups", "fs"]
