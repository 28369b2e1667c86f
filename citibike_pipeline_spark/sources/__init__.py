"""Sources: bronze WAL log, file scans, small-dimension ingestion."""

from .bronze import BronzeLog
from .dims import tool_catalog

__all__ = ["BronzeLog", "tool_catalog"]
