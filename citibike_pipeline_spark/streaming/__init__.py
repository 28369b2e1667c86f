"""Structured Streaming surface for the WAL tail."""

from .tail import StreamingTail
from .stateful import StreamingConvProgress
from .scd2 import StreamingScd2
from .sessions import StreamingSessions
from .joins import StreamingTombstoneJoin

__all__ = [
    "StreamingTail",
    "StreamingConvProgress",
    "StreamingScd2",
    "StreamingSessions",
    "StreamingTombstoneJoin",
]
