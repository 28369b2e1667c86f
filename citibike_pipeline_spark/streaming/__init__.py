"""Structured Streaming surface for the WAL tail."""

from .tail import StreamingTail
from .stateful import StreamingConvProgress

__all__ = ["StreamingTail", "StreamingConvProgress"]
