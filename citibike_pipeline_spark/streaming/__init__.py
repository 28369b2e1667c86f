"""Structured Streaming surface for the WAL tail."""

from .tail import StreamingTail

__all__ = ["StreamingTail"]
