"""Declarative query plans: gold-layer builds over silver (SURVEY.md §7.2 M5)."""

from .gold import (
    gold_conv_stats,
    gold_running_turns,
    gold_quality_flags,
    gold_dim_dates,
    gold_tool_usage,
    gold_top_conversations,
    build_gold,
    refresh_gold,
    update_gold,
    gold_checkpoint,
)

__all__ = [
    "gold_conv_stats",
    "gold_running_turns",
    "gold_quality_flags",
    "gold_dim_dates",
    "gold_tool_usage",
    "gold_top_conversations",
    "build_gold",
    "refresh_gold",
    "update_gold",
    "gold_checkpoint",
]
