"""Independent (non-Spark) oracle for final-state parity (FIXTURES.md F4).

Pure pandas: sort all events by the documented total order (lsn, OP_RANK),
take the last event per (conv_id, turn_idx), drop keys whose final op is 'D'.
The engine's silver view must equal this bit-for-bit under stable
(conv_id, turn_idx, lsn) ordering — the BASELINE.json north-star criterion.
"""

from __future__ import annotations

import pandas as pd

from .schemas import OP_RANK, TURN_COLUMNS


def expected_silver(events: pd.DataFrame) -> pd.DataFrame:
    """events: all epochs concatenated (superset schema, tool present)."""
    df = events.copy()
    df["_op_rank"] = df["op"].map(OP_RANK)
    df = df.sort_values(["lsn", "_op_rank"], kind="mergesort")
    last = df.groupby(["conv_id", "turn_idx"], as_index=False, sort=False).tail(1)
    alive = last[last["op"] != "D"]
    out = alive[TURN_COLUMNS + ["lsn"]].sort_values(
        ["conv_id", "turn_idx", "lsn"], kind="mergesort"
    )
    return out.reset_index(drop=True)


def expected_conv_stats(silver: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation aggregates (≙ stg_combined_trip_metrics.sql:5-32)."""
    g = silver.groupby("conv_id")
    out = pd.DataFrame(
        {
            "n_turns": g.size(),
            "n_tool_turns": g["tool"].count(),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()
    out["duration_sec"] = (
        (out["last_ts"] - out["first_ts"]).dt.total_seconds().astype("int64")
    )
    return out.sort_values("conv_id").reset_index(drop=True)
