"""Declared schemas for the CDC engine (strict, no inference).

The reference declares fixed per-table schemas in Python dicts
(``citibike/ingestion/schemas.py:4-18,28-44``) and validates strictly —
missing columns error, unexpected columns error (``validation.py:22-30``).
We keep the same stance: explicit ``StructType`` per layer, FAILFAST casts,
and a reconciliation step (typed-NULL padding) as the ONLY sanctioned way a
column set may differ — the in-place analog of the legacy/current two-schema
fork (``trips.py:13-19`` + ``stg_trips_current.sql:27-37``).

Key facts:
- entity key: (conv_id, turn_idx)         ≙ unique_key='ride_id' (silver_trips.sql:3)
- change key: (conv_id, turn_idx, lsn)    — LSN is the monotone WAL offset,
  the role _ingested_at plays in the reference's LWW window (silver_stations.sql:46-54)
- LSN ties resolve by OP_RANK (higher wins): D=0 < I=1 < U=2. Documented,
  generator + oracle + engine all share this total order.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# Deterministic total order for LSN ties: update beats insert beats delete.
OP_RANK = {"D": 0, "I": 1, "U": 2}

# Entity columns (BASELINE.json:input_hint shape, verbatim).
TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

KEY_COLS = ["conv_id", "turn_idx"]


def _turn_fields(with_tool: bool) -> list[StructField]:
    fields = [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
    ]
    if with_tool:
        fields.append(StructField("tool", StringType(), True))
    fields.append(StructField("ts", TimestampNTZType(), True))
    return fields


def _event_fields(with_tool: bool) -> list[StructField]:
    return [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        *_turn_fields(with_tool),
        StructField("schema_version", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("checkpoint_epoch", IntegerType(), False),
    ]


# Bronze change-event schemas. v1 lacks `tool` (schema-evolution seam: epochs
# before the evolution epoch emit v1; the engine ALTERs bronze/silver in place
# when v2 first arrives — FIXTURES.md F2 property 6).
EVENT_SCHEMA_V1 = StructType(_event_fields(with_tool=False))
EVENT_SCHEMA_V2 = StructType(_event_fields(with_tool=True))

# Silver physical schema: latest event per key INCLUDING tombstones (op='D').
# Tombstones are retained so replay is order-independent across epochs (a
# late-arriving stale update must not resurrect a deleted turn); the logical
# silver view filters them out. `lsn` is kept for the stable
# (conv_id, turn_idx, LSN) parity ordering required by BASELINE.json.
SILVER_SCHEMA = StructType(
    [
        *_turn_fields(with_tool=True),
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("ingest_epoch", IntegerType(), True),
    ]
)

SILVER_SCHEMA_V1 = StructType(
    [
        *_turn_fields(with_tool=False),
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("ingest_epoch", IntegerType(), True),
    ]
)
