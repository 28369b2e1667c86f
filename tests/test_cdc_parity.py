"""Golden final-state parity: full CDC replay vs the independent pandas oracle.

The BASELINE.json north-star criterion: after replaying every epoch —
duplicate LSNs, out-of-order arrival, deletes/reinserts, LSN ties, schema
evolution mid-stream, hot-conversation skew — the engine's silver view equals
the oracle bit-for-bit under stable (conv_id, turn_idx, lsn) ordering.
"""

import pandas as pd
import pytest

from citibike_pipeline_spark.cdc import CdcEngine
from citibike_pipeline_spark.cdc.generator import GenConfig, generate_corpus_pandas, generate_epoch
from citibike_pipeline_spark.cdc.oracle import expected_silver
from citibike_pipeline_spark.cdc.schemas import TURN_COLUMNS

CFG = GenConfig(
    n_convs=60,
    n_epochs=6,
    events_per_epoch=2500,
    seed=42,
    evolution_epoch=3,
    n_hot=2,
    turns_hot=400,
    turns_normal=40,
)


@pytest.fixture(scope="module")
def replayed_engine(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_parity"))
    eng = CdcEngine(spark, wh, n_buckets=8, write_salt=2, hot_key_threshold=500)
    eng.init_tables()
    for e in range(CFG.n_epochs):
        eng.ingest_epoch_pandas(generate_epoch(CFG, e), e)
    eng.replay()
    return eng


def silver_pdf(eng) -> pd.DataFrame:
    out = (
        eng.silver_view()
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "lsn"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out[TURN_COLUMNS + ["lsn"]]


def test_final_state_parity(replayed_engine):
    got = silver_pdf(replayed_engine)
    want = expected_silver(generate_corpus_pandas(CFG))
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_per_turn_text_bit_for_bit(replayed_engine):
    got = silver_pdf(replayed_engine)
    want = expected_silver(generate_corpus_pandas(CFG))
    assert got["text"].tolist() == want["text"].tolist()


def test_checkpoint_advanced(replayed_engine):
    assert replayed_engine.checkpoint()["last_epoch"] == CFG.n_epochs - 1


def test_lineage_manifests_cover_all_epoch_partitions(replayed_engine):
    rows = replayed_engine.lineage()
    seen = {(r["checkpoint_epoch"], r["partition_id"]) for r in rows}
    # every (epoch, partition) that produced events must have a manifest
    for e in range(CFG.n_epochs):
        parts = set(generate_epoch(CFG, e)["partition_id"].unique())
        for p in parts:
            assert (e, int(p)) in seen
    # manifests carry real lineage stats
    assert all(r["n_events"] > 0 and r["min_lsn"] <= r["max_lsn"] for r in rows)


def test_schema_evolved_in_place(replayed_engine):
    cols = [f.name for f in replayed_engine.silver.schema().fields]
    assert "tool" in cols
    # v1-era rows surface typed NULL tool, v2 rows carry values
    pdf = silver_pdf(replayed_engine)
    assert pdf["tool"].notna().any()


def test_replay_is_idempotent(replayed_engine):
    before = silver_pdf(replayed_engine)
    snap_before = replayed_engine.silver.current_snapshot().snapshot_id
    # re-apply every epoch directly (bypassing the checkpoint fast path)
    for e in range(CFG.n_epochs):
        replayed_engine.apply_epoch(e)
    after = silver_pdf(replayed_engine)
    # manifests short-circuit: no new snapshot, identical state
    assert replayed_engine.silver.current_snapshot().snapshot_id == snap_before
    pd.testing.assert_frame_equal(before, after)
