"""Crash-atomicity and snapshot-isolation at the table commit boundary.

The exactly-once story rests on one primitive: a commit is the atomic
VERSION pointer swap, and everything before it (data files, snapshot
manifest) is invisible garbage until the swap lands. These tests
fault-inject that exact boundary — the failure the reference's
DELETE+INSERT pair cannot survive (``staging.py:55-71``) — and pin the
snapshot-isolation property a mutating lake must give concurrent readers.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from citibike_pipeline_spark.lake import LakeCatalog, merge_into
from citibike_pipeline_spark.lake import fs

SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("v", StringType(), True),
        StructField("op", StringType(), False),
        StructField("lsn", LongType(), False),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "wh"))


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(t):
    return {(r.k, r.v) for r in t.read().collect()}


def test_crash_before_pointer_swap_leaves_table_unchanged(spark, cat, monkeypatch):
    """Kill the commit between manifest write and VERSION swap: the table
    must still serve the OLD snapshot exactly, and a retried merge must
    land the change once — no loss, no double-apply."""
    t = cat.create_table("ns.crash1", SCHEMA, key_cols=["k"], n_buckets=4)
    t.append(mk(spark, [("a", "v1", "I", 1), ("b", "v1", "I", 2)]))
    before = _rows(t)
    before_snap = t.current_snapshot().snapshot_id

    real_replace = fs.replace_text
    calls = {"n": 0}

    def dying_replace(path, text):
        if path.endswith("VERSION"):
            calls["n"] += 1
            raise OSError("injected crash before pointer swap")
        return real_replace(path, text)

    monkeypatch.setattr(fs, "replace_text", dying_replace)
    with pytest.raises(OSError, match="injected crash"):
        merge_into(t, mk(spark, [("a", "v2", "U", 10)]))
    assert calls["n"] == 1
    monkeypatch.setattr(fs, "replace_text", real_replace)

    # old snapshot intact: same pointer, same rows — the orphan data files
    # and manifest the dead merge left behind are invisible
    assert t.current_snapshot().snapshot_id == before_snap
    assert _rows(t) == before

    # retry applies exactly once
    merge_into(t, mk(spark, [("a", "v2", "U", 10)]))
    assert _rows(t) == {("a", "v2"), ("b", "v1")}


def test_crash_mid_compact_preserves_mor_parity(spark, tmp_path, monkeypatch):
    """A crash inside the MOR delta-fold (compact) must lose nothing: the
    next resolve reads the same base ∪ deltas, and a retried compact
    converges to the identical collapsed state."""
    import pandas as pd

    from citibike_pipeline_spark.cdc import CdcEngine
    from citibike_pipeline_spark.cdc.generator import GenConfig, generate_epoch

    cfg = GenConfig(n_convs=20, n_epochs=3, events_per_epoch=600, seed=7,
                    evolution_epoch=1)
    eng = CdcEngine(spark, str(tmp_path / "wh_mc"), n_buckets=4,
                    merge_mode="mor", mor_autocompact_deltas=None)
    eng.init_tables()
    for e in range(cfg.n_epochs):
        eng.ingest_epoch_pandas(generate_epoch(cfg, e), e)
        eng.replay(catchup=False)
    want = (
        eng.silver_view().toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert eng.mor_delta_depth() == cfg.n_epochs

    real_replace = fs.replace_text

    def dying_replace(path, text):
        if path.endswith("VERSION"):
            raise OSError("injected crash mid-compact")
        return real_replace(path, text)

    monkeypatch.setattr(fs, "replace_text", dying_replace)
    with pytest.raises(OSError, match="mid-compact"):
        eng.compact()
    monkeypatch.setattr(fs, "replace_text", real_replace)

    # nothing lost: deltas still present, resolve identical
    assert eng.mor_delta_depth() == cfg.n_epochs
    got = (
        eng.silver_view().toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # retried compact folds to the same state
    eng.compact()
    assert eng.mor_delta_depth() == 0
    got2 = (
        eng.silver_view().toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)


def test_readers_pinned_to_their_snapshot_across_merges(spark, cat):
    """Snapshot isolation: a DataFrame opened before a merge keeps serving
    the snapshot it resolved — the merge rewrites buckets into NEW files
    and the old files survive until snapshot expiry."""
    t = cat.create_table("ns.iso", SCHEMA, key_cols=["k"], n_buckets=4)
    t.append(mk(spark, [(f"k{i}", "old", "I", i) for i in range(20)]))
    old_reader = t.read()  # resolves the v1 file list now

    merge_into(t, mk(spark, [(f"k{i}", "new", "U", 100 + i) for i in range(20)]))

    assert {r.v for r in old_reader.collect()} == {"old"}
    assert {r.v for r in t.read().collect()} == {"new"}

    # after expiry the old snapshot's files are gone and the pinned reader
    # is explicitly allowed to fail — isolation is bounded by retention
    t.expire_snapshots(keep_last=1)
    assert {r.v for r in t.read().collect()} == {"new"}


def test_old_snapshot_readable_by_id_until_expiry(spark, cat):
    """Time travel: reading by explicit snapshot id serves historical state
    until expire_snapshots reclaims it."""
    t = cat.create_table("ns.tt", SCHEMA, key_cols=["k"], n_buckets=4)
    t.append(mk(spark, [("a", "v1", "I", 1)]))
    s1 = t.current_snapshot().snapshot_id
    merge_into(t, mk(spark, [("a", "v2", "U", 2)]))
    assert {r.v for r in t.read(snapshot_id=s1).collect()} == {"v1"}
    assert {r.v for r in t.read().collect()} == {"v2"}


def test_concurrent_writer_conflict_detected(spark, cat):
    """Optimistic concurrency: a commit built from a stale snapshot must be
    REJECTED when another writer advanced the table first — never a silent
    lost update (the failure mode of an unconditional pointer swap)."""
    from citibike_pipeline_spark.lake.table import CommitConflict

    t = cat.create_table("ns.occ", SCHEMA, key_cols=["k"], n_buckets=4)
    t.append(mk(spark, [("a", "v1", "I", 1)]))

    stale = t.current_snapshot()               # writer B resolves here
    merge_into(t, mk(spark, [("a", "v2", "U", 2)]))  # writer A wins the race

    with pytest.raises(CommitConflict, match="advanced"):
        t._commit(stale.child(files=stale.files, summary={"operation": "b"}))

    # the surviving lineage is writer A's; retrying from a FRESH snapshot works
    assert {r.v for r in t.read().collect()} == {"v2"}
    merge_into(t, mk(spark, [("a", "v3", "U", 3)]))
    assert {r.v for r in t.read().collect()} == {"v3"}


def test_creation_commit_onto_existing_table_conflicts(spark, cat):
    """A parentless (creation) commit racing an existing table must raise
    CommitConflict rather than resetting the pointer to an empty v0 — the
    TOCTOU hole two create_table callers would otherwise fall through."""
    from citibike_pipeline_spark.lake.table import CommitConflict, LakeTable, Snapshot

    t = cat.create_table("ns.occ2", SCHEMA, key_cols=["k"], n_buckets=4)
    t.append(mk(spark, [("a", "v1", "I", 1)]))

    # a second writer that lost the create race tries to commit snapshot 0
    stale0 = Snapshot(
        snapshot_id=0,
        schema_json=t.current_snapshot().schema_json,
        key_cols=["k"],
        n_buckets=4,
    )
    with pytest.raises(CommitConflict, match="already exists"):
        t._commit(stale0)
    # the real lineage survives untouched
    assert _rows(t) == {("a", "v1")}
