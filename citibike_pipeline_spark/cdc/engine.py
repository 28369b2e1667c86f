"""The CDC replay engine: bronze WAL epochs -> silver upsert -> checkpoint.

Orchestration is plain function calls in dependency order (the reference's
Airflow DAGs collapse to this, ``trip_pipeline.py:131-132`` ≙ SURVEY.md §2.9 I7).

Per-epoch dataflow (`apply_epoch`)::

    bronze.read_epoch(e)                       -- directory-pruned scan
      |> skip partitions already in manifest   -- exactly-once fast path
      |> reconcile to silver superset schema   -- typed-NULL padding (evolution)
      |> MERGE INTO silver, LWW resolver       -- ONE max_by hash aggregate
      |                                           over (target ∪ events)
      |                                           resolves duplicates,
      |                                           redeliveries and cross-epoch
      |                                           LWW in a single shuffle (map-
      |                                           side partial collapse, no
      |                                           sort), then the salted
      |                                           bucketed write on hash(conv_id)
      |> write commit manifests (epoch, partition_id) + lineage stats
      |                                           (stats recorded at landing)
      |> advance checkpoint, append metrics

Shuffle accounting (scale design): exactly ONE key shuffle per merge — the
LWW-resolve max_by aggregate over (target ∪ events) on the full
(conv_id, turn_idx) key, with map-side partial aggregation collapsing
duplicates BEFORE the exchange (shuffle volume scales with distinct keys,
not events) — plus the salted write repartition (hash(conv_id) buckets, hot
conversations spread over `write_salt` tasks by a deterministic key-hash
salt; see lake.table._write_data_files). A separate pre-dedup pass would
be pure overhead: winner-of-winners equals the global winner. The
aggregate's hash exchange on the full key spreads hot conversations across
turn_idx.

Exactly-once: two complementary mechanisms.
1. Commit manifests keyed (checkpoint_epoch, partition_id) — written after the
   silver snapshot commit; `apply_epoch` first drops any source partition that
   already has a manifest, so a replayed/duplicated epoch is a no-op scan.
2. LWW merge resolution — even if the process dies *between* the snapshot
   commit and the manifest write, re-applying the same events is a semantic
   no-op: every change loses the (lsn, op_rank) comparison against the state
   it already produced. Idempotence is therefore end-to-end, not merely
   best-effort rerun tolerance (the reference's retry-by-rerun,
   ``staging.py:40,72-73``, made exact).

Deletes persist in silver as tombstones (op='D') so late/stale events can
never resurrect a deleted turn; the logical view (`silver_view`) filters them.
Tombstones older than the replay low-watermark are purged by `compact()`.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..lake import LakeCatalog, merge_into
from ..lake import fs
from ..sources.bronze import BronzeLog
from .dedup import lww_dedup_agg, op_rank_col
from .reconcile import reconcile_to_schema
from .schemas import EVENT_SCHEMA_V1, KEY_COLS
from .skew import detect_hot_keys

# Event columns that are WAL metadata, not part of the silver entity payload.
_EVENT_META = {"schema_version", "partition_id", "checkpoint_epoch"}


def _atomic_write_json(path: str, obj: dict) -> None:
    # metadata goes through the lake's FS seam (lake.fs) — one adapter swap
    # for object-store deployments
    fs.write_json_atomic(path, obj)


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        n_buckets: int = 32,
        write_salt: int = 4,
        hot_key_threshold: int = 50_000,
        merge_mode: str = "cow",
        mor_autocompact_deltas: int | None = 16,
        mor_del_deletefile_limit: int | None = None,
        day_partition: bool = False,
    ):
        if merge_mode not in ("cow", "mor", "mor-del"):
            raise ValueError(
                f"merge_mode must be 'cow', 'mor' or 'mor-del', got {merge_mode!r}"
            )
        self.spark = spark
        self.merge_mode = merge_mode
        # both merge-on-read variants share the delta-append write path and
        # the autocompact policy; they differ only in HOW reads resolve:
        # "mor" re-aggregates (full LWW max_by over base ∪ deltas), "mor-del"
        # anti-joins equality-delete files (Iceberg v2 shape) — no read-side
        # aggregate, cost bounded by the un-compacted delete-key set
        self._mor_family = merge_mode in ("mor", "mor-del")
        # mor failure mode is unbounded read amplification from accumulated
        # deltas: fold them back into the base once this many delta commits
        # stack up (None = caller-driven compaction only)
        self.mor_autocompact_deltas = mor_autocompact_deltas
        # mor-del minor-compaction policy (Iceberg rewrite-delete-files):
        # once this many delete FILES accumulate, collapse them to one
        # per-key entry set WITHOUT touching data files — the cheap
        # between-folds maintenance step. None = caller-driven only.
        self.mor_del_deletefile_limit = mor_del_deletefile_limit
        # SURVEY §4 partition spec at full width: days(ts) × bucket(conv_id).
        # The day axis prunes time-scoped analytics + retention; the bucket
        # axis prunes key-scoped merges. Off by default for tiny epochs
        # (days × buckets × salt small-file pressure); turn on at scale.
        self.day_partition = day_partition
        self.warehouse = warehouse
        self.catalog = LakeCatalog(spark, warehouse)
        self.n_buckets = n_buckets
        self.write_salt = write_salt
        self.hot_key_threshold = hot_key_threshold
        self._meta = os.path.join(warehouse, "_meta")
        self._manifest_dir = os.path.join(self._meta, "manifests")
        self._metrics_dir = os.path.join(self._meta, "metrics")
        self._checkpoint_file = os.path.join(self._meta, "checkpoint.json")
        self.bronze = BronzeLog(spark, os.path.join(warehouse, "bronze", "change_events"))

    # -- setup -----------------------------------------------------------------

    def init_tables(self, event_schema: StructType = EVENT_SCHEMA_V1) -> None:
        fs.makedirs(self._manifest_dir)
        fs.makedirs(self._metrics_dir)
        if not self.bronze.exists():
            BronzeLog.create(self.spark, self.bronze.path, event_schema)
        if not self.catalog.table_exists("silver.transcript_turns"):
            self.catalog.create_table(
                "silver.transcript_turns",
                self._silver_schema_for(event_schema),
                key_cols=KEY_COLS,
                # Locality spec: bucket by conversation (≙ CLUSTER BY
                # start_station_id, raw_trips_current.sql:19); merge identity
                # stays the full key.
                bucket_cols=["conv_id"],
                n_buckets=self.n_buckets,
                write_salt=self.write_salt,
                day_col="ts" if self.day_partition else None,
            )

    @staticmethod
    def _silver_schema_for(event_schema: StructType) -> StructType:
        payload = [
            StructField(f.name, f.dataType, True)
            for f in event_schema.fields
            if f.name not in _EVENT_META and f.name not in ("lsn", "op")
        ]
        return StructType(
            payload
            + [
                StructField("lsn", event_schema["lsn"].dataType, False),
                StructField("op", event_schema["op"].dataType, False),
                StructField("ingest_epoch", event_schema["checkpoint_epoch"].dataType, True),
            ]
        )

    @property
    def silver(self):
        return self.catalog.load_table("silver.transcript_turns")

    # -- ingestion (WAL tail -> bronze) ------------------------------------------

    def ingest_epoch_pandas(self, pdf: pd.DataFrame, epoch: int) -> None:
        """Land one epoch; evolves bronze schema forward if new columns appear
        (the v1 -> v2 `tool` seam, FIXTURES.md F2 prop 6)."""
        cur = self.bronze.schema()
        have = {f.name for f in cur.fields}
        new_cols = [c for c in pdf.columns if c not in have]
        if new_cols:
            # insert payload columns before the meta tail, preserving
            # event-schema shape; all evolved columns are nullable strings
            # unless told otherwise (only `tool` in this corpus)
            fields = [f for f in cur.fields if f.name not in _EVENT_META]
            meta = [f for f in cur.fields if f.name in _EVENT_META]
            from pyspark.sql.types import StringType

            for c in new_cols:
                fields.append(StructField(c, StringType(), True))
            self.bronze.evolve_schema(StructType(fields + meta))
        # touched-bucket pre-hashing at landing only pays off when the merge
        # prunes by bucket (cow): the mor apply path appends deltas without
        # pruning, so skip the per-landing distinct job there (r3 ADVICE).
        # _buckets_from_landing tolerates the absent spec (falls back).
        self.bronze.append_epoch_pandas(
            pdf.reindex(columns=[f.name for f in self.bronze.schema().fields]),
            epoch,
            bucket_spec=None if self._mor_family
            else self._silver_bucket_spec(),
        )

    def _silver_bucket_spec(self) -> tuple[list[str], int]:
        """The bucket layout landing stats should pre-hash against — the live
        silver snapshot's spec when the table exists, else the engine config
        (init_tables will create silver with exactly these values)."""
        if self.catalog.table_exists("silver.transcript_turns"):
            snap = self.silver.current_snapshot()
            return (list(snap.bucket_cols), int(snap.n_buckets))
        return (["conv_id"], self.n_buckets)

    def _buckets_from_landing(self, epochs: list[int]) -> list[int] | None:
        """Union of landing-time touched-bucket sets for the given epochs —
        None if any epoch lacks them or was hashed against a different bucket
        spec (legacy landing, re-bucketed silver), in which case the merge
        falls back to its own distinct+collect. A set recorded for the WHOLE
        epoch may be a superset of the still-uncommitted partitions' buckets
        after a partial retry — sound for pruning (never misses a bucket),
        marginally wider than minimal."""
        cols, n = self._silver_bucket_spec()
        want = {"cols": list(cols), "n": int(n)}
        out: set[int] = set()
        for e in epochs:
            rec = self.bronze.epoch_stats(e)
            if rec is None or rec.get("bucket_spec") != want or rec.get("buckets") is None:
                return None
            out.update(int(b) for b in rec["buckets"])
        return sorted(out)

    # -- exactly-once bookkeeping ---------------------------------------------

    def committed_partitions(self, epoch: int) -> set[int]:
        pre = f"e{epoch:06d}_p"
        return {
            int(fn[len(pre):-5])
            for fn in fs.listdir(self._manifest_dir)
            if fn.startswith(pre) and fn.endswith(".json")
        }

    def _write_manifests(self, epoch: int, part_stats: list[dict], snapshot_id: int) -> None:
        for st in part_stats:
            p = int(st["partition_id"])
            _atomic_write_json(
                os.path.join(self._manifest_dir, f"e{epoch:06d}_p{p:04d}.json"),
                {
                    "checkpoint_epoch": epoch,
                    "partition_id": p,
                    "n_events": int(st["n_events"]),
                    "min_lsn": int(st["min_lsn"]),
                    "max_lsn": int(st["max_lsn"]),
                    "snapshot_id": snapshot_id,
                    "committed_at": time.time(),
                },
            )

    def checkpoint(self) -> dict:
        if not fs.exists(self._checkpoint_file):
            return {"last_epoch": -1, "snapshot_id": 0}
        return fs.read_json(self._checkpoint_file)

    def _advance_checkpoint(self, epoch: int, snapshot_id: int) -> None:
        # never regress: applying a late-landed epoch below the checkpoint
        # (gap replay) must not rewind the resume pointer
        last = max(int(self.checkpoint()["last_epoch"]), int(epoch))
        _atomic_write_json(
            self._checkpoint_file, {"last_epoch": last, "snapshot_id": snapshot_id}
        )

    def _committed_by_epoch(self) -> dict[int, set[int]]:
        """One manifest-dir listing -> {epoch: committed partition ids}."""
        out: dict[int, set[int]] = {}
        for fn in fs.listdir(self._manifest_dir):
            # e%06d_p%04d.json
            if fn.startswith("e") and fn.endswith(".json") and "_p" in fn:
                e, _, p = fn[1:-5].partition("_p")
                out.setdefault(int(e), set()).add(int(p))
        return out

    def _is_fully_committed(self, epoch: int, committed: set[int]) -> bool:
        """True iff every partition the WAL landed for this epoch has a
        commit manifest. Epochs without a landing record are conservatively
        treated as pending (apply_epoch's manifest filter makes re-applying
        them a no-op scan)."""
        rec = self.bronze.epoch_stats(epoch)
        if rec is None:
            return False
        parts = {int(st["partition_id"]) for st in rec["partitions"]}
        return parts <= committed

    # -- the apply path ------------------------------------------------------------

    def _lww_resolver(self):
        silver_cols = [f.name for f in self.silver.schema().fields]

        def resolve(target: DataFrame, changes: DataFrame) -> DataFrame:
            # Union current bucket contents with the change-set and let the
            # same documented total order (lsn, op_rank) pick every winner —
            # stale cross-epoch redeliveries lose to existing state, fresh
            # changes beat it. Tombstones ('D' winners) are RETAINED.
            # max_by hash-aggregate kernel: one exchange, map-side partial
            # collapse of duplicates, no sort (vs the window idiom).
            return lww_dedup_agg(
                target.select(*silver_cols).unionByName(changes.select(*silver_cols)),
                # deterministic pick among redelivered duplicates that tie on
                # (lsn, op_rank): prefer the later ingest epoch, NULL loses
                extra_order_cols=[F.coalesce(F.col("ingest_epoch"), F.lit(-1))],
            )

        return resolve

    def _apply_changes(
        self,
        silver,
        changes: DataFrame,
        n_events: int,
        summary: dict,
        touched_buckets: list[int] | None = None,
    ) -> dict:
        """Apply a reconciled change-set under the configured merge mode.

        cow (default): copy-on-write MERGE — resolve (target ∪ changes) with
        the LWW aggregate and rewrite the touched buckets. Write cost scales
        with touched-bucket size; reads are resolve-free.

        mor: merge-on-read delta append (Iceberg-v2/Hudi MOR trade) — the
        change-set is LWW-collapsed batch-locally and APPENDED; cross-delta
        and delta-vs-base winners resolve at READ time (`silver_resolved`).
        Per-epoch write cost is O(changes) with no target read or bucket
        rewrite at all — the right mode for high-frequency small epochs —
        at the price of read amplification until `compact()` folds deltas
        into the base. Exactly-once still holds: a re-applied epoch appends
        duplicate rows whose identical (key, lsn, op) lose/tie in the read-
        side LWW resolve, so the logical state is unchanged.
        """
        silver_cols = [f.name for f in silver.schema().fields]
        if self._mor_family:
            deduped = lww_dedup_agg(
                changes.select(*silver_cols),
                extra_order_cols=[F.coalesce(F.col("ingest_epoch"), F.lit(-1))],
            )
            if self.merge_mode == "mor-del":
                # Iceberg-v2 equality-delete commit: EVERY change key gets a
                # delete entry carrying its LWW order tuple, so older row
                # versions (and older duplicate commits of this same epoch,
                # via the _seq tiebreak) are masked at read time instead of
                # re-aggregated. deduped feeds two writes — persist so the
                # dedup aggregate runs once.
                deduped = deduped.persist()
                try:
                    dels = deduped.select(
                        *silver.current_snapshot().key_cols,
                        "lsn", "op", "ingest_epoch",
                    )
                    # delta_kind stamps WHICH mor variant wrote this delta:
                    # an "eqdel" delta is self-masking (carries its delete
                    # entries); a plain "mor" delta is not and can only be
                    # read by the re-aggregate. The mor-del read path
                    # validates this so a mode switch on a live table fails
                    # loudly instead of resurfacing superseded versions.
                    snap = silver.append_with_deletes(
                        deduped,
                        dels,
                        delete_cols=list(dels.columns),
                        summary={**summary, "mode": "mor_delta",
                                 "delta_kind": "eqdel"},
                    )
                finally:
                    deduped.unpersist()
            else:
                snap = silver.append(deduped, summary={**summary, "mode": "mor_delta"})
            return {"buckets_touched": 0, "snapshot_id": snap.snapshot_id}
        # Landing-time bucket stats make pruning free (no distinct+collect
        # job), so they win whenever present; without them the table-relative
        # heuristic decides whether the collect pays for itself.
        return merge_into(
            silver,
            changes,
            resolver=self._lww_resolver(),
            summary=summary,
            prune_buckets=touched_buckets is not None or self._should_prune(n_events),
            touched_buckets=touched_buckets,
        )

    def _should_prune(self, n_events: int) -> bool:
        """Bucket pruning pays when the change-set is SMALL RELATIVE TO THE
        TABLE: the touched-bucket collect costs one pass over the change-set
        and saves reading+rewriting every untouched bucket. A change-set
        comparable to the table statistically covers all buckets anyway, and
        against a small/empty table (bootstrap, catch-up from scratch) there
        is nothing to save — so the threshold is table-relative, not an
        absolute event count (which inverted at large table sizes: a fixed
        640k-event cutoff forced FULL-table rewrites precisely when the table
        dwarfed the batch). Table size comes from manifest stats ONLY —
        if a legacy snapshot lacks per-file counts we fall back to the old
        absolute heuristic rather than paying a full count() per merge."""
        table_rows = self.silver.stat_row_count()
        if table_rows is None:
            return n_events < self.n_buckets * 20_000
        return n_events * 4 < table_rows

    def _detect_hot_sampled(self, events: DataFrame, n_events: int) -> list[str]:
        """Hot-conversation detection on a sample: at 10^7+ events an exact
        count costs a full pass; a deterministic-seed sample bounds the scan
        at ~2M rows and a >threshold key is detected with near-certainty."""
        cap = 2_000_000
        if n_events <= cap:
            return detect_hot_keys(events, threshold=self.hot_key_threshold)
        frac = cap / n_events
        return detect_hot_keys(
            events.sample(fraction=frac, seed=7),
            threshold=max(int(self.hot_key_threshold * frac), 10),
        )

    def _epoch_part_stats(self, epoch: int, done: set[int]) -> list[dict]:
        """Per-partition offset stats for the uncommitted partitions of one
        epoch. Prefers the stats the WAL recorded at landing time — replay
        then needs NO lineage scan — and recomputes only for legacy epochs."""
        rec = self.bronze.epoch_stats(epoch)
        if rec is None:
            ev = self.bronze.read_epoch(epoch)
            parts = [
                r.asDict()
                for r in ev.groupBy("partition_id")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.min("lsn").alias("min_lsn"),
                    F.max("lsn").alias("max_lsn"),
                )
                .collect()
            ]
        else:
            parts = rec["partitions"]
        return [
            {**st, "checkpoint_epoch": epoch}
            for st in parts
            if int(st["partition_id"]) not in done
        ]

    def _hot_from_landing(self, epochs: list[int]) -> list[str] | None:
        """Hot conversations from landing-time top-conv stats (no scan).
        Returns None if any epoch lacks them (caller falls back to sampling)."""
        totals: dict[str, int] = {}
        for e in epochs:
            rec = self.bronze.epoch_stats(e)
            if rec is None or rec.get("top_convs") is None:
                return None
            for t in rec["top_convs"]:
                totals[t["conv_id"]] = totals.get(t["conv_id"], 0) + int(t["n"])
        return [c for c, n in totals.items() if n > self.hot_key_threshold]

    def apply_epoch(self, epoch: int) -> dict:
        """Apply one epoch's change events to silver. Returns metrics dict."""
        t0 = time.time()
        silver = self.silver

        events = self.bronze.read_epoch(epoch)

        # exactly-once: drop source partitions already committed for this epoch
        done = self.committed_partitions(epoch)
        if done:
            events = events.filter(~F.col("partition_id").isin([int(p) for p in done]))

        # lineage stats come from the WAL landing record — no extra scan
        part_stats = self._epoch_part_stats(epoch, done)
        n_events = int(sum(s["n_events"] for s in part_stats))
        if n_events == 0:
            metrics = {
                "epoch": epoch,
                "events_read": 0,
                "skipped": True,
                "wall_sec": time.time() - t0,
            }
            self._write_metrics(epoch, metrics)
            return metrics

        # schema evolution: any new payload column -> silver ADD COLUMN
        silver_have = {f.name for f in silver.schema().fields}
        new_payload = [
            f
            for f in events.schema.fields
            if f.name not in _EVENT_META and f.name not in silver_have
        ]
        if new_payload:
            silver.add_columns([StructField(f.name, f.dataType, True) for f in new_payload])
            silver = self.silver  # reload snapshot

        # observability: hot conversations in this epoch (drives salt sizing)
        hot = self._hot_from_landing([epoch])
        if hot is None:
            hot = self._detect_hot_sampled(events, n_events)

        # No pre-dedup pass: the LWW merge resolver windows over
        # (target ∪ changes) anyway, and winner-of-winners equals the global
        # winner — pre-deduplicating would add a full extra shuffle+sort of
        # the event set for nothing. (The ≤1-row/key contract applies to the
        # DEFAULT source-wins resolver only.)
        changes = events.withColumn("ingest_epoch", F.lit(epoch).cast("int"))
        changes = reconcile_to_schema(
            changes.drop(*(c for c in _EVENT_META if c in changes.columns)),
            silver.schema(),
        )

        stats = self._apply_changes(
            silver, changes, n_events, {"epoch": epoch},
            touched_buckets=self._buckets_from_landing([epoch]),
        )

        # manifests AFTER the atomic snapshot commit; a crash in between is
        # safe because LWW re-application is a semantic no-op (see module doc)
        self._write_manifests(epoch, part_stats, stats["snapshot_id"])
        self._advance_checkpoint(epoch, stats["snapshot_id"])

        wall = time.time() - t0
        metrics = {
            "epoch": epoch,
            "events_read": n_events,
            "partitions": len(part_stats),
            "buckets_touched": stats["buckets_touched"],
            "buckets_precomputed": bool(stats.get("buckets_precomputed", False)),
            "sec_touched_collect": stats.get("sec_touched_collect"),
            "hot_convs": hot,
            "snapshot_id": stats["snapshot_id"],
            "wall_sec": wall,
            "events_per_sec": n_events / wall if wall > 0 else None,
            "skipped": False,
        }
        self._write_metrics(epoch, metrics)
        return metrics

    def apply_epochs(self, epochs: list[int]) -> dict:
        """Catch-up mode: apply a RANGE of pending epochs in ONE dedup+merge.

        Correct because the LWW total order (lsn, op_rank) is global — final
        state is independent of how the event stream is sliced into merges
        (the property the parity tests pin down). Amortizes the per-merge
        fixed cost (manifest checks, bucket collect, snapshot commit) across
        the whole backlog: resume-after-downtime costs one merge, not one per
        missed epoch. Per-(epoch, partition) manifests and lineage stats are
        still recorded individually.
        """
        t0 = time.time()
        phases: dict[str, float] = {}
        silver = self.silver
        # the range read spans [min, max], but with manifest-derived pending
        # lists the range can be SPARSE (a late-landed epoch between fully
        # committed ones) — keep only the pending epochs' events, or already-
        # applied epochs would be re-merged (and, under mor, re-appended)
        events = self.bronze.read_epochs(min(epochs), max(epochs) + 1)
        if set(epochs) != set(range(min(epochs), max(epochs) + 1)):
            events = events.filter(F.col("checkpoint_epoch").isin([int(e) for e in epochs]))

        # exactly-once: exclude (epoch, partition) pairs already committed;
        # lineage stats come from the WAL landing records — no extra scan
        _t = time.time()
        part_stats: list[dict] = []
        for e in epochs:
            done = self.committed_partitions(e)
            if done:
                events = events.filter(
                    (F.col("checkpoint_epoch") != e)
                    | ~F.col("partition_id").isin([int(p) for p in done])
                )
            part_stats.extend(self._epoch_part_stats(e, done))
        phases["landing_stats"] = round(time.time() - _t, 2)
        n_events = int(sum(s["n_events"] for s in part_stats))
        if n_events == 0:
            metrics = {"epochs": epochs, "events_read": 0, "skipped": True,
                       "wall_sec": time.time() - t0}
            self._write_metrics(max(epochs), metrics)
            return metrics

        silver_have = {f.name for f in silver.schema().fields}
        new_payload = [
            f for f in events.schema.fields
            if f.name not in _EVENT_META and f.name not in silver_have
        ]
        if new_payload:
            silver.add_columns([StructField(f.name, f.dataType, True) for f in new_payload])
            silver = self.silver

        _t = time.time()
        hot = self._hot_from_landing(epochs)
        if hot is None:
            hot = self._detect_hot_sampled(events, n_events)
        phases["hot_detect"] = round(time.time() - _t, 2)

        # no pre-dedup: the LWW resolver's window subsumes it (see apply_epoch)
        changes = events.withColumn("ingest_epoch", F.col("checkpoint_epoch"))
        changes = reconcile_to_schema(
            changes.drop(*(c for c in _EVENT_META if c in changes.columns)),
            silver.schema(),
        )
        _t = time.time()
        stats = self._apply_changes(
            silver, changes, n_events, {"epochs": [min(epochs), max(epochs)]},
            touched_buckets=self._buckets_from_landing(epochs),
        )
        phases["merge"] = round(time.time() - _t, 2)

        by_epoch: dict[int, list[dict]] = {}
        for s in part_stats:
            by_epoch.setdefault(int(s["checkpoint_epoch"]), []).append(s)
        for e, sts in sorted(by_epoch.items()):
            self._write_manifests(e, sts, stats["snapshot_id"])
        self._advance_checkpoint(max(epochs), stats["snapshot_id"])

        wall = time.time() - t0
        metrics = {
            "epochs": epochs,
            "events_read": n_events,
            "partitions": len(part_stats),
            "buckets_touched": stats["buckets_touched"],
            "buckets_precomputed": bool(stats.get("buckets_precomputed", False)),
            "hot_convs": hot,
            "snapshot_id": stats["snapshot_id"],
            "wall_sec": wall,
            "events_per_sec": n_events / wall if wall > 0 else None,
            "phases": {**phases, **{k: v for k, v in stats.items() if k.startswith("sec_")}},
            "skipped": False,
        }
        self._write_metrics(max(epochs), metrics)
        return metrics

    def replay(
        self,
        to_epoch: int | None = None,
        catchup: bool = True,
        late_window: int | None = 1024,
    ) -> list[dict]:
        """Apply every landed epoch (≤ to_epoch) that is not fully committed.

        Pending-ness is manifest-derived, NOT checkpoint-derived: an epoch
        directory that lands LATE — after a later epoch was already applied
        and advanced the checkpoint — is still detected (its partitions lack
        commit manifests) and replayed. LWW order-independence makes the late
        application correct; the checkpoint is only a monotone resume hint.

        ``late_window`` bounds the completeness scan: epochs older than
        checkpoint - late_window are assumed fully committed, so steady-state
        replay cost is O(window + new epochs), not O(lifetime epochs). Pass
        None to force a full-history audit (e.g. after restoring a backup).

        With catchup=True (default) the whole backlog goes through one
        apply_epochs merge; catchup=False applies epoch-at-a-time (the
        incremental/tail mode)."""
        committed = self._committed_by_epoch()
        floor = (
            -1
            if late_window is None
            else int(self.checkpoint()["last_epoch"]) - int(late_window)
        )
        pending = [
            e for e in self.bronze.epochs()
            if e > floor
            and (to_epoch is None or e <= to_epoch)
            and not self._is_fully_committed(e, committed.get(e, set()))
        ]
        if not pending:
            # still bound MOR read amplification: a table whose delta depth
            # already crossed the threshold (e.g. replay killed between apply
            # and compact) must not stay un-compacted across idle replay
            # calls (r3 ADVICE). The compaction is recorded in the metrics
            # log by maybe_autocompact itself; the return stays [] so no
            # caller mistakes the fold for an applied epoch.
            self.maybe_autocompact()
            self.maybe_compact_deletes()
            return []
        if catchup and len(pending) > 1:
            out = [self.apply_epochs(pending)]
        else:
            out = [self.apply_epoch(e) for e in pending]
        # post-apply housekeeping: bounded mor read amplification (no-op
        # under cow or below the delta-depth threshold)
        auto = self.maybe_autocompact()
        if auto is not None:
            out[-1]["autocompact"] = auto
        # delete-side minor compaction AFTER the depth policy: a full fold
        # already replaced the delete files with collapsed guards, making
        # this a no-op in that case
        mc = self.maybe_compact_deletes()
        if mc is not None:
            out[-1]["compact_deletes"] = mc
        return out

    def touched_convs(self, epochs: list[int]) -> DataFrame:
        """Distinct conversations changed by the given epochs — the scope of
        an incremental gold refresh (includes deletes: a conv whose only
        event is a tombstone must still be re-derived). Stays a DataFrame;
        never collected — at 10^10 events this can be millions of keys."""
        return (
            self.bronze.read_epochs(min(epochs), max(epochs) + 1)
            .select("conv_id")
            .distinct()
        )

    # -- serving views -------------------------------------------------------------

    def silver_resolved(
        self,
        buckets: list[int] | None = None,
        days: tuple[str | None, str | None] | None = None,
    ) -> DataFrame:
        """Physically-resolved silver (tombstones still present): under cow
        the table is already collapsed; under mor the base ∪ delta files are
        LWW-collapsed here. Bucket pruning is sound in both modes because a
        key's every version lives in exactly one bucket.

        ``days=(lo, hi)`` scopes the read in time (inclusive ISO dates,
        either bound None = open). Under cow on a day-partitioned table the
        scan is MANIFEST-pruned — untouched days' files are never listed —
        with a residual to_date(ts) filter for exactness (files without day
        metadata, e.g. null-ts partitions, are conservatively scanned).
        Under mor the date filter applies AFTER the LWW resolve over an
        un-day-pruned read: a key's versions can span days, so pruning
        delta files by day could resolve a stale winner."""
        prune_days = days if not self._mor_family else None
        if self.merge_mode == "mor-del":
            df = self._mor_del_resolved(buckets)
        else:
            df = self.silver.read(buckets=buckets, days=prune_days)
            if self.merge_mode == "mor":
                df = lww_dedup_agg(
                    df, extra_order_cols=[F.coalesce(F.col("ingest_epoch"), F.lit(-1))]
                )
        if days is not None:
            lo, hi = days
            d = F.to_date("ts")
            if lo is not None:
                df = df.filter(d >= F.lit(lo))
            if hi is not None:
                df = df.filter(d <= F.lit(hi))
        return df

    @staticmethod
    def _seq_field():
        from pyspark.sql.types import IntegerType, StructField

        return StructField("_seq", IntegerType(), True)

    def _mor_del_schema(self, snap):
        """Read schema of the equality-delete files: key columns + the LWW
        order columns + the commit sequence number."""
        from pyspark.sql.types import StructType

        by_name = {f.name: f for f in snap.schema().fields}
        return StructType(
            [by_name[k] for k in snap.key_cols]
            + [by_name["lsn"], by_name["op"], by_name["ingest_epoch"],
               self._seq_field()]
        )

    def _mor_del_resolved(self, buckets: list[int] | None) -> DataFrame:
        """mor-del read resolve: data files anti-joined against the
        equality-delete entries — a row survives unless some delete entry
        for its key is strictly newer in the total order
        (lsn, op_rank, ingest_epoch, commit _seq).

        Why this beats the "mor" full re-aggregate at scale: the delete side
        is keys + three ints (delta entries bounded by the autocompact
        policy, plus the retained per-key guards — bounded by distinct
        changed keys until a ``compact(watermark_lsn=...)`` prunes them
        under the redelivery contract), so it broadcasts while small and
        degrades to a NARROW shuffled anti-join past the broadcast
        threshold — row payloads never shuffle at read time either way. The ``_seq`` tiebreak is
        what makes a crash-retried epoch structurally idempotent: the retry
        commit's delete entries carry the same LWW tuple at a higher _seq
        and mask the earlier commit's identical rows, while its own rows
        (equal tuple, equal _seq) survive — at most one physical winner per
        key, in every crash window, including re-apply after a compaction.
        Base files written by compact predate ``_seq`` and read as NULL
        (→ -1): any delta delete for the same key masks them iff strictly
        newer, which the LWW tuple already guarantees.
        """
        # ONE snapshot pins both lists: data files and delete entries must
        # come from the same commit, or a concurrent writer landing between
        # two current-snapshot reads lets a newer delete mask an older file
        # list (a key transiently vanishing — the "mor" path reads once and
        # cannot tear this way).
        snap = self.silver.current_snapshot()
        # refuse deltas a "mor"-mode writer appended (no delete entries):
        # without a read-side aggregate every superseded version in them
        # would resurface as a duplicate row. Walk cost is bounded by the
        # autocompact depth, driver-side JSON reads only.
        for s in self._unfolded_delta_summaries(from_snap=snap):
            if s.get("delta_kind") != "eqdel":
                raise ValueError(
                    "merge_mode='mor-del' cannot read delta commits written "
                    "by merge_mode='mor' (no equality-delete entries — "
                    "superseded versions would resurface as duplicates); "
                    "compact() the table under 'mor' first, then switch"
                )
        keys = list(snap.key_cols)
        rows = self.silver.read(
            buckets=buckets,
            snapshot_id=snap.snapshot_id,
            extra_fields=[self._seq_field()],
        )
        dels = self.silver.read_deletes(
            self._mor_del_schema(snap), buckets=buckets,
            snapshot_id=snap.snapshot_id,
        )

        def ord_tuple(seq_col):
            return F.struct(
                F.col("lsn").alias("_o0"),
                op_rank_col().alias("_o1"),
                F.coalesce(F.col("ingest_epoch"), F.lit(-1)).alias("_o2"),
                F.coalesce(seq_col, F.lit(-1)).alias("_o3"),
            )

        # Collapse to ONE delete entry per key — the max order tuple —
        # BEFORE broadcasting: masking against only the per-key max is
        # exactly equivalent (∃d: d > r  ⟺  max_d > r, the order is total),
        # the broadcast build shrinks from Σ per-epoch entries to distinct
        # changed keys, and each probe compares against exactly one entry
        # instead of every commit the key ever appeared in (measured 2x
        # end-to-end at delta depth 24, BENCH/mor_del_ab.json). This
        # aggregate runs over the NARROW delete frame (keys + 3 ints) —
        # row payloads still never shuffle, which is the mode's point.
        d = lww_dedup_agg(
            dels,
            key_cols=keys,
            extra_order_cols=[
                F.coalesce(F.col("ingest_epoch"), F.lit(-1)),
                F.coalesce(F.col("_seq"), F.lit(-1)),
            ],
        ).select(
            *[F.col(k).alias(f"_d_{k}") for k in keys],
            ord_tuple(F.col("_seq")).alias("_d_ord"),
        )
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"_d_{k}"))
        cond = cond & (F.col("_d_ord") > ord_tuple(F.col("_seq")))
        # Broadcast only while the delete set is actually broadcast-sized —
        # known for free from the manifest's per-file stats. Gate on BYTES
        # (parquet footprint; the in-memory hashed relation runs a few times
        # that, still well inside an executor at 64 MB on disk), falling
        # back to a row bound for pre-stats entries. Past the threshold
        # (accumulated guards for every key ever changed, when compaction
        # runs without a redelivery watermark to prune them) the planner
        # falls back to a narrow shuffled anti-join: keys + 3 ints on both
        # shuffle sides, row payloads still never shuffle.
        sizes = [f.get("bytes") for f in snap.delete_files]
        if all(b is not None for b in sizes):
            small = sum(int(b) for b in sizes) <= 64 * 1024 * 1024
        else:
            small = sum(int(f.get("rows") or 0) for f in snap.delete_files) <= 500_000
        build = F.broadcast(d) if small else d
        return rows.join(build, on=cond, how="left_anti").drop("_seq")

    def silver_view(self) -> DataFrame:
        """Logical silver: live turns only (tombstones filtered), stable
        (conv_id, turn_idx, lsn) order available via the kept lsn column."""
        return (
            self.silver_resolved().filter(F.col("op") != "D").drop("op", "ingest_epoch")
        )

    def _unfolded_delta_summaries(self, from_snap=None) -> list[dict]:
        """Summaries of the delta-append commits above the last base fold
        (newest first). Walks parent pointers; in steady state the walk is
        bounded by the autocompact threshold (and by snapshot expiry after
        each compact)."""
        snap = from_snap if from_snap is not None else self.silver.current_snapshot()
        out: list[dict] = []
        while snap is not None:
            op = snap.summary.get("operation")
            if snap.summary.get("mode") == "mor_delta":
                out.append(snap.summary)
            elif op not in ("add_columns", "rewrite_deletes"):
                # create/overwrite/replace_buckets rewrote (or seeded) the
                # base — deltas below it are folded. Commits that touch no
                # data files (add_columns, the delete-side minor compaction)
                # neither add nor fold deltas: keep walking — treating
                # rewrite_deletes as a fold would both reset the apparent
                # depth AND hide un-folded deltas from the eqdel validation.
                break
            if snap.parent_id is None:
                break
            snap = self.silver.get_snapshot(snap.parent_id)
        return out

    def mor_delta_depth(self) -> int:
        """Consecutive delta-append commits since the last base fold —
        the read-amplification measure the autocompact policy bounds."""
        return len(self._unfolded_delta_summaries())

    def maybe_autocompact(self) -> dict | None:
        """Fold accumulated mor deltas once the depth crosses the policy
        threshold. Called by replay() AFTER manifests and the checkpoint are
        committed, so the fold sits off the apply path's critical section —
        a crash mid-compact loses nothing (the next resolve reads the same
        base ∪ deltas). Tombstones are retained (no watermark)."""
        if not self._mor_family or self.mor_autocompact_deltas is None:
            return None
        depth = self.mor_delta_depth()
        if depth < self.mor_autocompact_deltas:
            return None
        t0 = time.time()
        info = self.compact()
        record = {
            "autocompact": True,
            "deltas_folded": depth,
            "snapshot_id": info["snapshot_id"],
            "files_removed": info["files_removed"],
            "wall_sec": round(time.time() - t0, 2),
        }
        # persist the compaction to the metrics log itself (keyed by the
        # checkpoint's last applied epoch): previously the record was only
        # attached to replay()'s RETURN value after _write_metrics had
        # already run, so metrics()/metrics_df silently lost every
        # compaction event (found in the round-4 self-review)
        self._write_metrics(
            max(int(self.checkpoint()["last_epoch"]), 0), record
        )
        return record

    def compact_deletes(self) -> dict:
        """Minor compaction of the mor-del delete side (Iceberg's
        rewrite-delete-files action): collapse the accumulated equality-
        delete files to ONE entry per key — the max LWW order tuple, its
        real (lsn, op, ingest_epoch, _seq) preserved — leaving every data
        file untouched. Read-equivalence is exact: the mask only ever
        compares a row against the per-key MAX (the order is total), so
        physically storing just that winner changes no result. Unlike
        compact(), NO watermark pruning happens here: the superseded
        versions these entries mask are still physically present in the
        delta data files, so every key's guard is load-bearing regardless
        of the redelivery contract. Cost scales with the delete set (keys +
        3 ints), never the table."""
        if self.merge_mode != "mor-del":
            raise ValueError("compact_deletes requires merge_mode='mor-del'")
        silver = self.silver
        snap = silver.current_snapshot()
        dels = silver.read_deletes(
            self._mor_del_schema(snap), snapshot_id=snap.snapshot_id
        )
        collapsed = lww_dedup_agg(
            dels,
            key_cols=list(snap.key_cols),
            extra_order_cols=[
                F.coalesce(F.col("ingest_epoch"), F.lit(-1)),
                F.coalesce(F.col("_seq"), F.lit(-1)),
            ],
        )
        cols = list(snap.key_cols) + ["lsn", "op", "ingest_epoch", "_seq"]
        nxt = silver.rewrite_delete_files(collapsed.select(*cols), cols)
        return {
            "snapshot_id": nxt.snapshot_id,
            "delete_files_before": len(snap.delete_files),
            "delete_files_after": len(nxt.delete_files),
        }

    def maybe_compact_deletes(self) -> dict | None:
        """Run the delete-side minor compaction once the delete FILE count
        crosses the policy limit. Sits off the apply path like
        maybe_autocompact; a crash mid-rewrite loses nothing (the next read
        resolves the same mask from the old files)."""
        if self.merge_mode != "mor-del" or self.mor_del_deletefile_limit is None:
            return None
        snap = self.silver.current_snapshot()
        if len(snap.delete_files) < self.mor_del_deletefile_limit:
            return None
        t0 = time.time()
        info = self.compact_deletes()
        record = {
            "compact_deletes": True,
            **info,
            "wall_sec": round(time.time() - t0, 2),
        }
        self._write_metrics(max(int(self.checkpoint()["last_epoch"]), 0), record)
        return record

    def compact(self, watermark_lsn: int | None = None) -> dict:
        """Purge tombstones at-or-below the replay low-watermark + expire
        snapshots.

        ``watermark_lsn`` is the WAL retention bound: no event with
        lsn ≤ watermark can ever be redelivered, so tombstones up to it can
        never be needed to suppress a resurrection and are safe to drop.
        Tombstones ABOVE the watermark are retained — purging them would let
        a late redelivery of an older event resurrect a deleted key. With no
        watermark given, NO tombstones are purged (snapshot expiry only).
        Full-table rewrite — run rarely, off-path.
        """
        silver = self.silver
        if watermark_lsn is None:
            keep = F.lit(True)  # no redelivery bound given -> purge nothing
        else:
            keep = (F.col("op") != "D") | (F.col("lsn") > F.lit(int(watermark_lsn)))
        # under mor this is ALSO the delta-fold (minor compaction): the
        # resolved state is rewritten as a collapsed base
        live = self.silver_resolved().filter(keep)
        guards = guard_cols = None
        if self.merge_mode == "mor-del":
            # RETAIN the delete entries as per-key version guards — they are
            # what masks a stale redelivery that lands AFTER the fold (the
            # base winner's "newer than you" proof; without them an old
            # (key, lsn) re-appended post-compact would resurface because no
            # read-side aggregate re-ranks it). Same retention contract as
            # tombstones: guards at-or-below the redelivery watermark can
            # never be needed and are dropped. Physically folded to ONE
            # entry per key (the max order tuple) with _seq reset to -1 so
            # a guard never masks the equal-tuple base row the fold just
            # wrote (strictly-newer masking only).
            cur = silver.current_snapshot()
            dels = silver.read_deletes(self._mor_del_schema(cur))
            if watermark_lsn is not None:
                dels = dels.filter(F.col("lsn") > F.lit(int(watermark_lsn)))
            guard_cols = list(cur.key_cols) + ["lsn", "op", "ingest_epoch", "_seq"]
            guards = lww_dedup_agg(
                dels.drop("_seq"),
                key_cols=list(cur.key_cols),
                extra_order_cols=[F.coalesce(F.col("ingest_epoch"), F.lit(-1))],
            ).withColumn("_seq", F.lit(-1).cast("int"))
        snap = silver.overwrite(
            live,
            summary={"operation": "compact", "watermark_lsn": watermark_lsn},
            deletes=guards,
            delete_cols=guard_cols,
        )
        removed = silver.expire_snapshots(keep_last=2)
        return {"snapshot_id": snap.snapshot_id, "files_removed": removed}

    # -- observability ---------------------------------------------------------------

    def _write_metrics(self, epoch: int, metrics: dict) -> None:
        _atomic_write_json(
            os.path.join(self._metrics_dir, f"e{epoch:06d}_{uuid.uuid4().hex[:8]}.json"),
            metrics,
        )

    def metrics(self) -> list[dict]:
        out = []
        for fn in sorted(fs.listdir(self._metrics_dir)):
            out.append(fs.read_json(os.path.join(self._metrics_dir, fn)))
        return out

    def lineage(self) -> list[dict]:
        out = []
        for fn in sorted(fs.listdir(self._manifest_dir)):
            out.append(fs.read_json(os.path.join(self._manifest_dir, fn)))
        return out

    def metrics_df(self) -> DataFrame:
        """Per-apply observability as a queryable TABLE (north-star "metrics
        tables" companion to lineage_df): the stable numeric core of every
        recorded apply — epoch, volume, bucket pruning, snapshot, wall.
        Variable payloads (hot-conv lists, autocompact details) stay in the
        raw ``metrics()`` JSON."""
        schema_ddl = (
            "epoch int, events_read long, partitions int, buckets_touched int, "
            "snapshot_id long, wall_sec double, events_per_sec double, "
            "skipped boolean"
        )
        cols = [f.split(" ")[0] for f in schema_ddl.split(", ")]

        def field(m: dict, c: str):
            if c == "epoch" and "epoch" not in m and m.get("epochs"):
                return int(max(m["epochs"]))  # catchup entry: epoch span's head
            return m.get(c)

        # apply records only; standalone autocompact records (variable
        # payload, no per-epoch counters) stay in the raw metrics() JSON
        rows = [
            tuple(field(m, c) for c in cols)
            for m in self.metrics()
            if "events_read" in m
        ]
        if rows:
            return self.spark.createDataFrame(rows, schema_ddl)
        from ..lake.table import empty_df

        return empty_df(self.spark, StructType.fromDDL(schema_ddl))

    def lineage_df(self) -> DataFrame:
        rows = self.lineage()
        schema = (
            "checkpoint_epoch int, partition_id int, n_events long, "
            "min_lsn long, max_lsn long, snapshot_id long, committed_at double"
        )
        if rows:
            return self.spark.createDataFrame(rows, schema)
        # JVM-native empty frame — never the pickled-parallelize path
        from ..lake.table import empty_df

        return empty_df(self.spark, StructType.fromDDL(schema))
