"""Hot-conversation skew A/B: salted vs unsalted bucketed writes (north
rule: "skew handled explicitly").

Corpus: one conversation carries 60% of every epoch's events (an extreme
Zipf head). With write_salt=1 the hot conversation's bucket is written by
ONE task — a straggler holding the whole write stage; with write_salt=8
the deterministic hash(conv_id, turn_idx) salt spreads it over 8 writer
tasks. Same engine, same input, final silver state asserted identical
(row count + lsn checksum). JIT warmed untimed; replay epoch-at-a-time
(the steady-state mode where a per-epoch straggler repeats every epoch).

Usage: python BENCH/skew_ab.py  → one JSON line
Env: SKEW_EPOCHS (4), SKEW_EVENTS (150000), SKEW_CPUS (8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from citibike_pipeline_spark.cdc import CdcEngine
from citibike_pipeline_spark.cdc.generator import GenConfig, generate_epoch
from citibike_pipeline_spark.session import get_spark


def land_and_replay(spark, wh: str, cfg: GenConfig, salt: int):
    shutil.rmtree(wh, ignore_errors=True)
    eng = CdcEngine(spark, wh, n_buckets=32, write_salt=salt)
    eng.init_tables()
    for e in range(cfg.n_epochs):
        eng.ingest_epoch_pandas(generate_epoch(cfg, e), e)
    t0 = time.time()
    metrics = eng.replay(catchup=False)
    wall = time.time() - t0
    events = sum(m.get("events_read", 0) for m in metrics)
    row = eng.silver_view().agg(
        F.count(F.lit(1)).alias("n"), F.sum("lsn").alias("s")
    ).collect()[0]
    return eng, wall, events, (int(row.n), int(row.s))


def main() -> None:
    epochs = int(os.environ.get("SKEW_EPOCHS", "4"))
    per_epoch = int(os.environ.get("SKEW_EVENTS", "150000"))
    cpus = int(os.environ.get("SKEW_CPUS", "8"))
    spark = get_spark("skew_ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    cfg = GenConfig(
        n_convs=2000, n_epochs=epochs, events_per_epoch=per_epoch,
        evolution_epoch=epochs // 2, n_hot=1, hot_share=0.6,
        turns_hot=20_000, turns_normal=40,
    )

    warm_cfg = GenConfig(n_convs=100, n_epochs=2, events_per_epoch=5000,
                         evolution_epoch=1)
    for s in (1, 8):
        land_and_replay(spark, "/tmp/skew_warm", warm_cfg, s)
    shutil.rmtree("/tmp/skew_warm", ignore_errors=True)

    results = {}
    states = {}
    for salt in (1, 8):
        eng, wall, events, state = land_and_replay(
            spark, f"/tmp/skew_wh_{salt}", cfg, salt
        )
        # file spread of the hot bucket in the final snapshot
        snap = eng.silver.current_snapshot()
        per_bucket = {}
        for f in snap.files:
            per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
        results[salt] = {
            "replay_sec": round(wall, 2),
            "events_per_sec": round(events / wall, 1),
            "max_files_per_bucket": max(per_bucket.values()),
        }
        states[salt] = state
        shutil.rmtree(f"/tmp/skew_wh_{salt}", ignore_errors=True)

    assert states[1] == states[8], (states, "salted state diverged")
    out = {
        "metric": "skew_salting_ab",
        "hot_share": 0.6,
        "events_per_epoch": per_epoch,
        "epochs": epochs,
        "cores": cpus,
        "write_salt_1": results[1],
        "write_salt_8": results[8],
        "speedup": round(results[1]["replay_sec"] / results[8]["replay_sec"], 2),
        "parity": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
