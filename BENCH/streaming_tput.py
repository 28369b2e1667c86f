"""Streaming-tail vs batch-replay throughput at one config (r3 verdict #8).

The engine has two apply paths over identical landed bronze epochs:

- batch: ``CdcEngine.replay(catchup=False)`` — epoch-at-a-time merges (the
  steady-state tail mode of the primary path);
- streaming: ``StreamingTail.run_available()`` — Structured Streaming file
  source + foreachBatch through the SAME LWW resolver, micro-batches sized
  to one epoch's file count.

Both are timed over the same event backlog after an untimed warm run
(codegen JIT), and final silver state is asserted identical (row count +
lsn checksum). Output: one JSON line with events/sec on each path and the
streaming overhead — the number the round-3 verdict found missing.

Usage: python BENCH/streaming_tput.py
Env: STREAM_EPOCHS (6), STREAM_EVENTS (50000), STREAM_CPUS (8)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citibike_pipeline_spark.cdc import CdcEngine
from citibike_pipeline_spark.cdc.generator import GenConfig, generate_epoch
from citibike_pipeline_spark.session import get_spark
from citibike_pipeline_spark.streaming import StreamingTail


def land(spark, wh: str, cfg: GenConfig) -> CdcEngine:
    shutil.rmtree(wh, ignore_errors=True)
    eng = CdcEngine(spark, wh, n_buckets=32)
    eng.init_tables()
    for e in range(cfg.n_epochs):
        eng.ingest_epoch_pandas(generate_epoch(cfg, e), e)
    return eng


def silver_check(eng: CdcEngine) -> tuple[int, int]:
    from pyspark.sql import functions as F

    row = eng.silver_view().agg(
        F.count(F.lit(1)).alias("n"), F.sum("lsn").alias("s")
    ).collect()[0]
    return int(row.n), int(row.s)


def files_per_epoch(eng: CdcEngine) -> int:
    first = sorted(glob.glob(os.path.join(eng.bronze.path, "epoch=*")))[0]
    return len(glob.glob(os.path.join(first, "**", "*.parquet"), recursive=True))


def main() -> None:
    epochs = int(os.environ.get("STREAM_EPOCHS", "6"))
    per_epoch = int(os.environ.get("STREAM_EVENTS", "50000"))
    cpus = int(os.environ.get("STREAM_CPUS", "8"))
    spark = get_spark("stream_tput", master=f"local[{cpus}]", shuffle_partitions=cpus)
    cfg = GenConfig(
        n_convs=max(per_epoch // 50, 100), n_epochs=epochs,
        events_per_epoch=per_epoch, evolution_epoch=epochs // 2,
    )

    # untimed warm pass of BOTH code paths (streaming plans its merges
    # through foreachBatch — distinct codegen from the batch plans)
    warm_cfg = GenConfig(n_convs=100, n_epochs=2, events_per_epoch=5000,
                         evolution_epoch=1)
    weng = land(spark, "/tmp/stream_tput_warm_b", warm_cfg)
    weng.replay(catchup=False)
    weng2 = land(spark, "/tmp/stream_tput_warm_s", warm_cfg)
    StreamingTail(weng2, max_files_per_trigger=files_per_epoch(weng2)).run_available()
    shutil.rmtree("/tmp/stream_tput_warm_b", ignore_errors=True)
    shutil.rmtree("/tmp/stream_tput_warm_s", ignore_errors=True)

    # batch path
    beng = land(spark, "/tmp/stream_tput_batch", cfg)
    t0 = time.time()
    metrics = beng.replay(catchup=False)
    batch_sec = time.time() - t0
    events = sum(m.get("events_read", 0) for m in metrics)
    batch_state = silver_check(beng)

    # streaming path over identically landed bronze
    seng = land(spark, "/tmp/stream_tput_stream", cfg)
    fpe = files_per_epoch(seng)
    tail = StreamingTail(seng, max_files_per_trigger=fpe)
    t0 = time.time()
    tail.run_available()
    stream_sec = time.time() - t0
    stream_state = silver_check(seng)

    assert batch_state == stream_state, (batch_state, stream_state)
    batch_eps = events / batch_sec
    stream_eps = events / stream_sec
    out = {
        "metric": "streaming_vs_batch_events_per_sec",
        "events": events,
        "epochs": epochs,
        "cores": cpus,
        "files_per_trigger": fpe,
        "batch_sec": round(batch_sec, 2),
        "batch_events_per_sec": round(batch_eps, 1),
        "stream_sec": round(stream_sec, 2),
        "stream_events_per_sec": round(stream_eps, 1),
        "stream_overhead_pct": round(100.0 * (batch_eps / stream_eps - 1.0), 1),
        "parity": True,
    }
    print(json.dumps(out))
    shutil.rmtree("/tmp/stream_tput_batch", ignore_errors=True)
    shutil.rmtree("/tmp/stream_tput_stream", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
