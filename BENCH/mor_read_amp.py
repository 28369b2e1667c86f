"""MOR read amplification vs delta depth — evidence for the autocompact policy.

Lands EPOCHS small epochs into a merge_mode="mor" engine and measures the
read-side cost of silver_resolved().count() as deltas accumulate, then the
same tail with autocompaction (threshold folds deltas back into the base).

Usage: python BENCH/mor_read_amp.py  → one JSON line
Env: MOR_EPOCHS (default 48), MOR_EVENTS (default 20000), MOR_CPUS (8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citibike_pipeline_spark.cdc import CdcEngine
from citibike_pipeline_spark.cdc.generator import GenConfig, generate_epoch
from citibike_pipeline_spark.session import get_spark


def main() -> None:
    epochs = int(os.environ.get("MOR_EPOCHS", "48"))
    per_epoch = int(os.environ.get("MOR_EVENTS", "20000"))
    cpus = int(os.environ.get("MOR_CPUS", "8"))
    spark = get_spark("mor_read_amp", master=f"local[{cpus}]", shuffle_partitions=cpus)
    cfg = GenConfig(
        n_convs=2000, n_epochs=epochs, events_per_epoch=per_epoch,
        evolution_epoch=epochs + 1,
    )
    pdfs = [generate_epoch(cfg, e) for e in range(epochs)]

    def timed_read(eng):
        t0 = time.time()
        n = eng.silver_resolved().count()
        return round(time.time() - t0, 3), n

    def run(auto: int | None):
        wh = f"/tmp/mor_amp_{auto}"
        shutil.rmtree(wh, ignore_errors=True)
        eng = CdcEngine(
            spark, wh, n_buckets=32, merge_mode="mor",
            mor_autocompact_deltas=auto,
        )
        eng.init_tables()
        samples = {}
        for e, pdf in enumerate(pdfs):
            eng.ingest_epoch_pandas(pdf, e)
            eng.replay(catchup=False)
            depth = eng.mor_delta_depth()
            if e + 1 in (1, 4, 16, epochs):
                sec, rows = timed_read(eng)
                samples[e + 1] = {"depth": depth, "read_sec": sec, "rows": rows}
        shutil.rmtree(wh, ignore_errors=True)
        return samples

    # warm JIT unconditionally with a SEPARATE fixed-size throwaway engine
    # (r3 ADVICE: the old `epochs <= 4` gate meant the default 48-epoch run
    # got NO warm-up, so its first read samples absorbed codegen compile —
    # the exact distortion the round-3 bench notes flagged elsewhere)
    warm_wh = "/tmp/mor_amp_warm"
    shutil.rmtree(warm_wh, ignore_errors=True)
    warm_cfg = GenConfig(n_convs=200, n_epochs=2, events_per_epoch=5000,
                         evolution_epoch=3)
    weng = CdcEngine(spark, warm_wh, n_buckets=32, merge_mode="mor",
                     mor_autocompact_deltas=1)
    weng.init_tables()
    for e in range(warm_cfg.n_epochs):
        weng.ingest_epoch_pandas(generate_epoch(warm_cfg, e), e)
        weng.replay(catchup=False)
        weng.silver_resolved().count()  # warm the resolved-read plan too
    shutil.rmtree(warm_wh, ignore_errors=True)
    out = {
        "metric": "mor_read_amp",
        "epochs": epochs,
        "events_per_epoch": per_epoch,
        "cores": cpus,
        "no_autocompact": run(None),
        "autocompact_16": run(16),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
