"""A/B: "mor" (read-time LWW re-aggregate) vs "mor-del" (equality-delete
mask) — evidence for WHY the Iceberg-v2 delete-file shape matters at scale.

Both modes pay O(changes) appends per epoch; they differ in read cost:

- mor resolves by a FULL-TABLE hash aggregate (max_by over every physical
  row, payloads shuffled) — cost grows with total physical rows, i.e. with
  delta depth times epoch size;
- mor-del resolves by one broadcast anti-join against the delete-key set
  (keys + 3 ints, no payloads) — the table side streams through a probe,
  nothing wide shuffles.

Protocol: identical epoch streams into both engines (autocompact OFF so the
delta depth actually grows), read-side silver_resolved().count() timed at
increasing depths, best-of-2 per sample, JIT warmed per mode with a
throwaway engine first.

Usage: python BENCH/mor_del_ab.py  → one JSON line
Env: AB_EPOCHS (default 24), AB_EVENTS (default 20000), AB_CPUS (8),
     AB_TEXT_MULT (default 1) — multiplies the turn text length, because the
     modes' structural difference is WHAT moves at read time: "mor"'s
     max_by shuffles the surviving full rows (payload bytes), "mor-del"
     aggregates/broadcasts only keys + ints. At the generator's short
     default texts both reads are file-count-bound and near parity; at
     realistic transcript widths the payload shuffle is the term that grows.
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

SAMPLE_AT = (1, 4, 8, 16, 24)


def main() -> None:
    epochs = int(os.environ.get("AB_EPOCHS", "24"))
    per_epoch = int(os.environ.get("AB_EVENTS", "20000"))
    cpus = int(os.environ.get("AB_CPUS", "8"))
    spark = get_spark("mor_del_ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    text_mult = int(os.environ.get("AB_TEXT_MULT", "1"))
    cfg = GenConfig(
        n_convs=2000, n_epochs=epochs, events_per_epoch=per_epoch,
        evolution_epoch=epochs + 1,
    )
    pdfs = []
    for e in range(epochs):
        pdf = generate_epoch(cfg, e)
        if text_mult > 1:
            pdf["text"] = pdf["text"] * text_mult
        pdfs.append(pdf)

    def run(mode: str, tag: str | None = None, **eng_kw):
        tag = tag or mode
        # JIT warm per mode (separate throwaway engine, its own resolve plan)
        warm = f"/tmp/mdab_warm_{tag}"
        shutil.rmtree(warm, ignore_errors=True)
        wcfg = GenConfig(n_convs=200, n_epochs=2, events_per_epoch=5000,
                         evolution_epoch=3)
        weng = CdcEngine(spark, warm, n_buckets=32, merge_mode=mode,
                         mor_autocompact_deltas=None, **eng_kw)
        weng.init_tables()
        for e in range(wcfg.n_epochs):
            weng.ingest_epoch_pandas(generate_epoch(wcfg, e), e)
            weng.replay(catchup=False)
            weng.silver_resolved().count()
        shutil.rmtree(warm, ignore_errors=True)

        wh = f"/tmp/mdab_{tag}"
        shutil.rmtree(wh, ignore_errors=True)
        eng = CdcEngine(spark, wh, n_buckets=32, merge_mode=mode,
                        mor_autocompact_deltas=None, **eng_kw)
        eng.init_tables()
        samples = {}
        apply_sec = 0.0
        for e, pdf in enumerate(pdfs):
            eng.ingest_epoch_pandas(pdf, e)
            t0 = time.time()
            eng.replay(catchup=False)
            apply_sec += time.time() - t0
            if e + 1 in SAMPLE_AT:
                best, rows = None, None
                for _ in range(2):
                    t0 = time.time()
                    rows = eng.silver_resolved().count()
                    sec = time.time() - t0
                    best = sec if best is None else min(best, sec)
                samples[e + 1] = {
                    "depth": eng.mor_delta_depth(),
                    "delete_files": len(eng.silver.current_snapshot().delete_files),
                    "read_sec": round(best, 3),
                    "rows": rows,
                }
        shutil.rmtree(wh, ignore_errors=True)
        return {"samples": samples, "apply_sec_total": round(apply_sec, 1)}

    out = {
        "metric": "mor_vs_mor_del_read_cost",
        "epochs": epochs,
        "events_per_epoch": per_epoch,
        "cores": cpus,
        "text_mult": text_mult,
        "mor": run("mor"),
        "mor_del": run("mor-del"),
        # Iceberg rewrite-delete-files policy: the minor compaction keeps
        # the delete side at ~1 collapsed file set between data folds
        "mor_del_limit8": run("mor-del", tag="mor-del-limit8",
                              mor_del_deletefile_limit=8),
    }
    deep = max(k for k in out["mor"]["samples"])
    a = out["mor"]["samples"][deep]["read_sec"]
    b = out["mor_del"]["samples"][deep]["read_sec"]
    out["read_speedup_at_max_depth"] = round(a / b, 2) if b else None
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
