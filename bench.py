"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Times (a) the CDC replay path (the BASELINE.json headline metric:
change-events/sec applied to final-state parity) and (b) a set of headline
analytic queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Env knobs:
    SPARK_GRAFT_SF_DIR   testdata dir    (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     cores           (default 32)
    BENCH_EVENTS         CDC events per epoch (default 100_000)
    BENCH_EPOCHS         CDC epochs      (default 6)
    BENCH_SKIP_CDC=1     skip the replay section
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The timed set is the ENTIRE registry (r3 verdict #1's done-criterion:
# every gate query >= 0.5 s must be cost-visible on the bench — 16 queries
# beyond the old curated list cross that bar at sf0.1, so curation lost).
# Resolved lazily in main() after imports.
HEADLINE: list[str] = []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from citibike_pipeline_spark.session import get_spark
    from citibike_pipeline_spark.operators import REGISTRY
    from citibike_pipeline_spark.operators.resources import (
        live_resource_counts,
        release_query_resources,
    )

    HEADLINE.extend(k for k in sorted(REGISTRY) if k not in HEADLINE)
    # BENCH_ONLY=prefix[,prefix...]: time a subset (targeted re-measurement,
    # e.g. the iterative queries in a quiet window); full registry otherwise.
    only = os.environ.get("BENCH_ONLY")
    prefixes = tuple(p for p in (only or "").split(",") if p)  # "" matches all
    if prefixes:
        HEADLINE[:] = [k for k in HEADLINE if k.startswith(prefixes)]

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # Warm the JVM so per-query times measure execution, not JIT: one scan
    # plus ONE untimed run of each headline plan at the smallest SF — the
    # codegen cache is keyed on generated source, so the sf0.1 runs reuse the
    # compiled classes. (r2 showed the first timed queries absorbing multiple
    # seconds of codegen compile — q01 "4.3 s" was 0.09 s steady-state.)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    queries: dict[str, float] = {}
    headline = [] if os.environ.get("BENCH_SKIP_QUERIES") == "1" else HEADLINE
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if headline and os.path.isdir(warm_dir):
        for name in headline:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            release_query_resources(spark)
    # Best-of-k per query, DEFAULT k=2 (r4 verdict #8): this host shows
    # sporadic ~20 s throttle bursts that land on ONE random query per pass
    # (the slow outlier moved between d05/q33/q31/q32b across otherwise-
    # identical runs); min-per-query across passes removes the burst without
    # hiding real regressions, so the official per-round record is burst-free
    # by construction. BENCH_REPS=1 restores single-pass timing.
    reps = int(os.environ.get("BENCH_REPS", "2"))
    from citibike_pipeline_spark.operators.resources import clear_session_memos

    for _ in range(max(reps, 1)):
        # driver-side memos (flow solve, k-means fit) are shared WITHIN a
        # pass (one solve per registry pass, by design) but must not leak
        # ACROSS reps — min-per-query would otherwise record memoized,
        # work-free times for the producing queries and hide regressions
        # in the solve/fit itself
        clear_session_memos()
        for name in headline:
            fn = REGISTRY[name].fn
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            queries[name] = min(queries.get(name, sec), sec)
            # release per-query caches/scratch (operators/resources.py
            # contract) and assert nothing leaked — the r3 cache-leak guard
            release_query_resources(spark)
            n_persist, n_scratch = live_resource_counts(spark)
            assert n_persist == 0 and n_scratch == 0, (
                f"{name} leaked resources: {n_persist} persisted, {n_scratch} scratch"
            )

    cdc = {}
    if os.environ.get("BENCH_SKIP_CDC") != "1":
        from citibike_pipeline_spark.cdc import CdcEngine
        from citibike_pipeline_spark.cdc.generator import GenConfig, generate_epoch

        n_epochs = int(os.environ.get("BENCH_EPOCHS", "6"))
        per_epoch = int(os.environ.get("BENCH_EVENTS", "100000"))
        cfg = GenConfig(
            n_convs=max(per_epoch // 50, 100),
            n_epochs=n_epochs,
            events_per_epoch=per_epoch,
            evolution_epoch=n_epochs // 2,
        )
        wh = f"/tmp/bench_wh_{cpus}"
        shutil.rmtree(wh, ignore_errors=True)
        # untimed mini-replay first: the merge path's codegen is distinct
        # from the query plans warmed above, and a cold JVM spends seconds
        # compiling it (same protocol as BENCH/scaling.py — measure the
        # engine, not the JIT)
        warm_wh = f"{wh}_warm"
        shutil.rmtree(warm_wh, ignore_errors=True)
        warm_cfg = GenConfig(n_convs=200, n_epochs=2, events_per_epoch=10_000,
                             evolution_epoch=1)
        weng = CdcEngine(spark, warm_wh, n_buckets=32)
        weng.init_tables()
        for e in range(warm_cfg.n_epochs):
            weng.ingest_epoch_pandas(generate_epoch(warm_cfg, e), e)
        weng.replay()
        shutil.rmtree(warm_wh, ignore_errors=True)

        eng = CdcEngine(spark, wh, n_buckets=32)
        eng.init_tables()
        for e in range(cfg.n_epochs):
            eng.ingest_epoch_pandas(generate_epoch(cfg, e), e)
        t0 = time.time()
        metrics = eng.replay()
        replay_sec = time.time() - t0
        events = sum(m.get("events_read", 0) for m in metrics)
        cdc = {
            "cdc_events_applied": events,
            "cdc_replay_sec": round(replay_sec, 2),
            "cdc_events_per_sec": round(events / replay_sec, 1),
            "cdc_silver_rows": int(eng.silver_view().count()),
        }
        shutil.rmtree(wh, ignore_errors=True)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cores": cpus,
                **cdc,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
