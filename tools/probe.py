"""Targeted per-query probe (guide §1.4): run named queries at a given SF
with the noop sink, N reps (first untimed warm at sf0.001), and print per-rep
seconds plus a physical-plan summary (Exchange count, join nodes, Python
eval nodes). Does NOT touch bench.py.

Usage: python tools/probe.py SF_DIR q1 [q2 ...] [--reps N] [--plan]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]
    show_plan = "--plan" in sys.argv
    sf_dir, names = args[0], args[1:]

    from citibike_pipeline_spark.operators import REGISTRY
    from citibike_pipeline_spark.operators.resources import (
        clear_session_memos,
        release_query_resources,
    )
    from citibike_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm = "/root/testdata/sf0.001"
    for name in names:
        REGISTRY[name].fn(spark, warm).write.format("noop").mode("overwrite").save()
        release_query_resources(spark)
    for name in names:
        times = []
        for i in range(reps):
            clear_session_memos()
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
            release_query_resources(spark)
        print(f"{name}: {times}")
        if show_plan:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            release_query_resources(spark)
            import re

            ex = len(re.findall(r"\bExchange\b", plan))
            joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)))
            py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)))
            print(f"  plan: {ex} Exchange; joins={joins}; python={py}")
    spark.stop()


if __name__ == "__main__":
    main()
