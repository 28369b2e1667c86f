"""Dump explain('formatted') for a list of queries to plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_plans_r06.py <tag> <out_dir> <query1> [query2 ...]

Run from a checkout of the code whose plans you want (round-start worktree
for *_before.txt, the final tree for *_after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from citibike_pipeline_spark.operators import REGISTRY
    from citibike_pipeline_spark.operators.resources import release_query_resources
    from citibike_pipeline_spark.session import get_spark

    spark = get_spark("plans_r06", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        release_query_resources(spark)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
