#!/usr/bin/env python
"""r12 profiling helper: noop-sink timings + Spark job counts + plan
dumps for a named subset of bench queries (guide §1: measure first,
label jobs, explain(formatted)).

Usage: python tools/r12_prof.py <out_dir> <q1,q2,...> [n_iter]
Writes <out_dir>/<query>.txt (formatted plan) and prints one JSON line
{query: {"med": s, "min": s, "max": s, "jobs": n}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry
    from flint_spark import get_spark

    out_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r12_prof")
    sc = spark.sparkContext
    qs = {**entry.queries(), **entry.extra_queries()}
    res = {}
    for name in names:
        # warm (JIT + parquet footers + python workers)
        qs[name](spark, SF_DIR).write.mode("overwrite") \
            .format("noop").save()
        # plan dump
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        samples = []
        jobs = None
        for i in range(n_iter):
            spark.catalog.clearCache()
            group = f"r12prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            d = qs[name](spark, SF_DIR)
            d.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        samples.sort()
        res[name] = {"med": round(samples[len(samples) // 2], 3),
                     "min": round(samples[0], 3),
                     "max": round(samples[-1], 3),
                     "jobs": jobs}
        print(f"# {name}: {res[name]}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
