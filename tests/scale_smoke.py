"""Scale smoke: run the heavy operators on generated multi-million-row
panels to validate O(n) behavior and memory headroom beyond the bench
scale. Not part of the default pytest run (takes minutes):

    python tests/scale_smoke.py [rows_millions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flint_spark import get_spark, summarizers as S, windows as W  # noqa: E402
from flint_spark.operators import asof, windows_ops  # noqa: E402
from flint_spark.operators.ema import ewma  # noqa: E402
from flint_spark.sources.generator import generate  # noqa: E402


def timed(label, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"  {label:28s} {dt:7.2f}s")
    return dt


def main(millions: float = 5.0):
    spark = get_spark("scale_smoke")
    n_ids = 2000
    freq_ns = 10**9
    n_cycles = int(millions * 1e6 / n_ids)
    end = n_cycles * freq_ns
    panel = generate(spark, 0, end, "1s", ids=list(range(n_ids)),
                     columns=["x1", "x2"]).persist()
    n = panel.count()
    print(f"panel rows: {n:,} ({n_ids} ids x {n_cycles + 1} cycles)")

    timed("cycle agg", panel.groupBy("time").agg(F.sum("x1")))
    timed("window rolling 100s/key",
          windows_ops.summarize_windows(panel, W.past_absolute_time("100s"),
                                        S.compose(S.count(), S.mean("x1")),
                                        key=["id"]))
    timed("ewma/key", ewma(panel, "x1", key=["id"]))

    right = panel.sample(0.1, seed=1).select("time", "id",
                                             F.col("x2").alias("r_val"))
    timed("asof join (10% right)",
          asof.left_join(panel.select("time", "id", "x1"), right,
                         tolerance="60s", key=["id"]))
    panel.unpersist()


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 5.0)
