#!/usr/bin/env python
"""Per-bench-row time decomposition (guide §1: measure first).

For each bench query, split wall time into:
  construct — QUERIES[name](spark, sf_dir): Python DF assembly plus any
              EAGER lifecycle side effects (index/table builds, streams)
  plan      — force queryExecution().executedPlan() (analysis +
              optimization + physical planning, driver-side)
  exec      — the noop-sink write (what the bench's timed action pays
              on top of construction)

Usage: python scripts/profile_rows.py [sf_dir] [name ...]
Each row is profiled twice; both passes print (pass 1 = cold).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import BENCH_QUERIES
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark

    names = sys.argv[2:] or [n for n in BENCH_QUERIES if n in QUERIES]
    spark = get_spark(app_name="profile_rows", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    print(f"{'row':34s} {'construct':>9s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s}")
    for name in names:
        # warm-up at sf0.001, mirroring bench.py
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warmup failed: {exc!r}")
            continue
        for run in (1, 2):
            spark.sparkContext.setJobDescription(f"profile: {name} #{run}")
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            print(f"{name:34s} {t1 - t0:9.3f} {t2 - t1:7.3f} "
                  f"{t3 - t2:7.3f} {t3 - t0:7.3f}  #run{run}")
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
