#!/usr/bin/env python
"""Per-STAGE breakdown of a bench row (guide §1/§7: find where task
time goes before touching anything).

Runs each named query once warm (after the bench's sf0.001 warm-up +
one untimed sf run), then prints every stage the timed run launched:
task time, shuffle read/write, input bytes, task count, and the stage
name — straight from the Spark UI REST API.

Usage: python scripts/profile_stages.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark

    spark = get_spark(app_name="profile_stages", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.showConsoleProgress": "false"})

    def stages():
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return json.load(r)

    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()
        QUERIES[name](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()   # untimed warm
        before = {s["stageId"] for s in stages()}
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)   # eager lifecycle side effects
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        new = sorted((s for s in stages() if s["stageId"] not in before),
                     key=lambda s: s["stageId"])
        print(f"\n== {name}  wall={wall:.2f}s (construct={t1 - t0:.2f}s)"
              f"  stages={len(new)} "
              f"task_time={sum(s['executorRunTime'] for s in new)/1e3:.2f}s")
        for s in new:
            print(f"  id={s['stageId']:<4d} tasks={s['numCompleteTasks']:<4d}"
                  f" task_t={s['executorRunTime']/1e3:7.2f}s"
                  f" in={s.get('inputBytes', 0)/1e6:7.2f}MB"
                  f" sr={s.get('shuffleReadBytes', 0)/1e6:6.2f}MB"
                  f" sw={s.get('shuffleWriteBytes', 0)/1e6:6.2f}MB"
                  f"  {s.get('name', '')[:70]}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
