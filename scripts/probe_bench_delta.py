#!/usr/bin/env python
"""Quiet-box A/B attribution of round-over-round bench deltas
(VERDICT r07 #2): run the named queries from SEVERAL checkouts of this
repo in identical fresh Spark applications and compare not just
wall-clock but per-run STAGE metrics (shuffle read/write bytes,
executor task time) pulled from the Spark UI REST API — a shared-box
load blip moves wall-clock with flat shuffle volumes; a real plan or
data-volume change moves the stage metrics too.

Usage:
  python scripts/probe_bench_delta.py <sf_dir> <query> [<query> ...] \
      --trees <path>[=label] [<path>[=label] ...]

Each tree is run in its own subprocess (own JVM, own PYTHONPATH), one
warm-up at the sibling sf0.001 dir (skipped when absent or when it IS
the timed dir) then RUNS timed executions at <sf_dir>, interleaved
nothing: the box should otherwise be idle.

RUN THE PROBE IN BOTH TREE ORDERS before believing a delta (r10
lesson): the tree that runs second can suffer 2-3x task-time
inflation on its early runs (cross-JVM page-cache/GC residue) with
byte-identical shuffle volumes — a single-order probe "confirmed" a
3x regression that reversed-order showed to be contamination
(probe_records/r10_components_lsh_ab.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNS = 5

_WORKER = r"""
import json, os.path, sys, time, urllib.request
repo, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
# warm-up fixture: smallest sibling sf dir, never the timed dir itself
# (pre-warming the timed data would hide its first-scan cost)
warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
if not os.path.isdir(warm_dir) or \
        os.path.realpath(warm_dir) == os.path.realpath(sf_dir):
    warm_dir = None
sys.path.insert(0, repo)
import os
os.chdir(repo)
from ngrams_collocations_hadoop_spark.session import get_spark
spark = get_spark(app_name="bench_delta",
                  extra_conf={"spark.ui.enabled": "true"})
from ngrams_collocations_hadoop_spark.registry import QUERIES

def stages():
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return json.load(r)

out = {}
for name in names:
    if warm_dir:
        QUERIES[name](spark, warm_dir) \
            .write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(%(runs)d):
        before = {s["stageId"] for s in stages()}
        t0 = time.time()
        QUERIES[name](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        new = [s for s in stages() if s["stageId"] not in before]
        runs.append({
            "wall": wall,
            "n_stages": len(new),
            "shuffle_read_mb": round(sum(
                s.get("shuffleReadBytes", 0) for s in new) / 1e6, 2),
            "shuffle_write_mb": round(sum(
                s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 2),
            "task_time_s": round(sum(
                s.get("executorRunTime", 0) for s in new) / 1e3, 2),
            "input_mb": round(sum(
                s.get("inputBytes", 0) for s in new) / 1e6, 2),
        })
    spark.catalog.clearCache()
    out[name] = runs
print("RESULT " + json.dumps(out))
""" % {"runs": RUNS}


def main() -> None:
    args = sys.argv[1:]
    split = args.index("--trees")
    sf_dir, names = args[0], args[1:split]
    trees = []
    for t in args[split + 1:]:
        path, _, label = t.partition("=")
        trees.append((path, label or path))

    results = {}
    for path, label in trees:
        proc = subprocess.run(
            [sys.executable, "-c", _WORKER, os.path.abspath(path),
             sf_dir, *names],
            capture_output=True, text=True, timeout=3600)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"{label}: WORKER FAILED\n{proc.stderr[-2000:]}")
            sys.exit(1)
        results[label] = json.loads(line[0][len("RESULT "):])

    import statistics
    for name in names:
        print(f"\n== {name} ==")
        for label, res in results.items():
            rs = res[name]
            walls = [r["wall"] for r in rs]
            print(f"  {label}: wall min={min(walls)} "
                  f"med={statistics.median(walls)} "
                  f"| task_time med="
                  f"{statistics.median(r['task_time_s'] for r in rs)}s "
                  f"| shuf_rd med="
                  f"{statistics.median(r['shuffle_read_mb'] for r in rs)}MB "
                  f"| shuf_wr med="
                  f"{statistics.median(r['shuffle_write_mb'] for r in rs)}MB "
                  f"| stages={rs[0]['n_stages']}")
    print("\nFULL " + json.dumps(results))


if __name__ == "__main__":
    main()
