#!/usr/bin/env python
"""Append/refresh lifecycle-leg timing probe (VERDICT r09 #4).

The three stored-artifact lifecycles have benched BUILD and
MATCH/SERVE/UPDATE legs; the APPEND/REFRESH legs — the per-batch costs
the lifecycles exist to bound — were test-pinned but never timed.
This probe measures them so batch-proportionality is a measurement,
not a docstring claim:

- ``append_lsh_index``: fresh pre-batch build (excluded from timing),
  then timed appends of a SMALL and a LARGE batch (4x the rows). A
  batch-proportional append shows (a) append(L)/append(S) well under
  the naive 4x (fixed per-job overhead dominates at fixture batch
  sizes; the data-dependent part scales with the batch), and (b) both
  far under the full build.
- ``append_pq_index``: full build (excluded), then timed encode+append
  of small/large synthetic batches (vec_id-offset copies, so ids stay
  unique) against the STORED codebook.
- ``refresh_components_table``: the per-ingest update+write-back, run
  twice back-to-back — re-ingest of the same batch is the lifecycle's
  steady state, so run 2 ≈ run 1 (flat per-tick cost), both far under
  the pre-batch table BUILD.

Each leg is median-of-3 (fresh state per run where the leg mutates
state). Usage: python scripts/probe_append_legs.py [sf_dir]
Prints one JSON line per leg; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 3
ID_OFFSET = 10_000_000   # multiple of NEW_BATCH_MOD


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def probe_lsh(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ngrams_collocations_hadoop_spark.operators.dedup import (
        NEW_BATCH_MOD, append_lsh_index, build_lsh_index)
    from ngrams_collocations_hadoop_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0)
    small = batch.filter(F.col("doc_id") % (NEW_BATCH_MOD * 8) == 0)
    large = batch.filter(F.col("doc_id") % (NEW_BATCH_MOD * 2) == 0)
    n_s, n_l = small.count(), large.count()
    builds, app_s, app_l = [], [], []
    table = None
    for _ in range(RUNS):
        holder = {}
        builds.append(timed(lambda: holder.update(
            t=build_lsh_index(spark, sf_dir, old_only=True))))
        table = holder["t"]
        app_s.append(timed(lambda: append_lsh_index(spark, table, small)))
        app_l.append(timed(lambda: append_lsh_index(spark, table, large)))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return {"leg": "append_lsh_index", "rows_small": n_s, "rows_large": n_l,
            "build_med": round(statistics.median(builds), 3),
            "append_small_med": round(statistics.median(app_s), 3),
            "append_large_med": round(statistics.median(app_l), 3),
            "runs": RUNS}


def probe_pq(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ngrams_collocations_hadoop_spark.operators.similarity import (
        append_pq_index, build_pq_index, load_finite_embeddings,
        pq_index_table)

    e = load_finite_embeddings(spark, sf_dir)
    small = e.filter(F.col("vec_id") % 8 == 0).select(
        (F.col("vec_id") + ID_OFFSET).alias("vec_id"), "embedding")
    large = e.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + 2 * ID_OFFSET).alias("vec_id"), "embedding")
    n_s, n_l = small.count(), large.count()
    # one build (the expensive trained leg, timed once for contrast);
    # appends don't invalidate it, so each run appends fresh-id copies
    t_build = timed(lambda: build_pq_index(spark, sf_dir))
    table = pq_index_table(sf_dir, spark)
    app_s, app_l = [], []
    for i in range(RUNS):
        s_i = small.select((F.col("vec_id") + i).alias("vec_id"),
                           "embedding")
        l_i = large.select((F.col("vec_id") + i).alias("vec_id"),
                           "embedding")
        app_s.append(timed(lambda: append_pq_index(spark, sf_dir,
                                                   table, s_i)))
        app_l.append(timed(lambda: append_pq_index(spark, sf_dir,
                                                   table, l_i)))
    # restore a clean full-corpus index for whoever runs next
    build_pq_index(spark, sf_dir)
    return {"leg": "append_pq_index", "rows_small": n_s, "rows_large": n_l,
            "build_once": round(t_build, 3),
            "append_small_med": round(statistics.median(app_s), 3),
            "append_large_med": round(statistics.median(app_l), 3),
            "runs": RUNS}


def probe_components(spark, sf_dir: str) -> dict:
    from ngrams_collocations_hadoop_spark.operators.dedup import (
        build_components_table, refresh_components_table)

    builds, ref1, ref2 = [], [], []
    table = None
    for _ in range(RUNS):
        holder = {}
        builds.append(timed(lambda: holder.update(
            t=build_components_table(spark, sf_dir))))
        table = holder["t"]
        ref1.append(timed(
            lambda: refresh_components_table(spark, sf_dir, table)))
        ref2.append(timed(
            lambda: refresh_components_table(spark, sf_dir, table)))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return {"leg": "refresh_components_table",
            "build_med": round(statistics.median(builds), 3),
            "refresh1_med": round(statistics.median(ref1), 3),
            "refresh2_med": round(statistics.median(ref2), 3),
            "runs": RUNS}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from ngrams_collocations_hadoop_spark.session import get_spark

    spark = get_spark(app_name="probe_append_legs")
    for fn in (probe_lsh, probe_pq, probe_components):
        rec = fn(spark, sf_dir)
        rec["sf_dir"] = sf_dir
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
