#!/usr/bin/env python
"""Persisted-vs-recompute crossover probe (VERDICT r05 #5).

SCALING.md records that at sf0.1 the persisted-index MATCH loses to
the in-query incremental recompute, and argues the economics invert at
production scale. This probe MEASURES the trend instead of arguing it:
run `match_lsh_index` (build hoisted, the amortized per-ingest cost)
against `q_dedup_incremental_lsh` (recompute both sides per ingest) on
1x / 4x / 16x corpora, and record the curve.

Corpus recipe (the r03 adversarial replica recipe): sf0.1 documents
replicated with doc_id offsets that are multiples of NEW_BATCH_MOD
(so the batch fraction is preserved per replica) and 2 salt tokens
per replica (replica pairs land at j~0.91, above the 0.85 threshold —
the true near-dup mass legitimately grows superlinearly).

Usage: python scripts/probe_crossover.py [factors...]  (default 1 4 16)
Prints one line per (factor, variant) with best-of-3 wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/crossover"
ID_OFFSET = 10_000_000          # multiple of NEW_BATCH_MOD: batch
#                                 fraction preserved in every replica


def build_corpus(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/x{factor}"
    target = f"{out}/documents.parquet"
    if os.path.exists(target):
        return out
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [docs]
    for i in range(1, factor):
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(i * ID_OFFSET)).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.concat_ws(" ", F.col("text"),
                        F.lit(f"salt{i}a salt{i}b")).alias("text"),
        ).select(*docs.columns))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(max(8, factor * 2)).write.mode("overwrite") \
        .parquet(target)
    return out


def timed(fn, runs: int = 3) -> tuple[float, list[float]]:
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 2))
    return min(ts), ts


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from ngrams_collocations_hadoop_spark.operators import dedup as D
    from ngrams_collocations_hadoop_spark.session import get_spark

    spark = get_spark(app_name="crossover")
    for f in factors:
        sf_dir = build_corpus(spark, f)

        def run_incremental():
            D.q_dedup_incremental_lsh(spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()

        def run_match(table=None):
            D.match_lsh_index(spark, sf_dir, table) \
                .write.format("noop").mode("overwrite").save()

        # hoisted build (timed once, reported separately). The bucket
        # count is the probe's second axis: the index-side merge join
        # runs at bucket parallelism, so a FIXED bucket count caps the
        # match at 8-way no matter the corpus — production scales
        # buckets with the corpus (NCS_LSH_BUCKETS, default: scale 8
        # linearly with the factor, the policy a table refresh would
        # apply).
        n_buckets = int(os.environ.get("NCS_LSH_BUCKETS", 8 * f))
        old_buckets = D.LSH_INDEX_BUCKETS
        D.LSH_INDEX_BUCKETS = n_buckets
        try:
            t0 = time.time()
            table = D.build_lsh_index(spark, sf_dir)
            build_s = round(time.time() - t0, 2)
            m_best, m_runs = timed(lambda: run_match(table))
        finally:
            D.LSH_INDEX_BUCKETS = old_buckets
        i_best, i_runs = timed(run_incremental)
        n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        print(f"x{f}: docs={n} buckets={n_buckets} build={build_s}s "
              f"match_only={m_best}s {m_runs} "
              f"incremental={i_best}s {i_runs} "
              f"ratio_match/incr={m_best / i_best:.2f}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
