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


def build_long_corpus(spark, mult: int) -> str:
    """The DOC-LENGTH axis (VERDICT r06 #5): same doc COUNT as sf0.1,
    text grown ``mult``x by appending mult-1 salted copies of the
    doc's own tokens (each copy suffixed per generation, so the token
    SET — what minhash walks — really grows ~mult x and near-dup pairs
    keep their Jaccard structure). Measures whether per-doc text CPU
    (tokenize + 64-perm minhash), which BOTH lifecycle variants pay on
    the batch side but only the incremental variant re-pays on the
    corpus side, dwarfs the persisted path's index read as docs grow
    toward production sizes — the one SCALING.md claim that was still
    extrapolation."""
    from pyspark.sql import functions as F

    out = f"{WORK}/len{mult}"
    target = f"{out}/documents.parquet"
    if os.path.exists(target):
        return out
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = [F.col("text")] + [
        F.array_join(
            F.transform(F.split(F.col("text"), " "),
                        lambda t, i=i: F.concat(t, F.lit(f"x{i}"))),
            " ")
        for i in range(1, mult)]
    grown = docs.withColumn("text", F.concat_ws(" ", *copies))
    grown.repartition(8).write.mode("overwrite").parquet(target)
    return out


def timed(fn, runs: int = 3) -> tuple[float, list[float]]:
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 2))
    return min(ts), ts


def main() -> None:
    args = sys.argv[1:]
    doclen_mode = "--doclen" in args
    if doclen_mode:
        args.remove("--doclen")
    factors = [int(a) for a in args] or ([1, 10, 50] if doclen_mode
                                         else [1, 4, 16])
    from ngrams_collocations_hadoop_spark.operators import dedup as D
    from ngrams_collocations_hadoop_spark.session import get_spark

    spark = get_spark(app_name="crossover")
    for f in factors:
        sf_dir = (build_long_corpus(spark, f) if doclen_mode
                  else build_corpus(spark, f))

        def run_incremental():
            D.q_dedup_incremental_lsh(spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()

        def run_match(table=None):
            D.match_lsh_index(spark, sf_dir, table) \
                .write.format("noop").mode("overwrite").save()

        # hoisted build (timed once, reported separately). The bucket
        # count is the probe's second axis: the index-side merge join
        # runs at bucket parallelism, so a FIXED bucket count caps the
        # match at 8-way no matter the corpus. Since r07 the build's
        # own corpus-scaled policy (dedup.lsh_index_buckets — one
        # bucket per LSH_BUCKET_BYTES of input, the linear rule this
        # probe measured) applies by default; NCS_LSH_BUCKETS
        # overrides for experiments.
        n_env = os.environ.get("NCS_LSH_BUCKETS")
        n_buckets = (int(n_env) if n_env
                     else D.lsh_index_buckets(sf_dir, spark))
        t0 = time.time()
        table = D.build_lsh_index(spark, sf_dir, n_buckets=n_buckets)
        build_s = round(time.time() - t0, 2)
        m_best, m_runs = timed(lambda: run_match(table))
        i_best, i_runs = timed(run_incremental)
        n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        axis = "len" if doclen_mode else "x"
        print(f"{axis}{f}: docs={n} buckets={n_buckets} build={build_s}s "
              f"match_only={m_best}s {m_runs} "
              f"incremental={i_best}s {i_runs} "
              f"ratio_match/incr={m_best / i_best:.2f}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
