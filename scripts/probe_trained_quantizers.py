#!/usr/bin/env python
"""Measure what codebook/quantizer TRAINING buys each ANN surface
(VERDICT r07 #6) — recall@10 against the exact brute-force top-k:

1. flat PQ ADC: one-shot (stride) codebook vs the Lloyd-trained one
   (`sim_pq_trained_topk` / `sim_pq_trained_recall` are the registry
   surfaces of this row);
2. the SAME comparison composed with the exact re-rank funnel
   (shortlist PQ_RERANK_C from each codebook's ADC, then
   `_exact_refine`) — does training still matter after refinement?
3. the IVF coarse quantizer: stride-sampled centroids vs 2 Lloyd
   iterations over them (float means — a probe, not an oracle-able
   query; the registry keeps the stride form).

Usage: python scripts/probe_trained_quantizers.py [sf_dir ...]
Results are recorded in SCALING.md; run on an otherwise idle box.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _recall(exact: DataFrame, found: DataFrame) -> float:
    hit = found.withColumn("_h", F.lit(1))
    r = (exact.join(hit, on=["query_id", "cand_id"], how="left")
         .agg((F.coalesce(F.sum("_h"), F.lit(0)) / F.count(F.lit(1)))
              .alias("r")).collect()[0].r)
    return round(r, 4)


def _adc_shortlist(spark, sf, codebook, limit) -> DataFrame:
    import ngrams_collocations_hadoop_spark.operators.similarity as S
    codes, qarr = S._pq_parts(spark, sf, codebook=codebook)
    scored = (codes.crossJoin(F.broadcast(qarr))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("approx", F.expr(S._PQ_ADC_EXPR)))
    w = Window.partitionBy("query_id").orderBy(F.desc("approx"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= limit)
            .select("query_id", F.col("vec_id").alias("cand_id")))


def _lloyd_ivf_cents(spark, sf, iters=2) -> DataFrame:
    """Float-mean Lloyd refinement of the stride-sampled IVF coarse
    quantizer (probe-only: no cross-engine exactness needed)."""
    import ngrams_collocations_hadoop_spark.operators.similarity as S
    e = S.load_finite_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = (e.filter(F.col("vec_id") % S.CENTROID_STRIDE == 0)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cv")))
    d2 = ("aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
          "0D, (a, t) -> a + t)")
    for _ in range(iters):
        assigned = (e.crossJoin(F.broadcast(cents))
                    .groupBy("vec_id")
                    .agg(F.expr(f"min(named_struct('d', {d2}, "
                                f"'c', cent_id))").alias("mk"),
                         F.first("v").alias("v")))
        upd = (assigned
               .select(F.col("mk.c").alias("cent_id"),
                       F.posexplode("v").alias("pos", "x"))
               .groupBy("cent_id", "pos").agg(F.avg("x").alias("cx"))
               .groupBy("cent_id")
               .agg(F.expr("transform(array_sort(collect_list("
                           "named_struct('pos', pos, 'cx', cx))), "
                           "s -> s.cx)").alias("cvn")))
        cents = (cents.join(upd, on="cent_id", how="left")
                 .select("cent_id", F.coalesce("cvn", "cv").alias("cv"))
                 .persist())
    return cents.select("cent_id", F.col("cv").alias("cent_emb"))


def _ivf_recall(spark, sf, cents=None) -> float:
    import ngrams_collocations_hadoop_spark.operators.similarity as S
    from ngrams_collocations_hadoop_spark.operators.dedup import cosine_expr
    e = S.load_finite_embeddings(spark, sf)
    if cents is None:
        cents = (e.filter(F.col("vec_id") % S.CENTROID_STRIDE == 0)
                 .select(F.col("vec_id").alias("cent_id"),
                         F.col("embedding").alias("cent_emb")))
    scored_cells = (e.select("vec_id", "embedding")
                    .crossJoin(F.broadcast(cents))
                    .withColumn("ccos", cosine_expr("embedding", "cent_emb"))
                    .select("vec_id", "embedding", "cent_id", "ccos"))
    wc = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                              F.asc("cent_id"))
    ranked = scored_cells.withColumn("r", F.row_number().over(wc))
    index = (ranked.filter(F.col("r") == 1)
             .select(F.col("vec_id").alias("cand_id"),
                     F.col("embedding").alias("c_emb"),
                     F.col("cent_id").alias("cell")))
    probes = (ranked.filter((F.col("vec_id") < S.N_QUERY_VECS)
                            & (F.col("r") <= S.NPROBE))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("q_emb"),
                      F.col("cent_id").alias("cell")))
    scored = (index.join(F.broadcast(probes), on="cell")
              .filter(F.col("cand_id") != F.col("query_id"))
              .withColumn("cosine", cosine_expr("q_emb", "c_emb")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("cand_id"))
    found = (scored.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= S.TOPK_NEIGHBORS)
             .select("query_id", "cand_id"))
    exact = S.q_cosine_topk(spark, sf).select("query_id", "cand_id")
    return _recall(exact, found)


def sample_sweep(sfs: list[str]) -> None:
    """The sample/full crossover for the PRODUCTION sampled-training
    path (VERDICT r08 #4): recall@10 of the ADC ranking and training
    wall time per sample budget, per scale factor — where does a
    fixed-budget Lloyd sample stop costing recall on this fixture?
    Results are recorded in SCALING.md."""
    import time

    from ngrams_collocations_hadoop_spark.session import get_spark
    import ngrams_collocations_hadoop_spark.operators.similarity as S

    spark = get_spark(app_name="probe_pq_sample_sweep")
    for sf in sfs:
        n_corpus = S.load_finite_embeddings(spark, sf).count()
        exact = S.q_cosine_topk(spark, sf).select("query_id", "cand_id")
        budgets = [b for b in (64, 128, 256, 512, 1024, 2048, 4096,
                               8192, 16384) if b < n_corpus]
        for b in budgets + [None]:
            # training time = materializing the codebook's own DAG
            # (what a production refresh pays); recall via the shared
            # ADC shortlist against the shared exact ground truth
            t0 = time.time()
            cb = S._pq_trained_codebook(spark, sf, sample=b)
            cb.collect()
            train_s = round(time.time() - t0, 2)
            r = _recall(exact, _adc_shortlist(
                spark, sf, cb, S.TOPK_NEIGHBORS))
            label = b if b is not None else f"full({n_corpus})"
            print(f"{sf}: sample={label} recall@10={r} "
                  f"train={train_s}s", flush=True)
        spark.catalog.clearCache()


def main() -> None:
    from ngrams_collocations_hadoop_spark.session import get_spark
    import ngrams_collocations_hadoop_spark.operators.similarity as S

    if sys.argv[1:2] == ["--sample-sweep"]:
        sample_sweep(sys.argv[2:] or ["/root/testdata/sf0.01",
                                      "/root/testdata/sf0.1"])
        return
    sfs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="probe_trained_quantizers")
    for sf in sfs:
        exact = S.q_cosine_topk(spark, sf).select("query_id", "cand_id")
        trained = S._pq_trained_codebook(spark, sf)
        flat_s = _recall(exact, _adc_shortlist(
            spark, sf, None, S.TOPK_NEIGHBORS))
        flat_t = _recall(exact, _adc_shortlist(
            spark, sf, trained, S.TOPK_NEIGHBORS))
        rr_s = _recall(exact, S._exact_refine(
            spark, sf, _adc_shortlist(spark, sf, None, S.PQ_RERANK_C))
            .select("query_id", "cand_id"))
        rr_t = _recall(exact, S._exact_refine(
            spark, sf, _adc_shortlist(spark, sf, trained, S.PQ_RERANK_C))
            .select("query_id", "cand_id"))
        ivf_s = _ivf_recall(spark, sf)
        ivf_t = _ivf_recall(spark, sf, _lloyd_ivf_cents(spark, sf))
        print(f"{sf}: flat_pq stride={flat_s} trained={flat_t} | "
              f"rerank stride={rr_s} trained={rr_t} | "
              f"ivf stride={ivf_s} lloyd2={ivf_t}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
