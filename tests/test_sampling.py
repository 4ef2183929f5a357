"""Sampling + splitting determinism (training-data pipeline staples)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ngrams_collocations_hadoop_spark.operators.textstats import (
    q_train_test_split, sample_stratified,
)
from ngrams_collocations_hadoop_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_split_is_deterministic_and_roughly_80_20(spark):
    a = q_train_test_split(spark, SF_SMALL)
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert total == 500
    assert 0.7 < counts["train"] / total < 0.9
    # stable across invocations (content-hash, no RNG)
    b = q_train_test_split(spark, SF_SMALL)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_group_sample_exactly_k_deterministic_and_group_limited(spark):
    """Exactly min(k, |group|) rows per (lang, source); byte-identical
    across runs; and the rank-<=-k filter must compile to
    WindowGroupLimitExec so each task prunes to k rows BEFORE the
    exchange."""
    from pyspark.sql import functions as F

    from ngrams_collocations_hadoop_spark.operators.textstats import (
        GROUP_SAMPLE_K, q_group_sample)
    from ngrams_collocations_hadoop_spark.plans.checks import assert_in_plan
    from ngrams_collocations_hadoop_spark.sources.tables import load_table
    sf = "/root/testdata/sf0.001"
    out = q_group_sample(spark, sf)
    sizes = {(r["lang"], r["source"]): r["n"] for r in
             load_table(spark, sf, "documents")
             .groupBy("lang", "source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {}
    for r in out.collect():
        got.setdefault((r["lang"], r["source"]), []).append(r["rank"])
    assert set(got) == set(sizes)
    for g, ranks in got.items():
        assert sorted(ranks) == list(
            range(1, min(GROUP_SAMPLE_K, sizes[g]) + 1))
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, q_group_sample(spark, sf).collect()))
    assert a == b
    assert_in_plan(out, "WindowGroupLimit")


def test_stratified_sample_deterministic_and_proportional(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    fr = {lang: 0.5 for lang in ["en", "es", "zh", "fr", "de"]}
    s1 = sample_stratified(docs, fr, seed=42)
    s2 = sample_stratified(docs, fr, seed=42)
    assert sorted(r["doc_id"] for r in s1.collect()) == \
           sorted(r["doc_id"] for r in s2.collect())
    n = s1.count()
    assert 0.3 * 500 < n < 0.7 * 500    # Bernoulli, loose bounds
    # different seed → different sample (overwhelmingly likely)
    s3 = sample_stratified(docs, fr, seed=7)
    assert sorted(r["doc_id"] for r in s3.collect()) != \
           sorted(r["doc_id"] for r in s1.collect())
