"""Generalized n-grams, P2 bigram-field splitting, end-to-end pipeline
from the real record format, observe counters, approx-agg bounds."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from ngrams_collocations_hadoop_spark.operators import collocations as co
from ngrams_collocations_hadoop_spark.operators.ngrams import (
    ngram_records, split_bigram_field,
)
from ngrams_collocations_hadoop_spark.plans.observe import with_row_counter
from ngrams_collocations_hadoop_spark.sources.formats import read_ngram_tsv
from ngrams_collocations_hadoop_spark.sources.tables import (
    load_table, stopwords_df,
)


def test_split_bigram_field(spark):
    recs = spark.createDataFrame(
        [("high school", 1995, 42), ("single", 1995, 3),
         ("a b c", 1995, 4), ("  padded  pair ", 2001, 5)],
        ["ngram", "year", "occurrences"])
    got = {(r["token1"], r["token2"]) for r in split_bigram_field(recs).collect()}
    # exactly-two-token rows survive (reference Job1.java:170-171)
    assert got == {("high", "school"), ("padded", "pair")}


def test_ngram_records_n4_window_shape(spark):
    recs = ngram_records(spark, "/root/testdata/sf0.001", 4)
    r = recs.first()
    assert len(r["grams"]) == 4
    # total 4-gram count == Σ max(len-3, 0) over docs
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    expected = docs.select(
        F.sum(F.greatest(F.size(F.split("text", " ")) - 3, F.lit(0)))
    ).first()[0]
    assert recs.count() == expected


def test_end_to_end_from_tsv_records(spark):
    """The reference's actual input path: TSV ngram records → P2 split →
    clean → counts → joins → LLR → Top-K, producing a hand-checkable
    result."""
    d = tempfile.mkdtemp(prefix="e2e_tsv_")
    with open(f"{d}/uni.tsv", "w") as f:
        f.write("apple\t2003\t10\npie_NOUN\t2003\t8\nthe\t2003\t99\n"
                "tart\t2004\t3\nbad_row\n")
    with open(f"{d}/big.tsv", "w") as f:
        f.write("apple pie\t2003\t4\nthe apple\t2003\t9\n"
                "apple tart\t2004\t1\nonly_one_token\t2003\t5\n")
    uni_raw = (read_ngram_tsv(spark, f"{d}/uni.tsv", lang="en")
               .withColumnRenamed("ngram", "token"))
    big_raw = split_bigram_field(read_ngram_tsv(spark, f"{d}/big.tsv",
                                                lang="en"))
    stop = stopwords_df(spark)
    uni = co.clean_unigrams(uni_raw, stop)
    big = co.clean_bigrams(big_raw, stop)
    scored = co.score_collocations(
        co.bigram_counts(big), co.unigram_counts(uni), co.totals(uni))
    top = co.top_collocations(scored, k=10).collect()
    got = {r["bigram"]: r for r in top}
    # 'the apple' dropped (stopword); 'only_one_token' dropped (P2);
    # survivors: apple pie (2000s), apple tart (2000s)
    assert set(got) == {"apple pie", "apple tart"}
    from ngrams_collocations_hadoop_spark.functions.llr import llr_py
    # N = 10 (apple) + 8 (pie) + 3 (tart) = 21; ranks follow llr_py
    expected_order = sorted(
        [("apple pie", llr_py(10, 8, 4, 21)),
         ("apple tart", llr_py(10, 3, 1, 21))],
        key=lambda kv: -kv[1])
    for rank, (bigram, score) in enumerate(expected_order, start=1):
        assert got[bigram]["rank"] == rank
        assert got[bigram]["llr"] == pytest.approx(score, abs=1e-6)


def test_observe_counters_match_totals(spark):
    """X4 parity: inline metrics equal the separately-computed totals
    (reference StatisticalReport counter semantics)."""
    stop = stopwords_df(spark)
    from ngrams_collocations_hadoop_spark.sources.ngram_source import (
        unigram_records,
    )
    uni = co.clean_unigrams(
        unigram_records(spark, "/root/testdata/sf0.001"), stop)
    observed, obs = with_row_counter(uni, "uni_clean")
    n_df = co.totals(observed)
    got_n = {(r["lang"], r["decade"]): r["n_total"] for r in n_df.collect()}
    metrics = obs.get
    # the inline counter equals an independent count of the same stage
    assert metrics["n_rows"] == uni.count()
    assert sum(got_n.values()) == uni.select(F.sum("occ")).first()[0]


def test_approx_count_distinct_bounded_error(spark):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    row = li.select(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact")).first()
    assert row["approx"] == pytest.approx(row["exact"], rel=0.1)


def test_kn_condprob_is_a_subprobability_per_context(spark):
    """Interpolated KN invariant: over the OBSERVED continuations of
    each (lang, decade, w1) context the probabilities sum to at most 1
    (equality only when every continuation type follows this context —
    the remainder is exactly the mass KN reserves for unseen w2), and
    every probability is strictly positive (the continuation term
    guarantees it even at the discount floor)."""
    from ngrams_collocations_hadoop_spark.operators.ngrams import (
        q_kn_condprob)

    rows = q_kn_condprob(spark, "/root/testdata/sf0.001").collect()
    assert rows
    sums: dict = {}
    for r in rows:
        assert r.p_kn > 0, r
        k = (r.lang, r.decade, r.w1)
        sums[k] = sums.get(k, 0.0) + r.p_kn
    worst = max(sums.values())
    assert worst <= 1.0 + 1e-3, worst   # 6-dp rounding slack
