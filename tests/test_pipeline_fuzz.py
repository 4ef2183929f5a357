"""Property-based differential test: the full collocation pipeline vs
an independent pure-Python implementation of the same semantics, over
hypothesis-generated corpora. Catches semantic drift that fixed
fixtures cannot (random stopword hits, guard-branch inputs, cross-year
decade merges, join-drop cases)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ngrams_collocations_hadoop_spark.constants import STOPWORDS
from ngrams_collocations_hadoop_spark.functions.llr import llr_py
from ngrams_collocations_hadoop_spark.functions.text import clean_token_ref
from ngrams_collocations_hadoop_spark.operators import collocations as co
from ngrams_collocations_hadoop_spark.sources.tables import stopwords_df

from .test_collocations import BIG_SCHEMA, UNI_SCHEMA

# small vocab with cleanable variants so collisions + cleaning both fire
TOKENS = ["apple", "Pie_NOUN", "--tart--", "the", "a", "émigré", "x1",
          "", "...", "row"]
LANGS = ["en", "de"]
YEARS = [1999, 2000, 2005, 2013]

uni_row = st.tuples(st.sampled_from(LANGS), st.sampled_from(TOKENS),
                    st.sampled_from(YEARS), st.integers(-2, 9))
big_row = st.tuples(st.sampled_from(LANGS), st.sampled_from(TOKENS),
                    st.sampled_from(TOKENS), st.sampled_from(YEARS),
                    st.integers(-2, 9))


def _py_pipeline(uni_rows, big_rows):
    """Independent reimplementation of the reference semantics."""
    def ok(lang, tok, occ):
        w = clean_token_ref(tok)
        return (w if occ > 0 and w and w not in STOPWORDS.get(lang, ())
                else None)

    c1: dict = defaultdict(int)
    n: dict = defaultdict(int)
    for lang, tok, year, occ in uni_rows:
        w = ok(lang, tok, occ)
        if w is None:
            continue
        dec = (year // 10) * 10
        c1[(lang, dec, w)] += occ
        n[(lang, dec)] += occ
    c12: dict = defaultdict(int)
    for lang, t1, t2, year, occ in big_rows:
        w1, w2 = ok(lang, t1, occ), ok(lang, t2, occ)
        if w1 is None or w2 is None:
            continue
        dec = (year // 10) * 10
        c12[(lang, dec, w1, w2)] += occ
    scored = {}
    for (lang, dec, w1, w2), v12 in c12.items():
        v1 = c1.get((lang, dec, w1))
        v2 = c1.get((lang, dec, w2))
        if v1 is None or v2 is None:
            continue  # inner-join drop
        total = n[(lang, dec)]
        # guard filter (P7): identical to the valid predicate
        if not (v12 > 0 and v1 > 0 and v2 > 0 and total > 0
                and v1 - v12 >= 0 and v2 - v12 >= 0
                and total - v1 - v2 + v12 >= 0):
            continue
        scored[(lang, dec, w1, w2)] = (v1, v2, v12, total,
                                       llr_py(v1, v2, v12, total))
    return scored


@given(uni=st.lists(uni_row, min_size=0, max_size=25),
       big=st.lists(big_row, min_size=0, max_size=25))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pipeline_matches_python_reference(spark, uni, big):
    stop = stopwords_df(spark)
    uni_df = co.clean_unigrams(
        spark.createDataFrame(uni, UNI_SCHEMA) if uni
        else spark.createDataFrame([], UNI_SCHEMA), stop)
    big_df = co.clean_bigrams(
        spark.createDataFrame(big, BIG_SCHEMA) if big
        else spark.createDataFrame([], BIG_SCHEMA), stop)
    got_df = co.score_collocations(
        co.bigram_counts(big_df), co.unigram_counts(uni_df),
        co.totals(uni_df))
    got = {(r["lang"], r["decade"], r["w1"], r["w2"]):
           (r["c1"], r["c2"], r["c12"], r["n_total"], r["llr"])
           for r in got_df.collect()}
    expected = _py_pipeline(uni, big)
    assert set(got) == set(expected)
    for k, (e1, e2, e12, en, ellr) in expected.items():
        g1, g2, g12, gn, gllr = got[k]
        assert (g1, g2, g12, gn) == (e1, e2, e12, en), k
        assert gllr == pytest.approx(ellr, abs=1e-6), k


def test_empty_corpus_yields_empty_result(spark):
    stop = stopwords_df(spark)
    uni = co.clean_unigrams(spark.createDataFrame([], UNI_SCHEMA), stop)
    big = co.clean_bigrams(spark.createDataFrame([], BIG_SCHEMA), stop)
    out = co.top_collocations(co.score_collocations(
        co.bigram_counts(big), co.unigram_counts(uni), co.totals(uni)))
    assert out.count() == 0
    assert out.columns == ["lang", "decade", "bigram", "llr", "rank"]


def test_cache_counts_variant_identical(spark):
    a = co.q_scored(spark, "/root/testdata/sf0.001")
    b = co.q_scored(spark, "/root/testdata/sf0.001", cache_counts=True)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_ingest_pipeline_accounting(spark):
    """The shard summary's doc count must equal: quality-passing new
    docs minus (exact-dropped ∪ near-dropped) quality-passers — i.e.
    the composition drops exactly what its stages say it drops, no
    double counting across shards."""
    from pyspark.sql import functions as F

    from ngrams_collocations_hadoop_spark.operators.dedup import (
        NEW_BATCH_MOD, q_dedup_incremental_lsh,
    )
    from ngrams_collocations_hadoop_spark.operators.pipeline import (
        _quality_survivors, q_ingest_pipeline,
    )
    from ngrams_collocations_hadoop_spark.sources.tables import load_table
    from .conftest import SF_SMALL

    total = sum(r.n_docs for r in
                q_ingest_pipeline(spark, SF_SMALL).collect())

    q_new = {r.doc_id for r in _quality_survivors(spark, SF_SMALL)
             .filter(F.col("doc_id") % NEW_BATCH_MOD == 0).collect()}
    docs = load_table(spark, SF_SMALL, "documents") \
        .select("doc_id", F.md5("text").alias("fp")).collect()
    by_fp = {}
    for r in docs:
        by_fp.setdefault(r.fp, []).append(r.doc_id)
    exact = set()
    for ids in by_fp.values():
        for i in ids:
            if i % NEW_BATCH_MOD == 0 and any(
                    (j % NEW_BATCH_MOD != 0 or j < i)
                    and j != i for j in ids):
                exact.add(i)
    near = set()
    for r in q_dedup_incremental_lsh(spark, SF_SMALL).collect():
        if r.doc_match % NEW_BATCH_MOD == 0:
            near.add(r.doc_match)
        else:
            near.add(r.doc_new)
    assert total == len(q_new - exact - near)
