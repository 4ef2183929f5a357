"""The flagship pipeline: Top-K bigram collocations by log-likelihood
ratio per (lang, decade) — the full dataflow of the reference
(SURVEY.md §2.9), re-expressed Spark-first.

Reference mapping (all file:line cites are into /root/reference):

  stage                      reference                       here
  -------------------------  ------------------------------  -----------------------------
  token cleaning             NGramUtils.java:29-39           functions.text.clean_token
  occ>0 / empty-token drops  Job1.java:138,142,181,186       filters (pushed down)
  stopword anti-join         Job1.java:144,189               broadcast left_anti join
  decade bucketing           NGramUtils.java:8               functions.text.decade
  c1 agg (A2)                Job1.java:279-281               groupBy().sum()
  c12 agg (A3, *intended*)   Job1.java:282-292 (quirky)      exact groupBy().sum()
  N agg (A4)                 Job1.java:265-267,306-311       exact groupBy().sum()
  join on w1 (J1)            Job1.java:62-94,237-314 (~120   one .join() — Catalyst picks
                             LoC hand-rolled merge join)     SMJ/SHJ, AQE may rewrite
  join on w2 (J2)            Job2.java:51-84,192-251         one .join()
  broadcast N (J3)           Job2.java:168-190 (dist cache)  F.broadcast() hash join
  LLR (C1)                   LLR.java:16-47                  functions.llr.llr (codegen)
  NaN/guard drop (P7)        Job2.java:227,235-241           llr IS NOT NULL filter
  Top-100 / group (T1-T3)    Job3.java:56-110 (heap+comb.)   row_number window ≤ K
                                                             (WindowGroupLimitExec gives
                                                             the partial top-k push-down
                                                             the reference hand-wrote)

Deliberate divergences from reference quirks (SURVEY.md §4): exact c12
across map tasks, exact N at any parallelism, deterministic Top-K
tiebreak (llr desc, w1, w2).

Scale notes (100 TB): the raw record streams never materialize — clean +
filter + partial agg happen map-side before the first shuffle (the
reference's combiner, for free via HashAggregateExec). The two big joins
shuffle on (lang, decade, word) — high cardinality, well distributed
after stopword removal. N (≈ langs × decades rows) is broadcast. The
unigram-count subtree feeds three consumers (c1, c2, N); callers running
the full pipeline should pass ``cache_counts=True`` so it computes once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..constants import LLR_ROUND, TOP_K
from ..functions.exact import ieee_round
from ..functions.llr import llr, llr_named
from ..functions.text import clean_token, decade
from ..sources.ngram_source import (
    bigram_records,
    hebrew_bigram_records,
    hebrew_unigram_records,
    unigram_records,
)
from ..sources.tables import stopwords_df


# --- record-level transforms (DataFrame -> DataFrame) -------------------

def clean_unigrams(uni_raw: DataFrame, stop: DataFrame) -> DataFrame:
    """(lang, token, year, occurrences) -> (lang, decade, word, occ).

    Applies validity filters (occ > 0), token cleaning, empty-token drop,
    and the per-language stopword anti-join (broadcast).
    """
    cleaned = (
        uni_raw
        .filter(F.col("occurrences") > 0)
        .select(
            "lang",
            decade(F.col("year")).alias("decade"),
            clean_token(F.col("token")).alias("word"),
            F.col("occurrences").cast("long").alias("occ"),
        )
        .filter(F.col("word") != "")
    )
    return cleaned.join(F.broadcast(stop), on=["lang", "word"], how="left_anti")


def clean_bigrams(big_raw: DataFrame, stop: DataFrame,
                  carry: tuple[str, ...] = ()) -> DataFrame:
    """(lang, token1, token2, year, occurrences) -> (lang, decade, w1, w2, occ).

    A bigram is dropped when EITHER side cleans to empty or is a stopword
    for the record's language (reference Job1.java:189). ``carry`` names
    extra input columns to pass through untouched (the quirk surface
    carries ``doc_id`` as its map-task surrogate).
    """
    cleaned = (
        big_raw
        .filter(F.col("occurrences") > 0)
        .select(
            *carry,
            "lang",
            decade(F.col("year")).alias("decade"),
            clean_token(F.col("token1")).alias("w1"),
            clean_token(F.col("token2")).alias("w2"),
            F.col("occurrences").cast("long").alias("occ"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    stop1 = F.broadcast(stop.select("lang", F.col("word").alias("w1")))
    stop2 = F.broadcast(stop.select("lang", F.col("word").alias("w2")))
    return (
        cleaned
        .join(stop1, on=["lang", "w1"], how="left_anti")
        .join(stop2, on=["lang", "w2"], how="left_anti")
    )


# --- aggregations (A2/A3/A4 — exact at any parallelism) -----------------

def unigram_counts(uni: DataFrame) -> DataFrame:
    """c1 per (lang, decade, word). Partial agg before shuffle is
    automatic (HashAggregateExec partial→final), matching the
    reference's hand-written combiner (Job1.java:197-209)."""
    return (uni.groupBy("lang", "decade", "word")
            .agg(F.sum("occ").alias("c1")))


def bigram_counts(big: DataFrame) -> DataFrame:
    """c12 per (lang, decade, w1, w2) — the *intended* semantics of the
    reference's quirky partial-sum (SURVEY.md §4 quirk 1)."""
    return (big.groupBy("lang", "decade", "w1", "w2")
            .agg(F.sum("occ").alias("c12")))


def totals(uni: DataFrame) -> DataFrame:
    """N per (lang, decade) over stopword-filtered unigrams — exact at
    any parallelism (fixes reference quirk 2, Job2.java:185)."""
    return (uni.groupBy("lang", "decade")
            .agg(F.sum("occ").alias("n_total")))


# --- reference-quirk emulation (opt-in bit-parity mode) ------------------

QUIRK_REDUCERS = 4   # stands in for Job1's reducer count in quirk mode


def bigram_counts_quirk(big: DataFrame) -> DataFrame:
    """Quirk 1 (Job1.java:282-292): the reference reducer emits one P
    record PER INCOMING VALUE for a bigram key — i.e. per map-task
    partial (post-combiner) — and never re-sums across map tasks, so a
    bigram whose occurrences span map tasks yields SEVERAL fragmented
    c12 rows, each scored independently downstream. The Spark analogue
    of a map task is an input partition: summing per (key, partition)
    and never across reproduces the fragmentation. Inherently
    partitioning-dependent — that is the bug being emulated; the exact
    path (``bigram_counts``) is the intended semantics."""
    return (big.withColumn("_maptask", F.spark_partition_id())
            .groupBy("lang", "decade", "w1", "w2", "_maptask")
            .agg(F.sum("occ").alias("c12"))
            .drop("_maptask"))


def totals_quirk(c1_df: DataFrame,
                 reducers: int = QUIRK_REDUCERS) -> DataFrame:
    """Quirk 2 (Job2.java:185): each Job1 reducer emits its own partial
    N for (lang, decade), and Job2's setup loads them with
    ``NMap.put`` — overwrite, not sum — so the LAST cache file read
    wins and N is one reducer's partial, correct only at 1 reducer.
    Emulation: bucket each w1 group into ``reducers`` buckets by a
    deterministic hash (standing in for Hadoop's key partitioner), sum
    c1 per bucket, and keep the HIGHEST bucket id present per
    (lang, decade) — cache files are read in part-file order, so the
    last reducer's record lands last."""
    partials = (c1_df.withColumn(
                    "_rid", F.pmod(F.xxhash64("lang", "decade", "word"),
                                   F.lit(reducers)))
                .groupBy("lang", "decade", "_rid")
                .agg(F.sum("c1").alias("n_partial")))
    w = Window.partitionBy("lang", "decade").orderBy(F.desc("_rid"))
    return (partials.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("lang", "decade",
                    F.col("n_partial").alias("n_total")))


# --- deterministic quirk surface (driver-adjudicable bit-parity) ---------
#
# The spark_partition_id / xxhash64 forms above reproduce the bugs
# faithfully but are partitioning- or engine-dependent — fine for the
# in-session parity tests, unusable under the driver's cross-engine
# hash gate. These twins emulate the same two bug CLASSES with
# content-derived surrogates both engines can compute identically:
# a map task = a deterministic doc_id stripe (doc_id % M — an
# INTERLEAVED assignment, not the reference's contiguous byte-range
# splits; what matters for the bug class is only that one bigram's
# occurrences span several never-re-summed groups), a reducer id =
# an md5 bucket of the reduce key (standing in for Hadoop's
# HashPartitioner).

QUIRK_MAPTASKS = 4   # input-split count surrogate for quirk 1

_QUIRK_RID_SQL = (f"CAST(conv(substring(md5(concat(lang, '|', "
                  f"CAST(decade AS STRING), '|', word)), 1, 4), 16, 10) "
                  f"AS BIGINT) % {QUIRK_REDUCERS}")


def bigram_counts_quirk_det(big_with_doc: DataFrame) -> DataFrame:
    """Quirk 1 (Job1.java:282-292) with a deterministic map-task
    surrogate: fragment each bigram's c12 per doc_id stripe instead of
    per physical input partition — same fragmentation semantics (rows
    of one bigram spanning stripes never re-sum), reproducible in SQL."""
    return (big_with_doc
            .withColumn("_maptask", F.col("doc_id") % QUIRK_MAPTASKS)
            .groupBy("lang", "decade", "w1", "w2", "_maptask")
            .agg(F.sum("occ").alias("c12"))
            .drop("_maptask"))


def totals_quirk_det(c1_df: DataFrame) -> DataFrame:
    """Quirk 2 (Job2.java:185) with a deterministic reducer surrogate:
    bucket words by an md5 hash of the reduce key, sum c1 per bucket,
    keep the highest bucket id present per (lang, decade) — the
    last-cache-file-wins overwrite, reproducible in both engines."""
    partials = (c1_df.withColumn("_rid", F.expr(_QUIRK_RID_SQL))
                .groupBy("lang", "decade", "_rid")
                .agg(F.sum("c1").alias("n_partial")))
    w = Window.partitionBy("lang", "decade").orderBy(F.desc("_rid"))
    return (partials.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("lang", "decade",
                    F.col("n_partial").alias("n_total")))


# --- joins + scoring (J1/J2/J3 + C1 + P7) -------------------------------

def score_collocations(c12_df: DataFrame, c1_df: DataFrame,
                       totals_df: DataFrame) -> DataFrame:
    """Attach c1 (join on w1), c2 (join on w2), N (broadcast), compute
    LLR, drop guard violations.

    Output: (lang, decade, w1, w2, c1, c2, c12, n_total, llr) with llr
    rounded to LLR_ROUND decimals (cross-engine float comparability).
    Rounding uses ``ieee_round`` (floor(x*1e6 + 0.5)/1e6), not
    ``F.round``: round(DOUBLE) takes Spark's per-row BigDecimal HALF_UP
    path (~3.7x the floor form per row — the single hottest expression
    at corpus scale), while the floor form is pure IEEE arithmetic
    inside whole-stage codegen and bit-identical in both engines
    (oracle.py emits the same text; llr is ln-irrational so a
    half-boundary value has ~2^-52 probability either way).
    """
    u1 = c1_df.select("lang", "decade",
                      F.col("word").alias("w1"), "c1")
    u2 = c1_df.select("lang", "decade",
                      F.col("word").alias("w2"),
                      F.col("c1").alias("c2"))
    c1c, c2c, c12c, nc = (F.col("c1"), F.col("c2"), F.col("c12"),
                          F.col("n_total"))
    # Filter on the integer guard predicates, NOT on llr IS NOT NULL:
    # llr is NULL exactly when these fail, but a null-check on the llr
    # column would be pushed into the join condition with the whole LLR
    # expression inlined — evaluating it twice and bloating codegen past
    # JIT limits. The guards are cheap int comparisons.
    valid = (
        (c12c > 0) & (c1c > 0) & (c2c > 0) & (nc > 0)
        & (c1c - c12c >= 0) & (c2c - c12c >= 0)
        & (nc - c1c - c2c + c12c >= 0)
    )
    scored = (
        c12_df
        .join(u1, on=["lang", "decade", "w1"], how="inner")
        .join(u2, on=["lang", "decade", "w2"], how="inner")
        .join(F.broadcast(totals_df), on=["lang", "decade"], how="inner")
        .filter(valid)
        # Two-step projection: _llr_raw is referenced 3x by ieee_round's
        # guard; the raw alias keeps LLR single-eval (CollapseProject
        # refuses to inline a non-cheap alias referenced >1x, and codegen
        # subexpression elimination covers it regardless). llr_named is
        # the process-cached constant tree (same expression, built once
        # — r10 driver-overhead cut, see functions/llr.py).
        .withColumn("_llr_raw", llr_named("c1", "c2", "c12", "n_total"))
        .withColumn("llr", ieee_round(F.col("_llr_raw"), LLR_ROUND))
    )
    return scored.select("lang", "decade", "w1", "w2",
                         "c1", "c2", "c12", "n_total", "llr")


def top_collocations(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """Top-K per (lang, decade) by llr desc, deterministic tiebreak
    (w1, w2). Spark ≥3.5 compiles the row_number-≤-k filter into
    WindowGroupLimitExec — a partial top-k before the shuffle, exactly
    the reference's Top-K combiner (Job3.java:83-93) for free.

    Output: (lang, decade, bigram, llr, rank).
    """
    w = (Window.partitionBy("lang", "decade")
         .orderBy(F.desc("llr"), F.asc("w1"), F.asc("w2")))
    return (
        scored
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("lang", "decade",
                F.concat_ws(" ", "w1", "w2").alias("bigram"),
                "llr", "rank")
    )


# --- whole-pipeline wrappers (spark, sf_dir) -> DataFrame ----------------

def _cleaned_inputs(spark: SparkSession, sf_dir: str):
    from ..sources.ngram_source import _docs_with_tokens

    stop = stopwords_df(spark)
    # one shared source subtree for both record streams (r10 driver-
    # overhead cut; plan-identical — see unigram_records)
    docs = _docs_with_tokens(spark, sf_dir)
    uni = clean_unigrams(unigram_records(spark, sf_dir, docs=docs), stop)
    big = clean_bigrams(bigram_records(spark, sf_dir, docs=docs), stop)
    return uni, big

def q_unigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    uni, _ = _cleaned_inputs(spark, sf_dir)
    return unigram_counts(uni)


def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, big = _cleaned_inputs(spark, sf_dir)
    return bigram_counts(big)


def q_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    uni, _ = _cleaned_inputs(spark, sf_dir)
    return totals(uni)


def q_scored(spark: SparkSession, sf_dir: str,
             cache_counts: bool = False,
             quirk_mode: bool = False) -> DataFrame:
    """``quirk_mode=True`` opts into bit-parity with the reference's
    two bugs (SURVEY.md §4 quirks 1-2): fragmented c12 partials and a
    single-reducer N, via ``bigram_counts_quirk`` / ``totals_quirk``.
    Default is the intended-exact semantics."""
    uni, big = _cleaned_inputs(spark, sf_dir)
    c1_df = unigram_counts(uni)
    if cache_counts:
        # c1 feeds three consumers (J1 probe, J2 probe as c2, N);
        # at scale, computing the unigram-count subtree once matters.
        c1_df = c1_df.persist()
    if quirk_mode:
        c12_df = bigram_counts_quirk(big)
        totals_df = totals_quirk(c1_df)
    else:
        c12_df = bigram_counts(big)
        # N = Σ c1 — rolls up from the (possibly cached) counts instead
        # of re-scanning the raw unigram stream (algebraically identical).
        totals_df = (c1_df.groupBy("lang", "decade")
                     .agg(F.sum("c1").alias("n_total")))
    return score_collocations(c12_df, c1_df, totals_df)


def q_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K,
           quirk_mode: bool = False) -> DataFrame:
    return top_collocations(q_scored(spark, sf_dir,
                                     quirk_mode=quirk_mode), k)


def q_topk_quirk(spark: SparkSession, sf_dir: str,
                 k: int = TOP_K) -> DataFrame:
    """The flagship Top-K under DETERMINISTIC quirk emulation — the
    driver-adjudicable form of the reference's two bugs (SURVEY.md §4):
    fragmented per-map-task c12 partials (quirk 1, map task = doc_id
    block) and a single-reducer N (quirk 2, reducer = md5 bucket of
    the reduce key, last file wins). The output projection (lang,
    decade, bigram, llr, rank) collapses fragment identity: fragments
    of one bigram that round to the same llr yield IDENTICAL output
    rows, so rank assignment among them cannot flap the hash.

    ``q_topk(quirk_mode=True)`` remains the physically-faithful form
    (real input partitions via spark_partition_id); this one trades
    that fidelity for a cross-engine-reproducible surrogate."""
    from ..sources.ngram_source import _docs_with_tokens

    stop = stopwords_df(spark)
    docs = _docs_with_tokens(spark, sf_dir)   # shared subtree (r10)
    uni = clean_unigrams(unigram_records(spark, sf_dir, docs=docs), stop)
    big = clean_bigrams(bigram_records(spark, sf_dir, keep_doc=True,
                                       docs=docs),
                        stop, carry=("doc_id",))
    c1_df = unigram_counts(uni)
    scored = score_collocations(bigram_counts_quirk_det(big), c1_df,
                                totals_quirk_det(c1_df))
    return top_collocations(scored, k)


def q_hebrew_topk(spark: SparkSession, sf_dir: str,
                  k: int = TOP_K) -> DataFrame:
    """The full flagship pipeline over the derived Hebrew corpus
    (lang='he', RTL script) with the Hebrew stopword list — the
    reference's second-corpus surface (its heb stopword block in
    ``Stopwords.java``; EMR run in ``Analysis.md``). Exercises clean →
    stopword anti-join → counts → joins → LLR → Top-K end to end on
    non-Latin text; same operators, different codepoint plane."""
    from ..sources.ngram_source import (_docs_with_tokens,
                                        HEBREW_TEXT_SQL, HEBREW_WHERE_SQL)

    stop = stopwords_df(spark)
    docs = _docs_with_tokens(spark, sf_dir, HEBREW_TEXT_SQL, "'he'",
                             HEBREW_WHERE_SQL)   # shared subtree (r10)
    uni = clean_unigrams(unigram_records(spark, sf_dir, docs=docs), stop)
    big = clean_bigrams(bigram_records(spark, sf_dir, docs=docs), stop)
    c1_df = unigram_counts(uni)
    totals_df = (c1_df.groupBy("lang", "decade")
                 .agg(F.sum("c1").alias("n_total")))
    scored = score_collocations(bigram_counts(big), c1_df, totals_df)
    return top_collocations(scored, k)
