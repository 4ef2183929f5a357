"""Text-analysis operators for a training-data pipeline: token
counting, quality scoring, heuristic language ID, and document
fingerprinting. All pure column expressions with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import (ieee_round, ieee_round_sql,
                               uavg, uavg_sql, usum, usum_sql)

from ..constants import LANGS, STOPWORDS, _LANG_EXTRA
from ..sources.tables import fan_out, load_table

# Language-marker words (one distinctive word per language, from the
# shared constants) drive the heuristic language-ID score.
_MARKERS: dict[str, str] = {lang: _LANG_EXTRA[lang][0] for lang in LANGS}

_CORE_STOP_LIST = sorted(set(STOPWORDS["en"]) & set(STOPWORDS["de"]))


def _sql_str_array(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, regex word tokens (a BPE-ish
    letter-run segmentation), distinct tokens, char count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[\\p{L}]+', 0)"))
        .cast("long").alias("n_word_tokens"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )


ORACLE_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[\p{L}]+', 0)) AS BIGINT)
           AS n_word_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_computed
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score heuristics: mean token length, stopword ratio,
    type-token ratio, and a blended score. The score formula is the
    operator under test; its weights are illustrative."""
    stop_arr = F.array(*[F.lit(w) for w in _CORE_STOP_LIST])
    docs = load_table(spark, sf_dir, "documents") \
        .withColumn("tokens", F.split("text", " "))
    n_tok = F.size("tokens")
    # sum(len(token)) == length(text) - (n_tok - 1): splitting on a
    # single space partitions the string, so token chars = total chars
    # minus the separators. Two scalar ops replace a per-token lambda
    # pass (the array-lambda was this query's hottest expression).
    mean_len = (F.length("text") - n_tok + 1).cast("double") / n_tok
    stop_ratio = (F.size(F.filter("tokens",
                                  lambda t: F.array_contains(stop_arr, t)))
                  .cast("double") / n_tok)
    ttr = F.size(F.array_distinct("tokens")).cast("double") / n_tok
    score = (F.least(mean_len / 10, F.lit(1.0)) * 0.3
             + (1 - stop_ratio) * 0.3 + ttr * 0.4)
    return docs.select(
        "doc_id", "lang",
        ieee_round(mean_len, 6).alias("mean_token_len"),
        ieee_round(stop_ratio, 6).alias("stopword_ratio"),
        ieee_round(ttr, 6).alias("type_token_ratio"),
        ieee_round(score, 6).alias("quality_score"),
    )


ORACLE_TEXT_QUALITY = f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS tokens
           FROM documents),
m AS (
    SELECT doc_id, lang,
           list_sum(list_transform(tokens, t -> length(t)))::DOUBLE
             / len(tokens) AS mean_len,
           len(list_filter(tokens,
               t -> list_contains({_sql_str_array(_CORE_STOP_LIST)}, t)))::DOUBLE
             / len(tokens) AS stop_ratio,
           len(list_distinct(tokens))::DOUBLE / len(tokens) AS ttr
    FROM d)
SELECT doc_id, lang,
       CASE WHEN abs((mean_len)) < 4e9 THEN floor((mean_len) * 1e6 + 0.5E0) / 1e6 ELSE (mean_len) END AS mean_token_len,
       CASE WHEN abs((stop_ratio)) < 4e9 THEN floor((stop_ratio) * 1e6 + 0.5E0) / 1e6 ELSE (stop_ratio) END AS stopword_ratio,
       CASE WHEN abs((ttr)) < 4e9 THEN floor((ttr) * 1e6 + 0.5E0) / 1e6 ELSE (ttr) END AS type_token_ratio,
       CASE WHEN abs((least(mean_len / 10, 1.0) * 0.3
             + (1 - stop_ratio) * 0.3 + ttr * 0.4)) < 4e9 THEN floor((least(mean_len / 10, 1.0) * 0.3
             + (1 - stop_ratio) * 0.3 + ttr * 0.4) * 1e6 + 0.5E0) / 1e6 ELSE (least(mean_len / 10, 1.0) * 0.3
             + (1 - stop_ratio) * 0.3 + ttr * 0.4) END AS quality_score
FROM m
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: score each language by occurrences of its
    marker words; predict the argmax (deterministic tiebreak: lang asc);
    'und' when no marker occurs. The marker table is broadcast — the
    per-language profile join pattern scales to real n-gram profiles."""
    docs = load_table(spark, sf_dir, "documents") \
        .withColumn("tokens", F.split("text", " "))
    def marker_count(marker: str):
        # factory closure: a two-arg lambda would be read by F.filter as
        # the (element, index) variant
        return F.size(F.filter("tokens", lambda t: t == F.lit(marker)))

    scores = [
        marker_count(marker).cast("long").alias(f"score_{lang}")
        for lang, marker in _MARKERS.items()
    ]
    scored = docs.select("doc_id", F.col("lang").alias("true_lang"), *scores)
    # argmax via greatest + chained when (deterministic: first lang wins ties)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANGS])
    pred = F.lit("und")
    for lang in sorted(LANGS, reverse=True):
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best),
                      F.lit(lang)).otherwise(pred)
    return scored.select(
        "doc_id", "true_lang", pred.alias("pred_lang"),
        best.alias("best_score"))


def _oracle_lang_id() -> str:
    score_cols = ",\n           ".join(
        f"CAST(len(list_filter(tokens, t -> t = '{m}')) AS BIGINT) AS score_{lang}"
        for lang, m in _MARKERS.items())
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in LANGS) + ")"
    pred = "'und'"
    for lang in sorted(LANGS, reverse=True):
        pred = (f"CASE WHEN {best} > 0 AND score_{lang} = {best} "
                f"THEN '{lang}' ELSE {pred} END")
    return f"""
WITH d AS (SELECT doc_id, lang AS true_lang, string_split(text, ' ') AS tokens
           FROM documents),
s AS (
    SELECT doc_id, true_lang,
           {score_cols}
    FROM d)
SELECT doc_id, true_lang, {pred} AS pred_lang, {best} AS best_score
FROM s
"""


ORACLE_LANG_ID = _oracle_lang_id()


def q_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional tokenization (P1 with ordinality): one row per
    (doc, position, token) — the exploded long format downstream NLP
    pipelines key on."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long")))


ORACLE_TOKEN_POSITIONS = """
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ts[i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) d,
     UNNEST(range(1, len(ts) + 1)) AS u(i)
"""


# THE split rule — one definition, three consumers (split export,
# contamination check, KL drift). Content-hash bucket 0-9; < SPLIT_TRAIN_BUCKETS
# -> train. Spark and DuckDB forms parse the same md5 prefix to the
# same integer, so the assignment is engine-identical.
SPLIT_TRAIN_BUCKETS = 8


def split_is_train() -> F.Column:
    return (F.conv(F.substring(F.md5("text"), 1, 6), 16, 10)
            .cast("long") % 10) < SPLIT_TRAIN_BUCKETS


SPLIT_IS_TRAIN_SQL = ("CAST(('0x' || substring(md5(text), 1, 6)) "
                      f"AS BIGINT) % 10 < {SPLIT_TRAIN_BUCKETS}")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash split (a training-data staple): the
    assignment depends only on the document text (stable across runs,
    cluster layouts, and engines — md5 is identical everywhere), not on
    row order or RNG state. ~80/20 by construction."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        F.when(split_is_train(), F.lit("train")).otherwise(F.lit("test"))
        .alias("split"))


ORACLE_TRAIN_TEST_SPLIT = f"""
SELECT doc_id, lang,
       CASE WHEN {SPLIT_IS_TRAIN_SQL}
            THEN 'train' ELSE 'test' END AS split
FROM documents
"""


def sample_stratified(docs: DataFrame, fractions: dict[str, float],
                      seed: int = 42) -> DataFrame:
    """Per-language stratified sample (df.sampleBy) — deterministic for
    a fixed seed and input; no SQL oracle (Bernoulli sampling RNG is
    engine-specific), pinned by unit tests instead."""
    return docs.sampleBy("lang", fractions, seed=seed)


# Per-stratum keep rates for the registry query, in 1/256ths of the
# hash space (md5 first byte < threshold): en 50%, others 25%.
STRAT_RATES = {"en": 128, "es": 64, "zh": 64, "fr": 64, "de": 64}
STRAT_DEFAULT_RATE = 32


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash stratified sampling: keep a document when its md5
    first byte falls below the stratum's threshold — per-language rates
    with no RNG, so the sample is identical across runs, engines,
    partitionings, and (critically for training pipelines) across
    incremental re-runs over a growing corpus. Map-side filter + one
    bounded groupBy; at 100 TB this is a single scan.

    The hex-string comparison IS the threshold test (fixed-width hex
    compares lexicographically like the underlying integer) — engine-
    portable with no integer conversion."""
    docs = load_table(spark, sf_dir, "documents")
    expr = None
    for lang, rate in STRAT_RATES.items():
        cond = (F.col("lang") == lang)
        expr = F.when(cond, F.lit(f"{rate:02x}")) if expr is None \
            else expr.when(cond, F.lit(f"{rate:02x}"))
    thresh = expr.otherwise(F.lit(f"{STRAT_DEFAULT_RATE:02x}"))
    kept = docs.filter(F.substring(F.md5("text"), 1, 2) < thresh)
    return (kept.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


def _oracle_stratified() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN '{rate:02x}'"
        for lang, rate in STRAT_RATES.items())
    return f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents
WHERE substring(md5(text), 1, 2) <
      (CASE lang {cases} ELSE '{STRAT_DEFAULT_RATE:02x}' END)
GROUP BY lang
"""


ORACLE_STRATIFIED_SAMPLE = _oracle_stratified()


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set plus
    a coarse length bucket — the join key for fingerprint-based dedup.

    NULL text yields a NULL fingerprint: ``concat_ws`` SKIPS null
    arguments (yielding md5('') — a value that would collide all null
    docs into one dup group) while the oracle's ``array_to_string``
    null-propagates, so the null case is made explicit rather than
    letting the two engines' different null idioms diverge."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_sort(F.array_distinct(F.split("text", " ")))
    return docs.select(
        "doc_id",
        F.when(F.col("text").isNotNull(),
               F.md5(F.concat_ws(" ", toks))).alias("fingerprint"),
        F.expr("length(text) div 100").alias("len_bucket"),
    )


ORACLE_FINGERPRINT = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           string_split(text, ' '))), ' ')) AS fingerprint,
       length(text) // 100 AS len_bucket
FROM documents
"""


# --- PII redaction --------------------------------------------------------

# Regexes restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): char classes, bounded repetition, \b \d.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (training-data compliance staple).

    The synthetic corpus contains no PII, so the query deterministically
    plants an email and a phone number derived from ``doc_id`` before
    scanning — both engines see the same input, and the redaction
    regexes are exercised on real matches rather than vacuously.
    Pure ``regexp_replace``/``regexp_extract_all`` column expressions:
    map-side only, no shuffle, whole-stage codegen at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    red = F.regexp_replace(
        F.regexp_replace(synth, F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(PII_PHONE_RE), F.lit("<PHONE>"))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(synth, F.lit(PII_EMAIL_RE), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(synth, F.lit(PII_PHONE_RE), F.lit(0)))
        .alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("long").alias("redacted_len"),
    )


ORACLE_PII_REDACT = rf"""
WITH s AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS synth
    FROM documents),
r AS (
    SELECT doc_id, synth,
           regexp_replace(regexp_replace(synth,
               '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_PHONE_RE}', '<PHONE>', 'g') AS red
    FROM s)
SELECT doc_id,
       CAST(len(regexp_extract_all(synth, '{PII_EMAIL_RE}')) AS INT)
           AS n_emails,
       CAST(len(regexp_extract_all(synth, '{PII_PHONE_RE}')) AS INT)
           AS n_phones,
       md5(red) AS redacted_md5,
       CAST(length(red) AS BIGINT) AS redacted_len
FROM r
"""


# --- repetition-based quality filtering (Gopher-style) ---------------------

# Thresholds sit inside the fixture corpus's observed ranges
# (top-token fraction 0.05-0.25, top-bigram fraction 0.01-0.14) so the
# flag genuinely partitions the data at every sf.
REP_TOP_TOKEN_MAX = 0.12
REP_TOP_BIGRAM_MAX = 0.05


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter in the style of the Gopher rules
    (Rae et al. 2021, "Scaling Language Models", Table A1): flag
    documents dominated by their most frequent token or bigram.

    Scale shape: token/bigram generation is map-side array work; the
    two count aggregations carry partially-aggregated (doc_id, gram)
    pairs — bounded per document by its vocabulary, not its length.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents")) \
        .withColumn("ts", F.split("text", " "))
    toks = docs.select("doc_id", F.explode("ts").alias("tok"))
    tok_stat = (toks.groupBy("doc_id", "tok")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("doc_id")
                .agg(F.max("c").alias("max_tok_c"),
                     F.sum("c").alias("n_tok")))
    # sequence() guard: sequence(0, -1) yields a DESCENDING ramp, not
    # an empty array — single-token docs must short-circuit to [].
    bigrams = F.when(
        F.size("ts") >= 2,
        F.expr("transform(sequence(0, size(ts) - 2),"
               " i -> concat(ts[i], ' ', ts[i + 1]))")
    ).otherwise(F.array().cast("array<string>"))
    big_stat = (docs.select("doc_id", F.explode(bigrams).alias("big"))
                .groupBy("doc_id", "big")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("doc_id")
                .agg(F.max("c").alias("max_big_c"),
                     F.sum("c").alias("n_big")))
    ttf = ieee_round(F.col("max_tok_c").cast("double") / F.col("n_tok"), 6)
    tbf = ieee_round(F.col("max_big_c").cast("double") / F.col("n_big"), 6)
    return (tok_stat.join(big_stat, "doc_id")
            .select("doc_id",
                    ttf.alias("top_token_frac"),
                    tbf.alias("top_bigram_frac"),
                    ((ttf > REP_TOP_TOKEN_MAX)
                     | (tbf > REP_TOP_BIGRAM_MAX))
                    .cast("int").alias("repetitive")))


ORACLE_REPETITION = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
tok AS (SELECT doc_id, unnest(ts) AS tok FROM d),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
tstat AS (SELECT doc_id, max(c) AS max_tok_c, CAST(sum(c) AS BIGINT) AS n_tok
          FROM tc GROUP BY 1),
big AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS big
        FROM d, UNNEST(range(1, len(ts))) AS u(i)),
bc AS (SELECT doc_id, big, count(*) AS c FROM big GROUP BY 1, 2),
bstat AS (SELECT doc_id, max(c) AS max_big_c, CAST(sum(c) AS BIGINT) AS n_big
          FROM bc GROUP BY 1)
SELECT doc_id,
       CASE WHEN abs((max_tok_c::DOUBLE / n_tok)) < 4e9 THEN floor((max_tok_c::DOUBLE / n_tok) * 1e6 + 0.5E0) / 1e6 ELSE (max_tok_c::DOUBLE / n_tok) END AS top_token_frac,
       CASE WHEN abs((max_big_c::DOUBLE / n_big)) < 4e9 THEN floor((max_big_c::DOUBLE / n_big) * 1e6 + 0.5E0) / 1e6 ELSE (max_big_c::DOUBLE / n_big) END AS top_bigram_frac,
       CAST(CASE WHEN abs((max_tok_c::DOUBLE / n_tok)) < 4e9 THEN floor((max_tok_c::DOUBLE / n_tok) * 1e6 + 0.5E0) / 1e6 ELSE (max_tok_c::DOUBLE / n_tok) END > {REP_TOP_TOKEN_MAX}
            OR CASE WHEN abs((max_big_c::DOUBLE / n_big)) < 4e9 THEN floor((max_big_c::DOUBLE / n_big) * 1e6 + 0.5E0) / 1e6 ELSE (max_big_c::DOUBLE / n_big) END > {REP_TOP_BIGRAM_MAX}
            AS INT) AS repetitive
FROM tstat JOIN bstat USING (doc_id)
"""


# --- BM25 relevance scoring ----------------------------------------------

# Fixed query-term set for the registry query (common fixture-vocabulary
# terms with high document frequency, so every sf produces a dense,
# discriminating score distribution).
BM25_QUERY_TERMS = ("join", "filter", "scan")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(docs: DataFrame, query_terms=BM25_QUERY_TERMS,
                k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Okapi BM25 document scores for a fixed query-term set.

    Scale shape: the term filter is applied BEFORE the tf aggregation
    (only query-term postings ever shuffle); corpus stats (N, avgdl)
    and per-term document frequencies are tiny aggregates broadcast
    back onto the postings — no driver-side collect. idf uses the
    BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)), always positive.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    tf = (toks.filter(F.col("term").isin(*query_terms))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(dl, on="doc_id")
              .join(F.broadcast(df_t), on="term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    term_score = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    return (scored.withColumn("term_score", term_score)
            .groupBy("doc_id")
            .agg(usum("term_score", scale=6, unit="1e12", fn="floor",
                      huge="DECIMAL(38,0)").alias("bm25"),
                 F.count(F.lit(1)).alias("n_terms_matched")))


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scores(load_table(spark, sf_dir, "documents"))


ORACLE_BM25 = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents),
dl AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM toks WHERE term IN {tuple(BM25_QUERY_TERMS)}
    GROUP BY doc_id, term),
df_t AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT doc_id,
       {usum_sql("ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                 " * (tf * (" + str(BM25_K1) + " + 1)) /"
                 " (tf + " + str(BM25_K1) + " * (1 - " + str(BM25_B)
                 + " + " + str(BM25_B) + " * dl / avgdl))",
                 scale=6, unit="1e12", fn="floor")} AS bm25,
       CAST(count(*) AS BIGINT) AS n_terms_matched
FROM tf JOIN dl USING (doc_id) JOIN df_t USING (term) CROSS JOIN stats
GROUP BY doc_id
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling report per (lang, source): the first query any
    training-data pipeline runs against a new crawl — document counts,
    token and char volumes, and length extremes. Pure partial-agg
    groupBy: shuffle rows bounded by the (lang, source) cardinality."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    return (docs.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(n_tok).alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


ORACLE_CORPUS_STATS = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang, source
"""


# --- TF-IDF keyword extraction -------------------------------------------

TFIDF_TOPK = 5


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOPK`` TF-IDF terms per document (smoothed idf:
    ln((N+1)/(df+1)) + 1 — always positive, no zero-division).

    Scale shape: tf is a partial-agg groupBy on (doc_id, term); the
    document-frequency table is bounded by the vocabulary and broadcast
    back onto the postings, the corpus size N is a one-row broadcast,
    and the per-document top-k cuts via WindowGroupLimit before the
    rank shuffle. Nothing driver-side, no quadratic term."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tfidf = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
    scored = (tf.join(F.broadcast(df_t), on="term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf", tfidf))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.desc("tfidf"), F.asc("term")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TFIDF_TOPK)
            .select("doc_id", "term", "tf",
                    F.round("tfidf", 6).alias("tfidf"), "rank"))


ORACLE_TFIDF = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
df_t AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
    SELECT doc_id, term, tf,
           tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
    FROM tf JOIN df_t USING (term) CROSS JOIN n),
ranked AS (
    SELECT doc_id, term, tf, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
    FROM scored)
SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf, rank
FROM ranked WHERE rank <= {TFIDF_TOPK}
"""


# --- train/test contamination check -------------------------------------

SHINGLE_N = 5

# The SHINGLE_N-token shingle construction, ONE definition (Spark expr
# over a `toks` array column / DuckDB list comprehension over `toks`)
# shared by the contamination AUDIT and the decontamination REMOVAL —
# so the two can never disagree about what "contaminated" means.
SHINGLE_EXPR_SQL = (f"transform(CASE WHEN size(toks) >= {SHINGLE_N} "
                    f"THEN sequence(1, size(toks) - {SHINGLE_N - 1}) "
                    f"ELSE array() END, "
                    f"i -> concat_ws(' ', slice(toks, i, {SHINGLE_N})))")
SHINGLE_LIST_DUCK = (
    f"[array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')\n"
    f"                   for i in range(1, greatest(len(toks) "
    f"- {SHINGLE_N - 2}, 1))]")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination: for every test document (content-hash
    split, same rule as q_train_test_split), the fraction of its
    distinct 5-token shingles that appear anywhere in the train split —
    the n-gram-overlap decontamination check run before any evaluation
    on held-out data.

    Shape: shingles explode map-side; the train side collapses to a
    DISTINCT shingle set before the join (the only big shuffle, keyed
    on the shingle); then a left join + per-doc count. At 100 TB the
    join key would be xxhash64(shingle) — 8 bytes instead of a ~30-char
    string through the shuffle, with collision odds ~(pairs)/2^64; the
    string key here keeps the DuckDB oracle exact. Documents shorter
    than the shingle width contribute nothing (train) / are absent from
    the output (test), consistently in both engines."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sh = (docs
          .withColumn("split", F.when(split_is_train(), F.lit("train"))
                      .otherwise(F.lit("test")))
          .withColumn("toks", F.split("text", " "))
          .select("doc_id", "split",
                  F.explode_outer(F.expr(SHINGLE_EXPR_SQL))
                  .alias("shingle"))
          .dropDuplicates(["doc_id", "split", "shingle"]))
    train = (sh.filter(F.col("split") == "train")
             .select("shingle").distinct()
             .withColumn("in_train", F.lit(1)))
    test = sh.filter((F.col("split") == "test")
                     & F.col("shingle").isNotNull())
    return (test.join(train, on="shingle", how="left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum(F.coalesce("in_train", F.lit(0)))
                 .alias("n_contaminated"))
            .withColumn("contamination",
                        ieee_round(F.col("n_contaminated")
                                   / F.col("n_shingles"), 6)))


ORACLE_CONTAMINATION = f"""
WITH d AS (
    SELECT doc_id,
           CASE WHEN {SPLIT_IS_TRAIN_SQL}
                THEN 'train' ELSE 'test' END AS split,
           string_split(text, ' ') AS toks
    FROM documents),
sh AS (
    SELECT DISTINCT doc_id, split,
           unnest({SHINGLE_LIST_DUCK})
               AS shingle
    FROM d),
train AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train')
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CASE WHEN abs((sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE)) < 4e9 THEN floor((sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE) * 1e6 + 0.5E0) / 1e6 ELSE (sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE) END AS contamination
FROM sh LEFT JOIN train t USING (shingle)
WHERE sh.split = 'test'
GROUP BY sh.doc_id
"""


# --- training-example preparation: chunking, packing, mixtures ----------

# Context-window chunking: fixed token windows with overlap, the
# standard prep for long documents before tokenizer/packing stages.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48          # = CHUNK_TOKENS - 16 token overlap


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping fixed-size token chunks
    (one row per chunk). Pure map-side: split → transform over a
    stride sequence → explode, zero shuffles — at 100 TB this stage is
    embarrassingly parallel over the scan, and chunk rows land directly
    in the training-shard writer. Chunk starts are 1-based stride
    multiples; the final chunk is short when the document does not
    divide evenly (kept — training pipelines pad or pack downstream)."""
    docs = load_table(spark, sf_dir, "documents") \
        .withColumn("ts", F.split("text", " "))
    chunk = F.expr(
        f"transform(sequence(1, size(ts), {CHUNK_STRIDE}), "
        f"s -> struct(CAST((s - 1) div {CHUNK_STRIDE} AS BIGINT) "
        f"AS chunk_id, "
        f"CAST(size(slice(ts, s, {CHUNK_TOKENS})) AS BIGINT) "
        f"AS n_tokens, "
        f"array_join(slice(ts, s, {CHUNK_TOKENS}), ' ') AS chunk_text))")
    return (docs.select("doc_id", "lang", F.explode(chunk).alias("c"))
            .select("doc_id", "lang", "c.chunk_id", "c.n_tokens",
                    "c.chunk_text"))


ORACLE_DOC_CHUNKS = f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
           FROM documents)
SELECT doc_id, lang,
       CAST((s - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(ts[s:s + {CHUNK_TOKENS - 1}]) AS BIGINT) AS n_tokens,
       array_to_string(ts[s:s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text
FROM d, UNNEST(range(1, len(ts) + 1, {CHUNK_STRIDE})) AS u(s)
"""


# Token-level sequence packing (concatenate-and-split pretraining prep):
# documents are laid end to end per language in doc_id order and cut
# into fixed context windows.
PACK_CTX = 512


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document its token offset and context-window bin
    under sequential concatenate-and-split packing (per lang, doc_id
    order): start_offset = running token count before the doc,
    bin_id = start_offset div CTX, spans_boundary = whether the doc
    crosses a window edge (its tokens land in two training sequences).

    One window (running sum over the per-lang ordering) — a single
    range-partitioned exchange at scale; everything else is scalar
    arithmetic. This is the planning query for a shard writer: bin_id
    is the training-sequence id, and the boundary flag measures how
    much document-truncation loss the packing induces.

    NULL-text docs are excluded (nothing to pack): size(split(NULL))
    would NULL-poison the running offsets of every later doc's columns
    and emit a NULL boolean whose pandas representation differs
    between the engines.

    TOTAL under duplicate doc_ids (found by the r07 dup-id campaign,
    the same order-ambiguity class as text_heaps): the packing order
    tiebreaks equal doc_ids by md5(text), so every doc's offset is
    content-determined; unique ids never tie, so the key is inert on
    a PK-satisfying corpus."""
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull()).select(
            "doc_id", "lang", F.md5("text").alias("tb"),
            F.size(F.split("text", " ")).alias("n_tokens"))
    w = (Window.partitionBy("lang").orderBy("doc_id", "tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    return docs.select(
        "doc_id", "lang", F.col("n_tokens").cast("long").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / PACK_CTX).cast("long").alias("bin_id"),
        (F.floor(start / PACK_CTX) != F.floor((cum - 1) / PACK_CTX))
        .alias("spans_boundary"))


ORACLE_PACK_SEQUENCES = f"""
WITH d AS (
    SELECT doc_id, lang, md5(text) AS tb,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents WHERE text IS NOT NULL),
c AS (
    SELECT doc_id, lang, n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id, tb
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM d)
SELECT doc_id, lang, n_tokens,
       cum - n_tokens AS start_offset,
       (cum - n_tokens) // {PACK_CTX} AS bin_id,
       ((cum - n_tokens) // {PACK_CTX}) <> ((cum - 1) // {PACK_CTX})
           AS spans_boundary
FROM c
"""


# Temperature-scaled source mixture (multinomial sampling weights):
# w_i ∝ p_i^ALPHA with p_i the source's token share — the standard
# up/down-weighting of low/high-resource sources.
MIXTURE_ALPHA = 0.3


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus shares and temperature-scaled sampling
    weights: p = source tokens / corpus tokens, w ∝ p^alpha
    (normalized), epochs = w·T/t — how many passes over each source one
    corpus-sized token budget implies (>1 on small sources = the
    up-sampling the temperature buys). Two tiny aggregations (sources ×
    1 rows); the heavy input scan is the same partial-agg shape as any
    sum. Window-free: the normalizing totals ride a single-row
    broadcast cross join."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n_tokens"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"))
    p = F.col("n_tokens") / F.col("total_tokens")
    shared = per_src.crossJoin(F.broadcast(per_src.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"))))
    scaled = shared.withColumn("w_raw", F.pow(p, F.lit(MIXTURE_ALPHA)))
    norm = scaled.crossJoin(F.broadcast(
        scaled.agg(F.sum("w_raw").alias("w_sum"))))
    weight = F.col("w_raw") / F.col("w_sum")
    return norm.select(
        "source", "n_docs", "n_tokens",
        ieee_round(p, 6).alias("token_share"),
        ieee_round(weight, 6).alias("mixture_weight"),
        ieee_round(weight * F.col("total_tokens") / F.col("n_tokens"), 6)
        .alias("epochs_at_corpus_budget"))


ORACLE_MIXTURE_WEIGHTS = f"""
WITH per_src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               sum(pow(n_tokens / (SELECT sum(n_tokens)::DOUBLE
                                   FROM per_src), {MIXTURE_ALPHA}))
                   AS w_sum
        FROM per_src)
SELECT source, n_docs, n_tokens,
       CASE WHEN abs((n_tokens / total_tokens::DOUBLE)) < 4e9 THEN floor((n_tokens / total_tokens::DOUBLE) * 1e6 + 0.5E0) / 1e6 ELSE (n_tokens / total_tokens::DOUBLE) END AS token_share,
       CASE WHEN abs((pow(n_tokens / total_tokens::DOUBLE, {MIXTURE_ALPHA}) / w_sum)) < 4e9 THEN floor((pow(n_tokens / total_tokens::DOUBLE, {MIXTURE_ALPHA}) / w_sum) * 1e6 + 0.5E0) / 1e6 ELSE (pow(n_tokens / total_tokens::DOUBLE, {MIXTURE_ALPHA}) / w_sum) END AS mixture_weight,
       CASE WHEN abs((pow(n_tokens / total_tokens::DOUBLE, {MIXTURE_ALPHA}) / w_sum
             * total_tokens / n_tokens::DOUBLE)) < 4e9 THEN floor((pow(n_tokens / total_tokens::DOUBLE, {MIXTURE_ALPHA}) / w_sum
             * total_tokens / n_tokens::DOUBLE) * 1e6 + 0.5E0) / 1e6 ELSE (pow(n_tokens / total_tokens::DOUBLE, {MIXTURE_ALPHA}) / w_sum
             * total_tokens / n_tokens::DOUBLE) END
           AS epochs_at_corpus_budget
FROM per_src, tot
"""


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span fraction: for every document, the
    share of its distinct 5-token shingles that occur in at least one
    OTHER document — the span-level duplication signal (RefinedWeb /
    Dolma style) that pair-level dedup cannot see (a document can be
    30% boilerplate without having any single near-duplicate partner).

    Shape: shingles explode map-side and dedup per doc; one shuffle on
    the shingle computes each shingle's document frequency; the join
    back is on the SAME key, so the exchange is reused; the final
    per-doc aggregation is the only other shuffle. No pairwise work
    anywhere — cost is corpus shingles, not documents². Short documents
    (< 5 tokens) have no shingles and drop out, same in both engines."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sh = (docs.withColumn("toks", F.split("text", " "))
          .select("doc_id", F.explode(F.expr(
              f"transform(CASE WHEN size(toks) >= {SHINGLE_N} "
              f"THEN sequence(1, size(toks) - {SHINGLE_N - 1}) "
              f"ELSE array() END, "
              f"i -> concat_ws(' ', slice(toks, i, {SHINGLE_N})))"))
              .alias("shingle"))
          .dropDuplicates(["doc_id", "shingle"]))
    df_counts = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"))
    return (sh.join(df_counts, on="shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
                 .alias("n_dup_shingles"))
            .withColumn("dup_fraction",
                        ieee_round(F.col("n_dup_shingles")
                                   / F.col("n_shingles"), 6)))


ORACLE_DUP_SPANS = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           unnest([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                   for i in range(1, greatest(len(toks) - {SHINGLE_N - 2}, 1))])
               AS shingle
    FROM d),
df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_shingles,
       CASE WHEN abs((sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
             / count(*)::DOUBLE)) < 4e9 THEN floor((sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
             / count(*)::DOUBLE) * 1e6 + 0.5E0) / 1e6 ELSE (sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
             / count(*)::DOUBLE) END AS dup_fraction
FROM sh JOIN df USING (shingle)
GROUP BY doc_id
"""


GROUP_SAMPLE_K = 10     # docs kept per (lang, source) group


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sampling: keep the K documents
    with the smallest md5(doc_id) within every (lang, source) stratum —
    the eval-set/inspection-set construction a training pipeline runs
    over every slice of the corpus. Hash-ordering makes the sample
    pseudo-uniform yet reproducible across runs, engines, partitionings
    AND corpus growth (a doc already sampled stays sampled unless a
    smaller-hashed doc arrives — reservoir semantics without RNG state).

    Scale shape: the rank-≤-k filter compiles to WindowGroupLimitExec,
    so each task keeps at most K rows per group BEFORE the exchange —
    shuffle bytes are bounded by groups x K, never the corpus. The md5
    sort key is fixed-width hex: lexicographic order == integer order,
    portable to the oracle verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("lang", "source")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (docs
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= GROUP_SAMPLE_K)
            .select("lang", "source", "doc_id", "rank",
                    F.col("n_chars").cast("long").alias("n_chars")))


ORACLE_GROUP_SAMPLE = f"""
WITH ranked AS (
    SELECT lang, source, doc_id, n_chars,
           CAST(row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS rank
    FROM documents)
SELECT lang, source, doc_id, rank, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rank <= {GROUP_SAMPLE_K}
"""


def q_dup_span_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span INTERVALS: the start/end token
    offsets of every maximal run of cross-document shingles (df > 1) —
    the form a RefinedWeb-style span-REMOVAL pass actually consumes
    (cut [start_tok, end_tok] out of the doc), where ``q_dup_spans``
    only reports the per-doc fraction.

    Shape: same shingle-DF join as q_dup_spans (no pairwise work, cost
    is corpus shingles); duplicated shingle occurrences then compress
    into maximal token intervals via gaps-and-islands — a window
    PARTITIONED BY doc_id (never global): a new island starts when a
    shingle's start offset exceeds the previous covered end + 1, the
    island id is a running sum of those breaks, and each island
    aggregates to one (start_tok, end_tok) row. A shingle at pos i
    covers tokens [i, i+4]; overlapping/adjacent covers merge."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    occ = (docs.withColumn("toks", F.split("text", " "))
           .select("doc_id", F.posexplode(F.expr(
               f"transform(CASE WHEN size(toks) >= {SHINGLE_N} "
               f"THEN sequence(1, size(toks) - {SHINGLE_N - 1}) "
               f"ELSE array() END, "
               f"i -> concat_ws(' ', slice(toks, i, {SHINGLE_N})))"))
               .alias("idx", "shingle"))
           .withColumn("pos", (F.col("idx") + 1).cast("long"))
           .drop("idx"))
    dfc = (occ.select("doc_id", "shingle").distinct()
           .groupBy("shingle").agg(F.count(F.lit(1)).alias("df")))
    dup = (occ.join(dfc.filter(F.col("df") > 1), on="shingle")
           .select("doc_id", "pos",
                   (F.col("pos") + SHINGLE_N - 1).alias("e")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_end.isNull()
                 | (F.col("pos") > prev_end + 1), 1).otherwise(0)
    spans = (dup.withColumn("brk", brk)
             .withColumn("span_id", F.sum("brk").over(
                 w.rowsBetween(Window.unboundedPreceding, 0))
                 .cast("long")))
    return (spans.groupBy("doc_id", "span_id")
            .agg(F.min("pos").alias("start_tok"),
                 F.max("e").alias("end_tok"),
                 F.count(F.lit(1)).alias("n_shingles"))
            .withColumn("span_tokens",
                        F.col("end_tok") - F.col("start_tok") + 1))


ORACLE_DUP_SPAN_POSITIONS = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
occ AS (
    SELECT doc_id, i AS pos,
           array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ') AS shingle
    FROM d, UNNEST(range(1, greatest(len(toks) - {SHINGLE_N - 2}, 1)))
         AS r(i)),
dfc AS (SELECT shingle, count(DISTINCT doc_id) AS df
        FROM occ GROUP BY shingle),
dup AS (
    SELECT o.doc_id, o.pos, o.pos + {SHINGLE_N - 1} AS e
    FROM occ o JOIN dfc USING (shingle) WHERE df > 1),
isl AS (
    SELECT doc_id, pos, e,
           CASE WHEN max(e) OVER w_prev IS NULL
                     OR pos > max(e) OVER w_prev + 1
                THEN 1 ELSE 0 END AS brk
    FROM dup
    WINDOW w_prev AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
num AS (
    SELECT doc_id, pos, e,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id
    FROM isl)
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
       CAST(min(pos) AS BIGINT) AS start_tok,
       CAST(max(e) AS BIGINT) AS end_tok,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens
FROM num GROUP BY doc_id, span_id
"""


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span-REMOVAL pass itself: cut every token covered by a
    cross-document duplicated shingle out of each document and emit the
    cleaned text's fingerprint — the RefinedWeb/Dolma consumer of
    ``q_dup_span_positions``, kept as its own query so the whole
    remove-rewrite contract (which tokens survive, in what order) is
    oracle-adjudicated, not just the interval report.

    Shape: dup shingle occurrences fan out to covered token positions
    map-side (explode of a 5-element sequence); surviving tokens are a
    left join on (doc_id, pos) with a null-flag filter; per-doc rewrite
    is sort_array(collect_list(struct(pos, tok))) — bounded by document
    length, never corpus-sized. Every document appears in the output,
    including fully-duplicated ones (empty cleaned text) and short docs
    (no shingles — text passes through verbatim)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toked = docs.withColumn("toks", F.split("text", " "))
    occ = (toked
           .select("doc_id", F.posexplode(F.expr(
               f"transform(CASE WHEN size(toks) >= {SHINGLE_N} "
               f"THEN sequence(1, size(toks) - {SHINGLE_N - 1}) "
               f"ELSE array() END, "
               f"i -> concat_ws(' ', slice(toks, i, {SHINGLE_N})))"))
               .alias("idx", "shingle"))
           .withColumn("pos", (F.col("idx") + 1).cast("long"))
           .drop("idx"))
    dfc = (occ.select("doc_id", "shingle").distinct()
           .groupBy("shingle").agg(F.count(F.lit(1)).alias("df")))
    removed = (occ.join(dfc.filter(F.col("df") > 1), on="shingle")
               .select(F.col("doc_id").alias("rdoc"), F.explode(F.expr(
                   f"sequence(pos, pos + {SHINGLE_N - 1})"))
                   .alias("rpos"))
               .distinct())
    toks = (toked.select(
        "doc_id", F.posexplode("toks").alias("idx", "tok"))
        .withColumn("pos", (F.col("idx") + 1).cast("long")))
    flagged = (toks.join(removed,
                         on=[F.col("doc_id") == F.col("rdoc"),
                             F.col("pos") == F.col("rpos")],
                         how="left")
               .select("doc_id", "pos", "tok", "rpos"))
    kept_struct = F.when(F.col("rpos").isNull(),
                         F.struct("pos", "tok"))  # collect_list drops nulls
    agg = (flagged.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_tokens_in"),
                F.sort_array(F.collect_list(kept_struct)).alias("kept")))
    return agg.select(
        "doc_id", "n_tokens_in",
        F.size("kept").cast("long").alias("n_tokens_out"),
        ieee_round(F.lit(1.0) - F.size("kept") / F.col("n_tokens_in"), 6)
        .alias("removed_fraction"),
        F.md5(F.concat_ws(" ", F.expr("transform(kept, s -> s.tok)")))
        .alias("cleaned_md5"))


ORACLE_DUP_SPAN_REMOVAL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
occ AS (
    SELECT doc_id, i AS pos,
           array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ') AS shingle
    FROM d, UNNEST(range(1, greatest(len(toks) - {SHINGLE_N - 2}, 1)))
         AS r(i)),
dfc AS (SELECT shingle, count(DISTINCT doc_id) AS df
        FROM occ GROUP BY shingle),
removed AS (
    SELECT DISTINCT o.doc_id, p AS rpos
    FROM occ o JOIN dfc USING (shingle),
         UNNEST(range(o.pos, o.pos + {SHINGLE_N})) AS u(p)
    WHERE df > 1),
toks AS (
    SELECT doc_id, i AS pos, toks[i] AS tok
    FROM d, UNNEST(range(1, len(toks) + 1)) AS r(i)),
flagged AS (
    SELECT t.doc_id, t.pos, t.tok, r.rpos
    FROM toks t LEFT JOIN removed r
      ON t.doc_id = r.doc_id AND t.pos = r.rpos)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens_in,
       CAST(sum(CASE WHEN rpos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tokens_out,
       CASE WHEN abs((1.0 - sum(CASE WHEN rpos IS NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE)) < 4e9 THEN floor((1.0 - sum(CASE WHEN rpos IS NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE) * 1e6 + 0.5E0) / 1e6 ELSE (1.0 - sum(CASE WHEN rpos IS NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE) END AS removed_fraction,
       md5(coalesce(string_agg(CASE WHEN rpos IS NULL THEN tok END,
                               ' ' ORDER BY pos), '')) AS cleaned_md5
FROM flagged GROUP BY doc_id
"""


def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum staging: quartile-bucket documents by the
    blended quality score within each language (ntile over one window
    exchange) and summarize each stage — the standard curriculum /
    data-selection planning query (train on stage 4 first, anneal in
    the rest). Deterministic: the score tiebreak falls back to doc_id.

    Docs with a NULL quality score (NULL text) are excluded before the
    ntile: the engines disagree on NULL sort placement (Spark asc =
    NULLS FIRST, DuckDB = NULLS LAST), which would shift every
    quartile boundary — and an unscorable doc has no curriculum stage
    anyway."""
    q = q_text_quality(spark, sf_dir) \
        .filter(F.col("quality_score").isNotNull())
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    return (q.withColumn("stage", F.ntile(4).over(w).cast("long"))
            .groupBy("lang", "stage")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.min("quality_score"), 6).alias("min_score"),
                 F.round(F.max("quality_score"), 6).alias("max_score"),
                 uavg("quality_score", huge="DECIMAL(38,0)")
                 .alias("mean_score")))


# Quality-score-from-raw-text SQL (duckdb), shared by oracles that
# re-derive the score instead of consuming q_quality's output.
_QSCORE_FROM_TEXT_SQL = f"""least(((length(text) - len(tokens) + 1)::DOUBLE
                        / len(tokens)) / 10, 1.0) * 0.3
                 + (1 - len(list_filter(tokens, t -> list_contains(
                       {_sql_str_array(_CORE_STOP_LIST)}, t)))::DOUBLE
                       / len(tokens)) * 0.3
                 + (len(list_distinct(tokens))::DOUBLE
                    / len(tokens)) * 0.4"""


ORACLE_CURRICULUM_BUCKETS = f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS tokens, text
           FROM documents WHERE text IS NOT NULL),
m AS (
    SELECT doc_id, lang,
           {ieee_round_sql(_QSCORE_FROM_TEXT_SQL, 6)} AS quality_score
    FROM d),
staged AS (
    SELECT lang, quality_score,
           CAST(ntile(4) OVER (PARTITION BY lang
                ORDER BY quality_score, doc_id) AS BIGINT) AS stage
    FROM m)
SELECT lang, stage, CAST(count(*) AS BIGINT) AS n_docs,
       round(min(quality_score), 6) AS min_score,
       round(max(quality_score), 6) AS max_score,
       {uavg_sql("quality_score", huge="HUGEINT")} AS mean_score
FROM staged GROUP BY lang, stage
"""


# --- DSIR importance weights (data selection) ----------------------------

DSIR_TARGET_LANG = "en"   # fixture target domain; production: any doc gate


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169), unigram form: score every document by the mean
    per-token log-likelihood ratio between a target-domain LM (here
    docs with lang = DSIR_TARGET_LANG) and the raw-corpus LM, both
    add-1-smoothed over the corpus vocabulary. High weight = looks like
    the target domain; resampling by these weights is the selection
    step. This is the LLR idea of the reference's collocation scorer
    (`LLR.java`) applied corpuswide as a curation operator.

    Scale shape: BOTH LMs come out of one vocabulary-bounded aggregate
    over the token stream (target counts as a conditional sum — one
    corpus pass, not one per LM); corpus totals are one tiny broadcast
    row; scoring joins the exploded token stream to the LM on token —
    the same equi-join shape as word count, no corpus² work. The token
    stream is consumed twice (LM build + scoring) and deliberately NOT
    checkpointed: re-scanning columnar parquet is cheaper than
    materializing a corpus-sized token explosion; at production scale
    the tokenized corpus is a persisted shared table anyway.

    Determinism: each token's log-ratio is ln of one exactly-computed
    rational (BIGINT products, single double division) rounded to 6 dp,
    then per-doc accumulation uses exact integer micro-units
    (BIGINT sum of round(lr·1e6)) — order-independent across engines;
    only the final mean is float."""
    tok = (load_table(spark, sf_dir, "documents")
           .select("doc_id", "lang", F.explode(F.split("text", " "))
                   .alias("token")))
    # eqNullSafe, not ==: an unlabeled (NULL lang) doc is NOT target-
    # domain. Plain == makes the indicator NULL, and a token seen ONLY
    # in unlabeled docs gets ct = sum(all-NULL) = NULL -> lr = NULL ->
    # its contribution silently vanishes from every doc's sum, while
    # the oracle's filtered aggregate counts it as 0 (seed-902 find).
    lm_counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("lang").eqNullSafe(F.lit(DSIR_TARGET_LANG))
              .cast("long")).alias("ct"))
    totals = lm_counts.agg(F.count(F.lit(1)).alias("v"),
                           F.sum("cr").alias("nr"),
                           F.sum("ct").alias("nt"))
    lm = (lm_counts
          .crossJoin(F.broadcast(totals))
          .withColumn(
              "lr",
              F.round(F.log(((F.col("ct") + 1) * (F.col("nr") + F.col("v")))
                            .cast("double")
                            / ((F.col("cr") + 1)
                               * (F.col("nt") + F.col("v"))).cast("double")),
                      6))
          .select("token", "lr"))
    return (tok.join(lm, on="token")
            .groupBy("doc_id", "lang")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.expr("CAST(floor(lr * 1e6 + 0.5E0) AS BIGINT)"))
                 .alias("s"))
            .select("doc_id", "lang", "n_tokens",
                    # floor-half micro-mean, not round(): s/(1e6·n) can
                    # land exactly on a round-6 half where the engines'
                    # round() disagree (functions/exact.py idiom)
                    F.expr("CAST(floor(CAST(s AS DOUBLE) / n_tokens "
                           "+ 0.5E0) AS DOUBLE) / 1e6")
                    .alias("dsir_logweight")))


ORACLE_DSIR_WEIGHTS = f"""
WITH tok AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
    FROM documents),
cnt_r AS (SELECT token, count(*) AS cr FROM tok GROUP BY token),
cnt_t AS (SELECT token, count(*) AS ct FROM tok
          WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY token),
totals AS (SELECT count(*) AS v, sum(cr) AS nr FROM cnt_r),
totals_t AS (SELECT sum(ct) AS nt FROM cnt_t),
lm AS (
    SELECT r.token,
           round(ln(((coalesce(t.ct, 0) + 1) * (nr + v))::DOUBLE
                    / ((r.cr + 1) * (nt + v))::DOUBLE), 6) AS lr
    FROM cnt_r r LEFT JOIN cnt_t t ON r.token = t.token
    CROSS JOIN totals CROSS JOIN totals_t)
SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(floor(CAST(sum(CAST(floor(lr * 1e6 + 0.5E0) AS BIGINT)) AS DOUBLE)
                  / count(*) + 0.5E0) AS DOUBLE) / 1e6 AS dsir_logweight
FROM tok JOIN lm USING (token)
GROUP BY doc_id, lang
"""


# --- deterministic shard assignment (training export) --------------------

N_SHARDS = 8


# THE shard rule — one definition, three consumers (shard assignment,
# export manifest, ingest pipeline): md5 of doc_id -> one of N_SHARDS.
def shard_col() -> F.Column:
    return (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                               1, 4), 16, 10).cast("long") % N_SHARDS)


SHARD_SQL = (f"('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT"
             f" % {N_SHARDS}")


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for training export: every doc
    hashes to one of N_SHARDS shards (md5 of doc_id — content-stable,
    cross-engine, unlike engine-private hash functions), gets a dense
    within-shard position and a cumulative token offset — exactly what
    a sharded tokenized-corpus writer (WebDataset/TFRecord-style)
    needs to lay out files without a global sort.

    Scale shape: the hash is map-side; position/offset are ONE window
    exchange partitioned by shard — N_SHARDS-way parallel, never a
    single-partition global window. Shard sizes stay balanced because
    the hash is uniform; the window per shard is the per-file writer
    order, which a real export would produce with
    repartition(shard).sortWithinPartitions — the same plan."""
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.size(F.split("text", " ")).cast("long")
                    .alias("n_tokens"))
            .withColumn("shard", shard_col()))
    w = Window.partitionBy("shard").orderBy("doc_id")
    return (docs
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .withColumn("token_offset",
                        F.coalesce(F.sum("n_tokens").over(
                            w.rowsBetween(Window.unboundedPreceding, -1)),
                            F.lit(0)).cast("long"))
            .select("doc_id", "shard", "pos", "n_tokens", "token_offset"))


ORACLE_SHARD_ASSIGN = f"""
WITH d AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           {SHARD_SQL} AS shard
    FROM documents)
SELECT doc_id, shard,
       CAST(row_number() OVER w AS BIGINT) AS pos,
       n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED
            PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
FROM d
WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
"""


# --- BPE pair statistics (tokenizer training step) -----------------------

BPE_TOPK = 10


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-selection step per language: count every adjacent
    character pair inside whitespace words and rank the top BPE_TOPK
    merge candidates (count desc, pair asc — the deterministic
    tiebreak). Iterating merge-count-merge is exactly how a BPE
    tokenizer is trained; this is the distributed inner loop, and its
    pair-counting is the reference's bigram count (`Job1.java`) one
    level down, at the character plane.

    Scale shape: pair extraction is a map-side expression (sequence +
    substring — character-indexed, so CJK text is handled per
    codepoint, not per byte); the count is one partial-agg'd
    (lang, pair) shuffle bounded by the pair alphabet, not the corpus;
    the top-k is a WindowGroupLimit over that bounded aggregate."""
    pairs = F.expr(
        "CASE WHEN length(w) >= 2 "
        "THEN transform(sequence(1, length(w) - 1), "
        "i -> substring(w, i, 2)) ELSE array() END")
    words = (load_table(spark, sf_dir, "documents")
             .select("lang", F.explode(F.split("text", " ")).alias("w")))
    counts = (words.select("lang", F.explode(pairs).alias("pair"))
              .groupBy("lang", "pair")
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("pair"))
    return (counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= BPE_TOPK)
            .select("lang", "pair", "cnt", "rank"))


ORACLE_BPE_PAIRS = f"""
WITH words AS (
    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
pairs AS (
    SELECT lang, w[i:i+1] AS pair
    FROM words, UNNEST(range(1, length(w))) AS r(i)
    WHERE length(w) >= 2),
counts AS (
    SELECT lang, pair, count(*) AS cnt FROM pairs GROUP BY lang, pair),
ranked AS (
    SELECT lang, pair, cnt,
           CAST(row_number() OVER (PARTITION BY lang
                ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank
    FROM counts)
SELECT lang, pair, cnt, rank FROM ranked WHERE rank <= {BPE_TOPK}
"""


# --- BPE merge LEARNING (the iterative tokenizer-training loop) ---------
#
# q_bpe_pairs is one merge-SELECTION step; this is the training loop
# itself: BPE_LEARN_STEPS rounds of count-pairs -> pick the best merge
# -> apply it corpus-wide, emitting the learned merge table (the
# artifact a tokenizer ships). The corpus state lives in LONG form —
# (word, freq, pos, tok) over the DISTINCT-word vocabulary, never the
# raw corpus — so every round is vocabulary-bounded: a lead() window
# for adjacency, one (x, y) pair aggregate, a TakeOrdered top-1, and
# the merge application as three more word-partitioned window passes.
#
# Greedy-application semantics (the part naive string replace() gets
# wrong — boundary consumption breaks back-to-back occurrences like
# "xyxy", and regex lookahead isn't portable to RE2): an occurrence of
# (x, y) is merged iff it is not claimed by the previous overlapping
# occurrence. Overlapping occurrences are consecutive ROWS of the
# word's token sequence, so gaps-and-islands over the occurrence rows
# (island = row_number − running occurrence count) plus odd/even
# alternation WITHIN each island reproduces the left-to-right greedy
# scan exactly — in pure window functions, identical in both engines.

BPE_LEARN_STEPS = 3


def _bpe_state0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial BPE state: every ≥2-char whitespace word of the corpus,
    deduplicated with its frequency, exploded to one row per character
    (codepoint-indexed — CJK-safe, same as q_bpe_pairs)."""
    words = (load_table(spark, sf_dir, "documents")
             .select(F.explode(F.split("text", " ")).alias("w"))
             .filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    return words.select(
        "w", "freq",
        F.posexplode(F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .alias("pos", "tok"))


def _bpe_round(state: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One merge round over the long-form state: returns (next_state,
    best) where best is the one-row (x, y, cnt) merge this round
    learned. All windows are word-partitioned; the only global step is
    the pair-alphabet-bounded top-1."""
    ws = Window.partitionBy("w").orderBy("pos")
    adj = (state
           .withColumn("nxt", F.lead("tok").over(ws))
           .withColumn("rn", F.row_number().over(ws)))
    cnts = (adj.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("x"), F.col("nxt").alias("y"))
            .agg(F.sum("freq").alias("cnt")))
    best = (cnts.orderBy(F.desc("cnt"), F.asc("x"), F.asc("y")).limit(1))
    run = ws.rowsBetween(Window.unboundedPreceding, 0)
    marked = (adj.crossJoin(F.broadcast(best))
              .withColumn("occ", (F.col("tok") == F.col("x"))
                          & (F.col("nxt") == F.col("y")))
              .withColumn("rk", F.sum(F.col("occ").cast("int")).over(run)))
    # island key: NULL for non-occurrence rows (they group together in
    # one inert partition — their selected is false regardless); for
    # occurrence rows rn - rk is constant exactly along a run of
    # overlapping (consecutive-row) occurrences.
    isl = F.when(F.col("occ"), F.col("rn") - F.col("rk"))
    wisl = Window.partitionBy("w", isl).orderBy("pos")
    sel = marked.withColumn(
        "selected",
        F.col("occ") & (((F.col("rk") - F.min("rk").over(wisl)) % 2) == 0))
    nxt_state = (sel
                 .withColumn("prev_sel", F.lag("selected").over(ws))
                 .filter(~F.coalesce(F.col("prev_sel"), F.lit(False)))
                 .select("w", "freq", "pos",
                         F.when(F.col("selected"),
                                F.concat("tok", "nxt"))
                         .otherwise(F.col("tok")).alias("tok")))
    return nxt_state, best


# Live persisted intermediates of the NEWEST _bpe_chain invocation.
# Each chain pins BPE_LEARN_STEPS-1 states (legitimately: round r+1
# re-reads state r twice — pair count + merge), but repeated
# invocations in one session (learn + apply across fuzz corpora)
# would otherwise accumulate pinned storage until LRU eviction
# (ADVICE r07). Releasing the previous chain's handles on entry
# bounds pinned state to one chain's worth; by then the previous
# caller's action has either materialized its result or will
# recompute lazily — unpersist never changes results. Entry [0] is
# the live chain's (unpersisted) state0, kept as the semantics key.
_BPE_LIVE_STATES: list[DataFrame] = []


def _bpe_chain(spark: SparkSession, sf_dir: str
               ) -> tuple[DataFrame, list[DataFrame]]:
    """Run the full BPE_LEARN_STEPS training chain: returns the final
    vocabulary state and the per-step best-merge rows. Intermediate
    states are persisted (each is re-read twice by the next round:
    pair count + merge); the final state is left lazy — q_bpe_learn
    never reads it and q_bpe_apply reads it exactly once."""
    state = _bpe_state0(spark, sf_dir)
    # semantics-deduped release: a re-invocation on the SAME corpus
    # (learn then apply, or repeated bench runs) rebuilds identical
    # plans whose persists alias the live chain's cache entries —
    # dropping those would evict exactly what the new chain is about
    # to read. Only a chain for a DIFFERENT corpus supersedes.
    fresh = not (_BPE_LIVE_STATES
                 and _BPE_LIVE_STATES[0].sameSemantics(state))
    if fresh:
        while _BPE_LIVE_STATES:
            _BPE_LIVE_STATES.pop().unpersist(blocking=False)
        _BPE_LIVE_STATES.append(state)  # [0] = the chain's state0 key
    bests = []
    for step in range(1, BPE_LEARN_STEPS + 1):
        state, best = _bpe_round(state)
        if step < BPE_LEARN_STEPS:
            state = state.persist()
            if fresh:
                _BPE_LIVE_STATES.append(state)
        bests.append(best)
    return state, bests


def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_LEARN_STEPS merges over the corpus vocabulary and
    emit the merge table (step, x, y, merged, cnt) — cnt is the
    adjacency count that won the step, BEFORE applying the merge.
    Deterministic end to end: the top-1 tiebreak is (cnt desc, x, y)
    and the greedy application is the window construction above, so
    the result is independent of partitioning/arrival order.

    Scale shape: state is the distinct-word vocabulary (frequencies
    carry corpus mass), so round cost tracks vocabulary size, not
    corpus size — the same reduction the reference's combiner makes;
    each round's state is persisted so round r+1 re-reads Σ|word|
    rows, not the growing lazy DAG twice per round."""
    _, bests = _bpe_chain(spark, sf_dir)
    merges = [best.select(
        F.lit(step).cast("long").alias("step"), "x", "y",
        F.concat("x", "y").alias("merged"), "cnt")
        for step, best in enumerate(bests, start=1)]
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the merges q_bpe_learn just trained —
    the APPLY half of the tokenizer loop — and report per-language
    tokenization stats: word/token/char volumes and chars-per-token
    (the compression a tokenizer is judged by). Token counts come from
    the final vocabulary state (rows per word after the merge rounds),
    joined back to corpus word occurrences; single-char words (which
    the ≥2-char training state excludes) tokenize to themselves.

    Scale shape: the expensive part (the merge rounds) stays
    vocabulary-bounded; the corpus-side work is one word explode +
    an equi-join on word + a lang-bounded aggregate."""
    state, _ = _bpe_chain(spark, sf_dir)
    tokc = state.groupBy("w").agg(F.count(F.lit(1)).alias("n_toks"))
    cwords = (load_table(spark, sf_dir, "documents")
              .select("lang", F.explode(F.split("text", " ")).alias("w"))
              .filter(F.length("w") >= 1))
    toks = F.coalesce(F.col("n_toks"), F.lit(1))
    return (cwords.join(tokc, on="w", how="left")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(toks).alias("n_tokens"),
                 F.sum(F.length("w")).cast("long").alias("n_chars"),
                 ieee_round(F.try_divide(
                     F.sum(F.length("w")).cast("double"),
                     F.sum(toks).cast("double")), 6)
                 .alias("chars_per_token")))


def _bpe_chain_sql() -> str:
    """The WITH-chain through the final state s{BPE_LEARN_STEPS},
    shared by the learn and apply oracles."""
    rounds = []
    for r in range(1, BPE_LEARN_STEPS + 1):
        p = r - 1
        rounds.append(f"""
adj{r} AS (
    SELECT w, freq, pos, tok,
           lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS rn
    FROM s{p}),
best{r} AS (
    SELECT tok AS x, nxt AS y, CAST(sum(freq) AS BIGINT) AS cnt
    FROM adj{r} WHERE nxt IS NOT NULL GROUP BY 1, 2
    ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),
sel{r} AS (
    SELECT *, occ AND ((rk - min(rk) OVER (PARTITION BY w,
               CASE WHEN occ THEN rn - rk END ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               % 2 = 0) AS selected
    FROM (SELECT a.*, b.x, b.y,
                 (a.tok = b.x AND a.nxt = b.y) AS occ,
                 sum(CASE WHEN a.tok = b.x AND a.nxt = b.y
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY a.w ORDER BY a.pos
                         ROWS UNBOUNDED PRECEDING) AS rk
          FROM adj{r} a CROSS JOIN best{r} b)),
s{r} AS (
    SELECT w, freq, pos, tok FROM (
        SELECT w, freq, pos,
               CASE WHEN selected THEN x || y ELSE tok END AS tok,
               lag(selected) OVER (PARTITION BY w ORDER BY pos)
                   AS prev_sel
        FROM sel{r})
    WHERE NOT coalesce(prev_sel, FALSE))""")
    return f"""WITH words AS (
    SELECT w, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE length(w) >= 2 GROUP BY w),
s0 AS (
    SELECT w, freq, i AS pos, w[i:i] AS tok
    FROM words, UNNEST(range(1, length(w) + 1)) AS r(i)),{",".join(rounds)}"""


def _bpe_learn_oracle() -> str:
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS step, x, y, x || y AS merged, cnt "
        f"FROM best{r}" for r in range(1, BPE_LEARN_STEPS + 1))
    return f"""
{_bpe_chain_sql()}
{finals}
"""


ORACLE_BPE_LEARN = _bpe_learn_oracle()


ORACLE_BPE_APPLY = f"""
{_bpe_chain_sql()},
tokc AS (
    SELECT w, CAST(count(*) AS BIGINT) AS n_toks
    FROM s{BPE_LEARN_STEPS} GROUP BY w),
cwords AS (
    SELECT lang, w
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
          FROM documents)
    WHERE length(w) >= 1)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(coalesce(n_toks, 1)) AS BIGINT) AS n_tokens,
       CAST(sum(length(w)) AS BIGINT) AS n_chars,
       {ieee_round_sql(
           'CAST(sum(length(w)) AS DOUBLE)'
           ' / CAST(sum(coalesce(n_toks, 1)) AS DOUBLE)')}
           AS chars_per_token
FROM cwords LEFT JOIN tokc USING (w)
GROUP BY lang
"""


# --- Zipf law fit (token frequency power-law slope) ---------------------

ZIPF_TOP = 500  # fit over the top-N ranks per language

# Least-squares pieces over x=ln(rank), y=ln(count), derived from
# floor-quantized exact moment sums (the cross-engine-deterministic
# aggregation pattern from q_embedding_covariance). The strings are
# shared verbatim between the Spark plan and the DuckDB oracle so the
# derived float arithmetic is bit-identical.
_ZD = {c: f"(CAST(s{c} AS DOUBLE) / 1e12)" for c in
       ("x", "y", "xy", "xx", "yy")}
_ZN = "CAST(n AS DOUBLE)"
_Z_NUM = f"({_ZN} * {_ZD['xy']} - {_ZD['x']} * {_ZD['y']})"
_Z_DEN = f"({_ZN} * {_ZD['xx']} - {_ZD['x']} * {_ZD['x']})"
_Z_SLOPE = f"({_Z_NUM} / {_Z_DEN})"
_Z_INTERCEPT = f"(({_ZD['y']} - {_Z_SLOPE} * {_ZD['x']}) / {_ZN})"
# r² is undefined when the y-variance is zero (all counts equal —
# e.g. a degenerate language where every token appears once): the CASE
# yields NULL instead of a division by zero (ANSI Spark throws, DuckDB
# diverges to inf) — found by the extreme-hazard fuzz tier.
_Z_R2 = (f"(CASE WHEN ({_ZN} * {_ZD['yy']} - {_ZD['y']} * {_ZD['y']}) "
         f"<> 0E0 THEN ({_Z_NUM} * {_Z_NUM}) / ({_Z_DEN} * "
         f"({_ZN} * {_ZD['yy']} - {_ZD['y']} * {_ZD['y']})) END)")


def q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit per language: regress ln(count) on ln(rank)
    over the top-500 token ranks. The slope (~ -1 for natural text) is
    a corpus-health signal — synthetic or templated data bends it.

    Shape: one (lang, token) count shuffle; ranking is a per-lang
    window (bounded partitions); the regression itself is a per-lang
    moment-sum aggregate — constant output per language, never a
    driver-side fit. Determinism: built-in regr_slope accumulates
    floats in engine order, so the moments are floor-quantized to
    integer 1e-12 units and summed exactly (see
    q_embedding_covariance); slope/intercept/r² derive from the same
    expression text in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
              .groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c")))
    rw = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("w"))
    ranked = (counts.withColumn("r", F.row_number().over(rw))
              .filter(F.col("r") <= ZIPF_TOP)
              .selectExpr("lang", "ln(CAST(r AS DOUBLE)) AS x",
                          "ln(CAST(c AS DOUBLE)) AS y"))

    def q12(col: str):
        return (F.sum(F.floor(F.expr(col) * F.lit(1e12))
                      .cast("decimal(38,0)")).alias("s" + col.replace(" * ", "")))

    mom = ranked.groupBy("lang").agg(
        q12("x"), q12("y"), q12("x * y"), q12("x * x"), q12("y * y"),
        F.count(F.lit(1)).alias("n"))
    # an OLS fit needs >= 2 rank points: a degenerate language (single
    # distinct token) has zero x-variance — division by zero (ANSI
    # throws, DuckDB yields inf) — and no meaningful power law anyway
    return mom.filter(F.col("n") >= 2).selectExpr(
        "lang", "CAST(n AS BIGINT) AS n_points",
        f"{ieee_round_sql(_Z_SLOPE, 6)} AS slope",
        f"{ieee_round_sql(_Z_INTERCEPT, 6)} AS intercept",
        f"{ieee_round_sql(_Z_R2, 6)} AS r2")


ORACLE_ZIPF = f"""
WITH counts AS (
    SELECT lang, w, count(*) AS c
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
          FROM documents)
    GROUP BY lang, w),
ranked AS (
    SELECT lang, ln(CAST(c AS DOUBLE)) AS y,
           ln(CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY c DESC, w ASC) AS DOUBLE)) AS x,
           row_number() OVER (PARTITION BY lang
                   ORDER BY c DESC, w ASC) AS r
    FROM counts),
mom AS (
    SELECT lang,
           sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS sx,
           sum(CAST(floor(y * 1e12) AS DECIMAL(38,0))) AS sy,
           sum(CAST(floor(x * y * 1e12) AS DECIMAL(38,0))) AS sxy,
           sum(CAST(floor(x * x * 1e12) AS DECIMAL(38,0))) AS sxx,
           sum(CAST(floor(y * y * 1e12) AS DECIMAL(38,0))) AS syy,
           count(*) AS n
    FROM ranked WHERE r <= {ZIPF_TOP} GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_points,
       {ieee_round_sql(_Z_SLOPE, 6)} AS slope,
       {ieee_round_sql(_Z_INTERCEPT, 6)} AS intercept,
       {ieee_round_sql(_Z_R2, 6)} AS r2
-- OLS needs >= 2 points (see the Spark twin's degenerate-lang note)
FROM mom WHERE n >= 2
"""


# --- train/test distribution drift (smoothed KL divergence) -------------

# Shared expression text (Spark + DuckDB) for the add-1-smoothed
# distributions over the union vocabulary.
_KL_P = ("((CAST(ctr AS DOUBLE) + 1) / "
         "(CAST(ntr AS DOUBLE) + CAST(v AS DOUBLE)))")
_KL_Q = ("((CAST(cte AS DOUBLE) + 1) / "
         "(CAST(nte AS DOUBLE) + CAST(v AS DOUBLE)))")
_KL_TERM = f"({_KL_P} * ln({_KL_P} / {_KL_Q}))"


def q_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the train and test splits of the
    deterministic content-hash partition (q_train_test_split): add-1-
    smoothed unigram KL(train‖test) per language. The standard check
    that a split (or a new crawl snapshot) didn't shift the token
    distribution.

    Shape: one (lang, word) count shuffle with the split folded in as
    two conditional counts (no second pass over the corpus); per-lang
    totals are a tiny aggregate broadcast back; the KL sum is a
    floor-quantized exact aggregation (1e-15 units — terms are ≤1e-2)
    so the result hashes identically across engines."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", split_is_train().alias("is_train"),
        F.explode(F.split("text", " ")).alias("w"))
    counts = tok.groupBy("lang", "w").agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0)).alias("ctr"),
        F.sum(F.when(~F.col("is_train"), 1).otherwise(0)).alias("cte"))
    totals = counts.groupBy("lang").agg(
        F.sum("ctr").alias("ntr"), F.sum("cte").alias("nte"),
        F.count(F.lit(1)).alias("v"))
    terms = counts.join(F.broadcast(totals), "lang")
    mom = terms.groupBy("lang").agg(
        F.sum(F.floor(F.expr(_KL_TERM) * F.lit(1e15))
              .cast("decimal(38,0)")).alias("skl"),
        F.max("ntr").alias("ntr"), F.max("nte").alias("nte"),
        F.max("v").alias("v"))
    return mom.selectExpr(
        "lang", "CAST(v AS BIGINT) AS vocab",
        "CAST(ntr AS BIGINT) AS n_train_tokens",
        "CAST(nte AS BIGINT) AS n_test_tokens",
        # floor-half derive on the 1e15 grid (d=1e9), not round():
        # the exact integer sum can land on a round-6 half
        "floor((CAST(skl AS DOUBLE) + 500000000) / 1000000000) / 1e6 "
        "AS kl_train_test")


ORACLE_KL_DRIFT = f"""
WITH tok AS (
    SELECT lang,
           {SPLIT_IS_TRAIN_SQL} AS is_train,
           unnest(string_split(text, ' ')) AS w
    FROM documents),
counts AS (
    SELECT lang, w,
           sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS ctr,
           sum(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS cte
    FROM tok GROUP BY lang, w),
totals AS (
    SELECT lang, sum(ctr) AS ntr, sum(cte) AS nte, count(*) AS v
    FROM counts GROUP BY lang),
mom AS (
    SELECT c.lang,
           sum(CAST(floor({_KL_TERM} * 1e15) AS DECIMAL(38,0))) AS skl,
           max(ntr) AS ntr, max(nte) AS nte, max(v) AS v
    FROM counts c JOIN totals t ON c.lang = t.lang
    GROUP BY c.lang)
SELECT lang, CAST(v AS BIGINT) AS vocab,
       CAST(ntr AS BIGINT) AS n_train_tokens,
       CAST(nte AS BIGINT) AS n_test_tokens,
       floor((CAST(skl AS DOUBLE) + 500000000) / 1000000000) / 1e6
           AS kl_train_test
FROM mom
"""


# --- winnowing fingerprints (Schleimer et al., the MOSS algorithm) ------

WINNOW_W = 4  # shingle-hash window: guarantees a match on any run of
              # WINNOW_W + SHINGLE_N - 1 shared tokens


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: hash every SHINGLE_N-token
    shingle, slide a WINNOW_W window over the hash sequence, keep each
    window's minimum, emit the distinct selected hashes per document.
    The standard sublinear fingerprint set for plagiarism/overlap
    detection — any shared token run of length ≥ WINNOW_W+SHINGLE_N-1
    is guaranteed to share a fingerprint.

    Shape: entirely map-side array lambdas (shingle → hash → windowed
    min → distinct) then one explode; ZERO shuffles — the plan is a
    single projection stage. Hashes are md5-derived 48-bit ints, the
    repo's cross-engine hash idiom. Docs shorter than SHINGLE_N tokens
    produce no fingerprints; shingle sequences shorter than WINNOW_W
    contribute their global min (the w=1 degenerate window)."""
    docs = load_table(spark, sf_dir, "documents") \
        .withColumn("toks", F.split("text", " "))
    sh = (f"CASE WHEN size(toks) >= {SHINGLE_N} "
          f"THEN transform(sequence(1, size(toks) - {SHINGLE_N - 1}), "
          f"i -> CAST(conv(substring(md5(concat_ws(' ', "
          f"slice(toks, i, {SHINGLE_N}))), 1, 12), 16, 10) AS BIGINT)) "
          f"ELSE array() END")
    wins = (f"CASE WHEN size(sh) >= 1 "
            f"THEN transform(sequence(1, greatest(size(sh) - {WINNOW_W - 1}, 1)), "
            f"i -> array_min(slice(sh, i, {WINNOW_W}))) "
            f"ELSE array() END")
    return (docs.withColumn("sh", F.expr(sh))
            .select("doc_id",
                    F.explode(F.array_distinct(F.expr(wins))).alias("fp")))


# Shared winnowing CTE text (d -> shingle hashes -> window minima):
# both the fingerprint query and the containment candidate generator
# must use BYTE-IDENTICAL selection or their candidate sets drift.
_WINNOW_CTES_SQL = f"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= {SHINGLE_N}
           THEN list_transform(range(1, len(toks) - {SHINGLE_N - 2}),
                i -> CAST(('0x' || substring(md5(array_to_string(
                     toks[i:i+{SHINGLE_N - 1}], ' ')), 1, 12)) AS BIGINT))
           ELSE [] END AS sh
    FROM d),
wins AS (
    SELECT doc_id,
           CASE WHEN len(sh) >= 1
           THEN list_transform(range(1, greatest(len(sh) - {WINNOW_W - 2}, 2)),
                i -> list_min(sh[i:i+{WINNOW_W - 1}]))
           ELSE [] END AS wins
    FROM sh)"""

ORACLE_WINNOW_FINGERPRINTS = f"""
WITH {_WINNOW_CTES_SQL}
SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM wins
"""


# --- near-containment detection (overlap coefficient) -------------------

CONTAIN_THRESHOLD = 0.8   # |A∩B| / min(|A|,|B|)


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-containment pairs: documents whose token-set OVERLAP
    coefficient |A∩B| / min(|A|,|B|) clears the gate — the quote/
    wrapper/boilerplate-inclusion case Jaccard structurally misses
    (a small doc inside a big one has tiny Jaccard but containment
    ≈ 1), so MinHash-Jaccard dedup never surfaces it.

    Scale shape: candidates come from the WINNOWING index
    (``q_winnow_fingerprints``) — any shared run of
    WINNOW_W+SHINGLE_N-1 tokens guarantees a shared fingerprint, and
    containment implies long shared runs — so candidate generation is
    a fingerprint-keyed equi-join (sub-quadratic), never an all-pairs
    scan. A boilerplate fingerprint shared by thousands of docs is the
    skew hazard: cap fingerprint document-frequency before the
    self-join at scale (same hub treatment as link prediction). Exact
    verify runs only on deduped candidates; both the jaccard and the
    overlap coefficient are emitted so the asymmetry is visible."""
    fps = q_winnow_fingerprints(spark, sf_dir)
    cand = (fps.alias("x").join(fps.alias("y"), on="fp")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.array_distinct(F.split("text", " ")).alias("toks")))
    pairs = (cand
             .join(toks.select(F.col("doc_id").alias("doc_a"),
                               F.col("toks").alias("toks_a")), on="doc_a")
             .join(toks.select(F.col("doc_id").alias("doc_b"),
                               F.col("toks").alias("toks_b")), on="doc_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    overlap = inter / F.least(F.size("toks_a"), F.size("toks_b"))
    jac = inter / (F.size("toks_a") + F.size("toks_b") - inter)
    return (pairs.withColumn("overlap", overlap)
            .filter(F.col("overlap") >= CONTAIN_THRESHOLD)
            .select("doc_a", "doc_b",
                    ieee_round(F.col("overlap"), 6).alias("overlap"),
                    ieee_round(jac, 6).alias("jaccard")))


ORACLE_CONTAINMENT = f"""
WITH {_WINNOW_CTES_SQL},
fps AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM wins),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id),
t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents)
SELECT doc_a, doc_b, CASE WHEN abs((overlap)) < 4e9 THEN floor((overlap) * 1e6 + 0.5E0) / 1e6 ELSE (overlap) END AS overlap,
       CASE WHEN abs((jaccard)) < 4e9 THEN floor((jaccard) * 1e6 + 0.5E0) / 1e6 ELSE (jaccard) END AS jaccard
FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(a.toks, b.toks))::DOUBLE
             / least(len(a.toks), len(b.toks)) AS overlap,
           len(list_intersect(a.toks, b.toks))::DOUBLE
             / (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))) AS jaccard
    FROM cand JOIN t a ON a.doc_id = cand.doc_a
    JOIN t b ON b.doc_id = cand.doc_b)
WHERE overlap >= {CONTAIN_THRESHOLD}
"""


# --- weighted sampling without replacement (A-ES priority keys) ---------

WEIGHTED_SAMPLE_K = 20   # kept per language


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, k per language, via
    Efraimidis-Spirakis priority keys: key_i = u_i^(1/w_i) with u_i a
    content-stable uniform — the top-k keys ARE a weight-proportional
    sample. The curation form of "sample the corpus proportional to
    doc length/quality" that a uniform hash sample (``q_group_sample``)
    cannot express.

    Scale shape: keys are map-side expressions, selection is the same
    WindowGroupLimit top-k as every other bounded-per-group operator —
    shuffle bytes bounded by groups × k. Determinism: u_i is an
    md5-derived 48-bit rational (never 0), pow/division are single
    fixed expressions shared with the oracle — no RNG state anywhere,
    so the sample is reproducible across runs and partitionings (the
    property production resampling jobs need for audit). The ranking
    key is the QUANTIZED log-key floor(ln(u)/w * 1e15) — u^(1/w) DESC
    and ln(u)/w DESC are the same order (ln is monotone), but the
    integer form sidesteps Java Math.pow's 2-ulp slack vs libm's
    correctly-rounded pow: near-ties collapse onto EQUAL integers and
    break by doc_id identically in both engines (key gaps are ~1/n on
    the u scale, ≫ the 1e-15 grid, so a 1-ulp ln flip at a floor
    boundary cannot reorder distinct keys).

    Zero-weight docs (empty text, n_chars = 0) are excluded BEFORE the
    key: in Efraimidis-Spirakis a weight-0 item has selection
    probability 0, and mechanically ln(u)/0 is a division by zero
    (ANSI Spark throws, DuckDB yields -inf — divergent either way).
    Real crawl corpora always contain empty documents."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = ("((CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), "
         "16, 10) AS BIGINT) + 1) / CAST(281474976710656 AS DOUBLE))")
    key = (f"CAST(floor(ln({u}) / CAST(n_chars AS DOUBLE) * 1e15) "
           "AS BIGINT)")
    w = Window.partitionBy("lang").orderBy(
        F.desc("key"), F.asc("doc_id"))
    return (docs.withColumn("key", F.expr(key))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= WEIGHTED_SAMPLE_K)
            .select("lang", "doc_id", F.col("n_chars").alias("weight"),
                    "rank"))


ORACLE_WEIGHTED_SAMPLE = f"""
WITH keyed AS (
    SELECT lang, doc_id, n_chars,
           CAST(floor(
               ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                   + 1) / CAST(281474976710656 AS DOUBLE))
               / CAST(n_chars AS DOUBLE) * 1e15) AS BIGINT) AS key
    FROM documents WHERE n_chars > 0),
ranked AS (
    SELECT lang, doc_id, n_chars, key,
           CAST(row_number() OVER (PARTITION BY lang
                ORDER BY key DESC, doc_id ASC) AS BIGINT) AS rank
    FROM keyed)
SELECT lang, doc_id, n_chars AS weight, rank
FROM ranked WHERE rank <= {WEIGHTED_SAMPLE_K}
"""


# --- character-entropy quality signal -----------------------------------

def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the cheap gibberish/boilerplate detector (natural text sits near
    ~4 bits; base64 blobs higher, repeated padding near 0).

    Shape: one (doc, char) count shuffle bounded by docs × alphabet;
    the entropy sum is floor-quantized per term (1e-12 units) and
    summed exactly, so the scalar hashes identically across engines.
    The ln/len inputs are integers — the only float math is one fixed
    derived expression per term."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch"))
    counts = (chars.filter(F.col("ch") != "")
              .groupBy("doc_id", "ch")
              .agg(F.count(F.lit(1)).alias("c")))
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    term = ("floor((CAST(c AS DOUBLE) / n) "
            "* (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE))) * 1e12)")
    ent = (counts.join(totals, "doc_id")
           .groupBy("doc_id")
           .agg(F.sum(F.expr(term).cast("decimal(38,0)")).alias("se"),
                F.max("n").cast("long").alias("n_chars_counted")))
    return ent.selectExpr(
        "doc_id", "n_chars_counted",
        "round(CAST(se AS DOUBLE) / 1e12 / ln(2), 6) AS entropy_bits")


ORACLE_CHAR_ENTROPY = """
WITH chars AS (
    SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
    FROM documents),
counts AS (
    SELECT doc_id, ch, count(*) AS c FROM chars
    WHERE ch <> '' GROUP BY doc_id, ch),
totals AS (SELECT doc_id, sum(c) AS n FROM counts GROUP BY doc_id),
ent AS (
    SELECT c.doc_id,
           sum(CAST(floor((CAST(c AS DOUBLE) / n)
               * (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE)))
               * 1e12) AS DECIMAL(38,0))) AS se,
           CAST(max(n) AS BIGINT) AS n_chars_counted
    FROM counts c JOIN totals t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id)
SELECT doc_id, n_chars_counted,
       round(CAST(se AS DOUBLE) / 1e12 / ln(2), 6) AS entropy_bits
FROM ent
"""


# --- Heaps' law fit (vocabulary growth exponent) ------------------------

def q_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit per language: regress ln(cumulative vocabulary)
    on ln(cumulative tokens) as the corpus grows document by document
    (doc_id order). Natural text gives β ≈ 0.5-0.8; β near 1 means
    vocabulary grows as fast as the corpus (noise/IDs), β near 0 means
    a closed template vocabulary — Zipf's companion corpus-health
    signal (``q_zipf``), and the estimator for "how much new
    vocabulary will 10× more data buy".

    Shape: first occurrences are one (lang, word) min-aggregate; both
    growth curves are per-lang prefix sums (partitioned windows); the
    regression reuses the exact floor-quantized moment machinery from
    the Zipf fit verbatim — per-lang constant output, never a
    driver-side fit.

    NULL-text docs are excluded: a NULL doc first in a language makes
    cum_voc = 0 at its point, and ln(0) is NULL in Spark but an ERROR
    in DuckDB — divergent failure modes. With the filter both curves
    start >= 1 (an empty text still counts one '' token/word).
    NULL-lang docs are excluded for the same reason: the per-doc /
    first-occurrence join is on (lang, doc_id), and NULL join keys
    never match, so a NULL-lang group would carry cum_voc = 0 into
    the same ln(0) divergence.

    TOTAL under duplicate doc_ids (r07 identity campaign): the
    cumulative window tiebreaks equal doc_ids by md5(text), so the
    growth-curve points are content-determined instead of depending
    on which duplicate row an engine's sort visited first (the one
    order-ambiguity the r06 dup-id probe measured here). Unique ids
    never tie, so the extra key is inert on a PK-satisfying corpus;
    exact redelivery ties on the md5 too, but identical rows are
    interchangeable — either order yields the same point set."""
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("text").isNotNull() & F.col("lang").isNotNull()) \
        .withColumn("toks", F.split("text", " "))
    per_doc = docs.select(
        "lang", "doc_id", F.md5("text").alias("tb"),
        F.size("toks").alias("n_tok"))
    first = (docs.select("lang", "doc_id",
                         F.explode(F.array_distinct("toks")).alias("w"))
             .groupBy("lang", "w").agg(F.min("doc_id").alias("fd"))
             .groupBy("lang", F.col("fd").alias("doc_id"))
             .agg(F.count(F.lit(1)).alias("new_words")))
    w = (Window.partitionBy("lang").orderBy("doc_id", "tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pts = (per_doc.join(first, on=["lang", "doc_id"], how="left")
           .withColumn("cum_tok", F.sum("n_tok").over(w))
           .withColumn("cum_voc",
                       F.sum(F.coalesce("new_words", F.lit(0))).over(w))
           .selectExpr("lang", "ln(CAST(cum_tok AS DOUBLE)) AS x",
                       "ln(CAST(cum_voc AS DOUBLE)) AS y"))

    def q12(col: str):
        return (F.sum(F.floor(F.expr(col) * F.lit(1e12))
                      .cast("decimal(38,0)"))
                .alias("s" + col.replace(" * ", "")))

    mom = pts.groupBy("lang").agg(
        q12("x"), q12("y"), q12("x * y"), q12("x * x"), q12("y * y"),
        F.count(F.lit(1)).alias("n"))
    return mom.filter(F.col("n") >= 2).selectExpr(
        "lang", "CAST(n AS BIGINT) AS n_points",
        f"{ieee_round_sql(_Z_SLOPE, 6)} AS heaps_beta",
        f"{ieee_round_sql(_Z_INTERCEPT, 6)} AS intercept",
        f"{ieee_round_sql(_Z_R2, 6)} AS r2")


ORACLE_HEAPS = f"""
WITH d AS (SELECT lang, doc_id, md5(text) AS tb,
                  string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
per_doc AS (SELECT lang, doc_id, tb, len(toks) AS n_tok FROM d),
first AS (
    SELECT lang, fd AS doc_id, count(*) AS new_words
    FROM (SELECT lang, w, min(doc_id) AS fd
          FROM (SELECT lang, doc_id, unnest(list_distinct(toks)) AS w
                FROM d)
          GROUP BY lang, w)
    GROUP BY lang, fd),
pts AS (
    SELECT lang,
           ln(CAST(sum(n_tok) OVER lw AS DOUBLE)) AS x,
           ln(CAST(sum(coalesce(new_words, 0)) OVER lw AS DOUBLE)) AS y
    FROM per_doc LEFT JOIN first USING (lang, doc_id)
    WINDOW lw AS (PARTITION BY lang ORDER BY doc_id, tb
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
mom AS (
    SELECT lang,
           sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS sx,
           sum(CAST(floor(y * 1e12) AS DECIMAL(38,0))) AS sy,
           sum(CAST(floor(x * y * 1e12) AS DECIMAL(38,0))) AS sxy,
           sum(CAST(floor(x * x * 1e12) AS DECIMAL(38,0))) AS sxx,
           sum(CAST(floor(y * y * 1e12) AS DECIMAL(38,0))) AS syy,
           count(*) AS n
    FROM pts GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_points,
       {ieee_round_sql(_Z_SLOPE, 6)} AS heaps_beta,
       {ieee_round_sql(_Z_INTERCEPT, 6)} AS intercept,
       {ieee_round_sql(_Z_R2, 6)} AS r2
FROM mom WHERE n >= 2
"""
