"""Reference-shaped ngram record streams derived from the `documents`
fixture table (FIXTURES.md §B derivation rule — deterministic, no RNG).

The reference consumes Google N-Grams records
(``ngram \\t year \\t occurrences``; parsing at reference
``Job1.java:126-137`` for unigrams, ``Job1.java:166-181`` for bigrams).
Here the same record families are derived from `documents`:

  unigram records: (lang, token, year, occurrences) — one per token
  bigram records:  (lang, token1, token2, year, occurrences) — one per
                   adjacent token pair

with ``year = 2000 + doc_id % 30`` and ``occurrences = 1 + doc_id % 5``.

Everything is a column expression (split / transform / explode) — token
pairing happens inside codegen with zero shuffles; at 100 TB this stage
is a pure map over the document scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import TRANSLIT_HEBREW, TRANSLIT_LATIN
from ..sources.tables import fan_out as _fan_out, load_table

# The Hebrew corpus derivation (reference second corpus,
# ``Stopwords.java`` heb block): lower() then codepoint translate().
# The expression is shared between the Spark operators (F.expr) and
# the DuckDB oracle EXCEPT for the lower() itself: DuckDB's simple
# case map diverges from Java/Spark on U+0130 and word-final Σ, so
# the oracle variant uses the Java-semantics emulation
# (functions/text.py::_java_lower_duckdb).
def hebrew_text_sql(dialect: str = "spark") -> str:
    from ..functions.text import _java_lower_duckdb

    low = (_java_lower_duckdb("text") if dialect == "duckdb"
           else "lower(text)")
    return f"translate({low}, '{TRANSLIT_LATIN}', '{TRANSLIT_HEBREW}')"


HEBREW_TEXT_SQL = hebrew_text_sql("spark")


def _docs_with_tokens(spark: SparkSession, sf_dir: str,
                      text_sql: str = "text",
                      lang_sql: str = "lang",
                      where_sql: str = "TRUE") -> DataFrame:
    docs = _fan_out(load_table(spark, sf_dir, "documents"))
    return docs.filter(F.expr(where_sql)).select(
        "doc_id", F.expr(lang_sql).alias("lang"),
        (F.lit(2000) + F.col("doc_id") % 30).cast("long").alias("year"),
        (F.lit(1) + F.col("doc_id") % 5).cast("long").alias("occurrences"),
        F.split(F.expr(text_sql), " ").alias("ts"),
    )


def unigram_records(spark: SparkSession, sf_dir: str,
                    text_sql: str = "text",
                    lang_sql: str = "lang",
                    where_sql: str = "TRUE",
                    docs: DataFrame | None = None) -> DataFrame:
    """(lang, token, year, occurrences) — raw, pre-cleaning.

    ``docs`` lets a caller that also builds the bigram stream pass ONE
    shared ``_docs_with_tokens`` subtree (r10): the two streams' source
    plans are identical, and constructing it twice cost ~0.16 s of
    driver py4j round-trips per query construction. Plan-identical —
    Catalyst canonicalized the two copies anyway."""
    if docs is None:
        docs = _docs_with_tokens(spark, sf_dir, text_sql, lang_sql,
                                 where_sql)
    return docs.select("lang", "year", "occurrences",
                       F.explode("ts").alias("token"))


# The Hebrew corpus derives from the ENGLISH documents only (one
# source corpus -> one derived corpus, mirroring the reference's
# separate eng/heb EMR runs); the injective transliteration then makes
# the he pipeline output exactly the transliterated en output — pinned
# by test_hebrew_pipeline_parity.
HEBREW_WHERE_SQL = "lang = 'en'"


def hebrew_unigram_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram records of the derived Hebrew corpus (lang='he')."""
    return unigram_records(spark, sf_dir, HEBREW_TEXT_SQL, "'he'",
                           HEBREW_WHERE_SQL)


def bigram_records(spark: SparkSession, sf_dir: str,
                   text_sql: str = "text",
                   lang_sql: str = "lang",
                   where_sql: str = "TRUE",
                   keep_doc: bool = False,
                   docs: DataFrame | None = None) -> DataFrame:
    """(lang, token1, token2, year, occurrences) — adjacent pairs.

    `transform` over a slice pairs ts[i] with ts[i+1] entirely JVM-side
    (Spark SQL array subscripts are 0-based); single-token documents
    produce no pairs. ``keep_doc=True`` carries the source ``doc_id``
    (the deterministic map-task surrogate of the quirk-emulation
    surface needs it). ``docs`` shares the source subtree with a
    sibling ``unigram_records`` (see there)."""
    pairs = F.expr(
        "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), "
        "(x, i) -> struct(x AS token1, ts[i + 1] AS token2))"
    )
    extra = ["doc_id"] if keep_doc else []
    if docs is None:
        docs = _docs_with_tokens(spark, sf_dir, text_sql, lang_sql,
                                 where_sql)
    return (
        docs
        .select(*extra, "lang", "year", "occurrences",
                F.explode(pairs).alias("bg"))
        .select(*extra, "lang", F.col("bg.token1").alias("token1"),
                F.col("bg.token2").alias("token2"), "year", "occurrences")
    )


def hebrew_bigram_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram records of the derived Hebrew corpus (lang='he')."""
    return bigram_records(spark, sf_dir, HEBREW_TEXT_SQL, "'he'",
                          HEBREW_WHERE_SQL)


# --- DuckDB-oracle CTE bodies (same derivation in ANSI SQL) -------------

def unigram_records_sql(text_sql: str = "text",
                        lang_sql: str = "lang",
                        where_sql: str = "TRUE") -> str:
    return f"""
    SELECT {lang_sql} AS lang,
           CAST(2000 + doc_id % 30 AS BIGINT) AS year,
           CAST(1 + doc_id % 5 AS BIGINT) AS occurrences,
           unnest(string_split({text_sql}, ' ')) AS token
    FROM documents WHERE {where_sql}
"""


def bigram_records_sql(text_sql: str = "text",
                       lang_sql: str = "lang",
                       where_sql: str = "TRUE",
                       keep_doc: bool = False) -> str:
    doc_col = "doc_id," if keep_doc else ""
    return f"""
    SELECT {doc_col}
           lang,
           ts[i] AS token1,
           ts[i + 1] AS token2,
           year,
           occurrences
    FROM (
        SELECT doc_id,
               {lang_sql} AS lang,
               CAST(2000 + doc_id % 30 AS BIGINT) AS year,
               CAST(1 + doc_id % 5 AS BIGINT) AS occurrences,
               string_split({text_sql}, ' ') AS ts
        FROM documents WHERE {where_sql}
    ) t, UNNEST(range(1, len(ts))) AS u(i)
"""


UNIGRAM_RECORDS_SQL = unigram_records_sql()
BIGRAM_RECORDS_SQL = bigram_records_sql()
