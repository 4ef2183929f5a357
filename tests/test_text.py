"""Token cleaning (P3) and decade bucketing (P6) — column expression vs
the faithful Python port of reference NGramUtils.java:29-39 / :8."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ngrams_collocations_hadoop_spark.functions.text import (
    clean_token, clean_token_ref, decade,
)

# Edge cases from FIXTURES.md §"Edge-case rows" + Unicode sweep
CASES = [
    "hello",
    "Hello_NOUN",
    "_NOUN",
    "__",
    "",
    "   ",
    "--hello--",
    "'tis",
    "don't",
    "123abc...",
    "...",
    "a_b_c",
    "שלום",
    "--שלום!!",
    "中文词",
    "¡hola!",
    "CAFÉ_ADJ",
    "naïve",
    "x",
    "_",
    "a_",
    "_a_b",
    "te_st_POS extra",
    " spaced token ",
    "ALL_CAPS_VERB",
    "end.",
    "(paren)",
    "émigré_NOUN",
    "Ω_SYM",
    "½",        # No (Number, other) — is alnum in both \p{N} and unicodedata
    "©",
]


def test_clean_token_matches_reference_port(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["raw"])
    got = {r["raw"]: r["cleaned"]
           for r in df.select("raw", clean_token(F.col("raw")).alias("cleaned")).collect()}
    for c in CASES:
        assert got[c] == clean_token_ref(c), f"case {c!r}: spark={got[c]!r} ref={clean_token_ref(c)!r}"


@pytest.mark.parametrize("raw,expected", [
    ("Hello_NOUN", "hello"),
    ("_NOUN", "noun"),       # '_' at pos 0 is NOT a POS separator (idx > 0)
    ("--hello--", "hello"),
    ("a_b_c", "a"),
    ("123abc...", "123abc"),
    ("...", ""),
    ("", ""),
])
def test_clean_token_ref_cases(raw, expected):
    assert clean_token_ref(raw) == expected


def test_decade(spark):
    df = spark.createDataFrame([(y,) for y in [1999, 2000, 2001, 2009, 2010, 2029, 1900]], ["y"])
    got = [r["d"] for r in df.select(decade(F.col("y")).alias("d")).orderBy("y").collect()]
    assert got == [1900, 1990, 2000, 2000, 2000, 2010, 2020]
