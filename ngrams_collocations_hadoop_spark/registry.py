"""The query registry — the driver-facing API surface.

``QUERIES`` maps a query name to a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES`` maps the same name to equivalent DuckDB SQL (omitted for
genuinely non-SQL-expressible operators, which get the driver's weaker
rows-only check). ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import oracle
from .operators import collocations as co

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    # --- collocation pipeline (reference parity, SURVEY.md §2.9) ---
    "colloc_unigram_counts": co.q_unigram_counts,   # A2 (+P1-P6, J4)
    "colloc_bigram_counts": co.q_bigram_counts,     # A3 (+P1-P6, J4)
    "colloc_totals": co.q_totals,                   # A4
    "colloc_scored": co.q_scored,                   # J1+J2+J3+C1+P7
    "colloc_topk": co.q_topk,                       # + T1-T3 (flagship)
}

ORACLES: dict[str, str] = {
    "colloc_unigram_counts": oracle.colloc_unigram_counts_sql(),
    "colloc_bigram_counts": oracle.colloc_bigram_counts_sql(),
    "colloc_totals": oracle.colloc_totals_sql(),
    "colloc_scored": oracle.colloc_scored_sql(),
    "colloc_topk": oracle.colloc_topk_sql(),
}
