"""Association measures for collocation scoring beyond the reference's
LLR: PMI, t-score, and Pearson chi-square over the same 2×2 contingency
counts (c1, c2, c12, N). All pure column expressions with matching SQL
generators (same operation order for float64 reproducibility).

These generalize reference C1 (LLR.java) — a user who wants a different
association measure swaps the scoring expression; the pipeline shape is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pmi(c1: Column, c2: Column, c12: Column, n: Column) -> Column:
    """Pointwise mutual information: ln(p12 / (p1·p2))."""
    valid = (c1 > 0) & (c2 > 0) & (c12 > 0) & (n > 0)
    val = F.log((c12.cast("double") * n.cast("double"))
                / (c1.cast("double") * c2.cast("double")))
    return F.when(valid, val).otherwise(F.lit(None).cast("double"))


def pmi_sql(c1: str, c2: str, c12: str, n: str) -> str:
    valid = f"({c1} > 0 AND {c2} > 0 AND {c12} > 0 AND {n} > 0)"
    val = (f"ln((CAST({c12} AS DOUBLE) * CAST({n} AS DOUBLE)) / "
           f"(CAST({c1} AS DOUBLE) * CAST({c2} AS DOUBLE)))")
    return f"(CASE WHEN {valid} THEN {val} ELSE NULL END)"


def t_score(c1: Column, c2: Column, c12: Column, n: Column) -> Column:
    """t-score: (c12 - c1·c2/N) / sqrt(c12)."""
    valid = (c12 > 0) & (n > 0)
    expected = c1.cast("double") * c2.cast("double") / n.cast("double")
    val = (c12.cast("double") - expected) / F.sqrt(c12.cast("double"))
    return F.when(valid, val).otherwise(F.lit(None).cast("double"))


def t_score_sql(c1: str, c2: str, c12: str, n: str) -> str:
    valid = f"({c12} > 0 AND {n} > 0)"
    expected = f"(CAST({c1} AS DOUBLE) * CAST({c2} AS DOUBLE) / CAST({n} AS DOUBLE))"
    val = f"((CAST({c12} AS DOUBLE) - {expected}) / sqrt(CAST({c12} AS DOUBLE)))"
    return f"(CASE WHEN {valid} THEN {val} ELSE NULL END)"


def chi_square(c1: Column, c2: Column, c12: Column, n: Column) -> Column:
    """Pearson χ² for the 2×2 table, computed as
    N·(k11·k22 − k12·k21)² / (row1·row2·col1·col2)."""
    k11 = c12.cast("double")
    k12 = (c1 - c12).cast("double")
    k21 = (c2 - c12).cast("double")
    k22 = (n - c1 - c2 + c12).cast("double")
    row1, row2 = k11 + k12, k21 + k22
    col1, col2 = k11 + k21, k12 + k22
    denom = row1 * row2 * col1 * col2
    valid = ((k11 >= 0) & (k12 >= 0) & (k21 >= 0) & (k22 >= 0)
             & (denom > 0) & (n > 0))
    num = n.cast("double") * (k11 * k22 - k12 * k21) * (k11 * k22 - k12 * k21)
    return F.when(valid, num / denom).otherwise(F.lit(None).cast("double"))


def chi_square_sql(c1: str, c2: str, c12: str, n: str) -> str:
    k11 = f"CAST({c12} AS DOUBLE)"
    k12 = f"CAST({c1} - {c12} AS DOUBLE)"
    k21 = f"CAST({c2} - {c12} AS DOUBLE)"
    k22 = f"CAST({n} - {c1} - {c2} + {c12} AS DOUBLE)"
    row1, row2 = f"({k11} + {k12})", f"({k21} + {k22})"
    col1, col2 = f"({k11} + {k21})", f"({k12} + {k22})"
    denom = f"({row1} * {row2} * {col1} * {col2})"
    det = f"({k11} * {k22} - {k12} * {k21})"
    valid = (f"({k11} >= 0 AND {k12} >= 0 AND {k21} >= 0 AND {k22} >= 0 "
             f"AND {denom} > 0 AND {n} > 0)")
    val = f"(CAST({n} AS DOUBLE) * {det} * {det} / {denom})"
    return f"(CASE WHEN {valid} THEN {val} ELSE NULL END)"
