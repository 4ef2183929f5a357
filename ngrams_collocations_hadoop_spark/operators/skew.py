"""Skew mitigation: salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; this operator is the explicit fallback for pathological hot
keys — e.g. joining an ngram table against per-token statistics where
one token accounts for 10% of all rows. Salting fans a hot key into
``n_salt`` sub-keys on the large side and replicates the matching
small-side rows, bounding the largest shuffle partition at
|hot key| / n_salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, small: DataFrame, keys: list[str],
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``keys`` with salting.

    The large side gets a deterministic per-row salt (hash of the whole
    row, mod n_salt — deterministic so retried tasks salt identically);
    the small side is exploded ×n_salt so every (key, salt) pair finds
    its match. Result equals the plain join exactly.
    """
    large_salted = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]),
                        F.lit(n_salt)).cast("int"))
    small_salted = (
        small.withColumn(
            "_salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})")))
        .withColumn("_salt", F.col("_salt").cast("int")))
    out = large_salted.join(small_salted, on=keys + ["_salt"], how=how)
    return out.drop("_salt")
