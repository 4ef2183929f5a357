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

from pyspark.sql import DataFrame, SparkSession
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


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry demonstration of the salted join under the canonical
    hot-key shape: attach per-event_type statistics to every event row.
    event_type has single-digit cardinality, so a plain shuffle join
    would funnel each type's entire row set through one reducer — the
    exact skew the reference's partitioner tuning worked around; salting
    bounds the largest partition at |hot key| / n_salt. The result is
    provably equal to the plain join (that equality IS the DuckDB
    oracle), and `_salt` never escapes into the output schema."""
    from ..sources.tables import load_table
    e = load_table(spark, sf_dir, "events") \
        .select("event_id", "event_type", "value")
    stats = (e.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("type_n"),
                  F.round(F.sum("value"), 4).alias("type_sum")))
    # force the shuffle-join path: broadcasting the tiny stats side
    # would (correctly) make salting a no-op, which is not what this
    # query exists to demonstrate.
    out = salted_join(e, stats.hint("shuffle_hash"), ["event_type"],
                      n_salt=16)
    return out.select("event_id", "event_type", "value",
                      "type_n", "type_sum")


ORACLE_SALTED_JOIN = """
WITH stats AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS type_n,
           round(sum(value), 4) AS type_sum
    FROM events GROUP BY event_type)
SELECT event_id, e.event_type, value, type_n, type_sum
FROM events e JOIN stats USING (event_type)
"""
