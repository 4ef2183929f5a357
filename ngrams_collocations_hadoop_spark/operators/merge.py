"""MERGE / upsert emulation (no Delta/Iceberg jars in this image —
the pattern is anti-join + union, per the classic pre-ACID recipe; on
a lakehouse table format the same logic is one MERGE INTO statement).

``merge_upsert``: rows from ``updates`` replace matching ``target``
rows (by key) and new keys are appended — the UPDATE+INSERT halves of
MERGE. Scale: one shuffle join on the key (broadcast when updates are
small), one union; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: list[str]) -> DataFrame:
    """UPDATE matched + INSERT unmatched. Schemas must align."""
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a derived change set into orders: open orders get a 10%
    price bump (updates), and one synthetic new order per customer is
    inserted (inserts)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    # the 10% bump in exact integer units: price * 1.1 on a .xx5-ending
    # price lands EXACTLY on a 4-decimal half, where the engines' float
    # round() disagree (functions/exact.py); 1e7-unit ints * 11 keep it
    # exact, derived once with the shared floor-half text
    updates = (o.filter(F.col("o_orderstatus") == "O")
               .withColumn("o_totalprice", F.expr(
                   "floor((CAST(floor(o_totalprice * 1e7 + 0.5E0) AS BIGINT) * 11 "
                   "+ 5000) / 10000) / 1e4")))
    max_key = 10_000_000
    inserts = (load_table(spark, sf_dir, "customer")
               .select((F.col("c_custkey") + max_key).alias("o_orderkey"),
                       F.col("c_custkey").alias("o_custkey"),
                       F.lit("N").alias("o_orderstatus"),
                       F.lit(0.0).alias("o_totalprice")))
    merged = merge_upsert(o, updates.unionByName(inserts), ["o_orderkey"])
    return merged.withColumn("o_totalprice", F.round("o_totalprice", 4))


ORACLE_MERGE_UPSERT = """
WITH updates AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           floor((CAST(floor(o_totalprice * 1e7 + 0.5E0) AS BIGINT) * 11
                  + 5000) / 10000) / 1e4 AS o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT c_custkey + 10000000, c_custkey, 'N', 0.0 FROM customer)
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice
FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 4) FROM updates
"""


def scd2_apply(current: DataFrame, changes: DataFrame, key: str,
               tracked: list[str], change_ts: str) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose
    tracked attributes changed (set valid_to = change ts) and append the
    new versions as open rows (valid_to NULL). ``current`` must carry
    valid_from/valid_to columns; ``changes`` carries ``change_ts``.

    Change detection is a per-column null-safe equality conjunction
    (``eqNullSafe``), not a concatenated-string compare: concat_ws
    skips NULLs, so a tracked attribute flipping between NULL and ''
    (or a value shifting across a NULL column boundary) would compare
    equal and the change would be silently dropped.

    The contract is ONE change row per key per application; a feed with
    multiple versions per key is collapsed to the latest ``change_ts``
    (deterministic given unique (key, change_ts)) — otherwise each
    change row would fan out the closed rows.
    """
    w_latest = Window.partitionBy(key).orderBy(F.col(change_ts).desc())
    changes = (changes.withColumn("_rn", F.row_number().over(w_latest))
               .filter(F.col("_rn") == 1).drop("_rn"))
    cur_open = current.filter(F.col("valid_to").isNull())
    joined = cur_open.alias("c").join(
        changes.alias("n"), on=key, how="inner")
    same = F.lit(True)
    for t in tracked:
        same = same & F.col(f"c.{t}").eqNullSafe(F.col(f"n.{t}"))
    changed_keys = joined.filter(~same).select(
        F.col(key), F.col(f"n.{change_ts}").alias("_new_ts"))

    closed = (current.join(changed_keys, on=key, how="left")
              .withColumn(
                  "valid_to",
                  F.when(F.col("valid_to").isNull()
                         & F.col("_new_ts").isNotNull(),
                         F.col("_new_ts")).otherwise(F.col("valid_to")))
              .drop("_new_ts"))
    new_rows = (changes.join(changed_keys.select(key), on=key)
                .withColumn("valid_from", F.col(change_ts))
                .withColumn("valid_to", F.lit(None).cast("timestamp"))
                .drop(change_ts))
    return closed.unionByName(new_rows, allowMissingColumns=False)
