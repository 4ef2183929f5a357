"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.3 notes the reference lacks it too; it's table stakes for
an analytics engine over event data).

Implementation is the scalable union-merge form, NOT a range cross-join:
tag left and right rows, union them, and carry the latest right payload
forward with ``last(..., ignorenulls=True)`` over an ordered window per
key. One shuffle + one sort per side — the same cost profile as a
sort-merge join, no quadratic candidate explosion, no range bucketing
to tune. At 100 TB this is the difference between a merge pass and an
O(n·m) blow-up on hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_ts: str, right_ts: str,
              payload_cols: list[str]) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_ts] <= left[left_ts]`` and the same ``by`` key
    (inclusive; left rows with no prior right row get NULL payloads).

    Ties on (by, ts) between left and right resolve right-first
    (inclusive semantics). Multiple right rows on the same (by, ts)
    must be pre-deduplicated by the caller for determinism.
    """
    l_tagged = left.select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("_payload"),
    )
    r_tagged = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_left"),
        F.struct(*payload_cols).alias("_payload"),
    )
    # right sorts before left at equal ts (_is_right desc) → inclusive <=
    w = (Window.partitionBy("_by")
         .orderBy(F.asc("_ts"), F.desc("_is_right"))
         .rowsBetween(Window.unboundedPreceding, 0))
    merged = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_matched", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_is_right") == 0)
    )
    out_cols = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_matched.{c}").alias(c) for c in payload_cols]
    return merged.select(*out_cols)


def q_asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the latest order (o_orderdate <= event ts) of the
    matching customer. Right side pre-deduplicated to one row per
    (custkey, date) for determinism."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (load_table(spark, sf_dir, "orders")
         .groupBy(F.col("o_custkey").alias("user_id"),
                  F.col("o_orderdate").alias("odate"))
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    return asof_join(e, o, by="user_id", left_ts="ts", right_ts="odate",
                     payload_cols=["o_orderkey", "odate"])


ORACLE_ASOF_EVENTS_ORDERS = """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
o AS (
    SELECT o_custkey AS user_id, o_orderdate AS odate,
           max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.odate
FROM ev e
ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.odate
"""
