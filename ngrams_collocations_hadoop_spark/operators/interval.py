"""Interval/range-join and multi-resolution time-rollup operators.

The reference implements no temporal joins at all (SURVEY.md §2.3:
"Not implemented anywhere in the reference: theta/range/as-of/interval
joins"); these are the standard event-pipeline shapes built Spark-first.

Scale design — the range join:
A naive range join (`a JOIN b ON a.user = b.user AND b.ts BETWEEN ...`)
becomes an equi-join on `user` with the range as a post-join filter.
That is correct, but a hot key (one user with millions of events)
produces |a_u|×|b_u| intermediate pairs before the filter — quadratic
in the hot key. The bucket-expansion form joins on
`(user, time_bucket)` where the probe side explodes into the (at most
two, for window ≤ bucket width) buckets its window overlaps: pairs are
bounded to events in *adjacent buckets*, which at 100 TB keeps every
task's work proportional to events-per-bucket, not events-per-user.
The exact range predicate still applies after the bucket equi-join, so
results are identical to the naive form (the DuckDB oracle IS the
naive form).

The rollup produces hour/day/all-resolution aggregates in ONE pass
(grouping-sets expansion inside HashAggregate — Spark reuses the scan
and shuffles the expanded groups once) instead of one job per
resolution, the hypertable "continuous aggregate" shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import usum, usum_sql

from ..sources.tables import load_table

# 10-minute follow window = 600 s, equal to the bucket width, so every
# probe window overlaps exactly two buckets.
FOLLOW_WINDOW_S = 600
LEAD_TYPE = "click"
FOLLOW_TYPE = "purchase"

# single definition of the gated events scan — see relational.py
from .relational import EVENTS_US


def range_join_follow_counts(events: DataFrame,
                             lead_type: str = LEAD_TYPE,
                             follow_type: str = FOLLOW_TYPE,
                             window_s: int = FOLLOW_WINDOW_S) -> DataFrame:
    """Per lead-type event: how many follow-type events the same user
    produced in the (ts, ts + window_s] interval. Zero-match leads are
    kept (left semantics via count-reattach)."""
    a = (events.filter(F.col("event_type") == lead_type)
         .select("event_id", "user_id", F.col("ts").alias("ts_a"),
                 F.unix_timestamp("ts").alias("sec_a")))
    b = (events.filter(F.col("event_type") == follow_type)
         .select(F.col("user_id").alias("user_b"),
                 F.col("ts").alias("ts_b"),
                 (F.unix_timestamp("ts") / window_s).cast("long")
                 .alias("bucket")))
    # Probe side covers both buckets its window can overlap; each match
    # lands in exactly one (the follow event's own bucket), so the
    # bucket join introduces no duplicate pairs.
    exploded = a.select(
        "event_id", "user_id", "ts_a",
        F.explode(F.expr(
            f"sequence(sec_a div {window_s}, "
            f"(sec_a + {window_s}) div {window_s})")).alias("bucket"))
    matches = (
        exploded.join(b, on=(exploded.user_id == b.user_b)
                      & (exploded.bucket == b.bucket))
        .filter((F.col("ts_b") > F.col("ts_a"))
                & (F.col("ts_b") <= F.col("ts_a")
                   + F.expr(f"INTERVAL {window_s} SECOND")))
        .groupBy("event_id").agg(F.count(F.lit(1)).alias("n_follow"))
    )
    return (a.join(matches, on="event_id", how="left")
            .select("event_id", "user_id",
                    F.coalesce("n_follow", F.lit(0)).cast("long")
                    .alias("n_follow")))


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return range_join_follow_counts(load_table(spark, sf_dir, "events"))


ORACLE_RANGE_JOIN = f"""
WITH a AS (SELECT event_id, user_id, ts FROM {EVENTS_US} e
           WHERE event_type = '{LEAD_TYPE}'),
     b AS (SELECT user_id, ts FROM {EVENTS_US} e
           WHERE event_type = '{FOLLOW_TYPE}')
SELECT a.event_id, a.user_id,
       CAST(count(b.ts) AS BIGINT) AS n_follow
FROM a LEFT JOIN b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {FOLLOW_WINDOW_S} SECOND
GROUP BY a.event_id, a.user_id
"""


def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Hour + day + grand-total aggregates per event_type in one pass
    via ROLLUP(day, hour); `resolution` labels each output stratum and
    `bucket_ts` is the stratum's bucket start (NULL for the total)."""
    e = events.select(
        "event_type", "value",
        F.date_trunc("day", "ts").alias("day_b"),
        F.date_trunc("hour", "ts").alias("hour_b"))
    # Spark's rollup() has no "plain key + ROLLUP(...)" form, so roll up
    # all three keys and keep the strata where event_type is grouped —
    # exactly GROUP BY event_type, ROLLUP(day_b, hour_b). Stratum
    # detection uses grouping() flags, not bucket NULL-ness.
    rolled = (e.rollup("event_type", "day_b", "hour_b")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   usum("value").alias("sum_value"),
                   F.grouping("event_type").alias("g_et"),
                   F.grouping("day_b").alias("g_day"),
                   F.grouping("hour_b").alias("g_hour"))
              .filter(F.col("g_et") == 0))
    resolution = (F.when(F.col("g_hour") == 0, F.lit("hour"))
                  .when(F.col("g_day") == 0, F.lit("day"))
                  .otherwise(F.lit("all")))
    bucket = F.when(F.col("g_hour") == 0, F.col("hour_b")) \
        .when(F.col("g_day") == 0, F.col("day_b"))
    # bucket_ts is emitted as a formatted string ('' for the total
    # stratum): a NULL timestamp is the one value whose cross-engine
    # pandas/hash representation is not trustworthy (ns- vs µs-unit
    # NaT), and the resolution column already carries the stratum.
    bucket_str = F.coalesce(
        F.date_format(bucket, "yyyy-MM-dd HH:mm:ss"), F.lit(""))
    return rolled.select(
        "event_type", resolution.alias("resolution"),
        bucket_str.alias("bucket_ts"), "n_events", "sum_value")


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hypertable_rollup(load_table(spark, sf_dir, "events"))


ORACLE_HYPERTABLE_ROLLUP = f"""
WITH e AS (SELECT event_type, value,
                  date_trunc('day', ts) AS day_b,
                  date_trunc('hour', ts) AS hour_b
           FROM {EVENTS_US} events)
SELECT event_type,
       CASE WHEN GROUPING(hour_b) = 0 THEN 'hour'
            WHEN GROUPING(day_b) = 0 THEN 'day'
            ELSE 'all' END AS resolution,
       coalesce(strftime(coalesce(hour_b, day_b),
                         '%Y-%m-%d %H:%M:%S'), '') AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n_events,
       {usum_sql("value")} AS sum_value
FROM e
GROUP BY event_type, ROLLUP(day_b, hour_b)
"""
