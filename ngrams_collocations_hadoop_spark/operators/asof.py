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
from .relational import EVENTS_US as _EVENTS_US


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_ts: str, right_ts: str,
              payload_cols: list[str],
              inclusive: bool = True) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_ts] <= left[left_ts]`` and the same ``by`` key
    (left rows with no prior right row get NULL payloads). With
    ``inclusive=False`` the bound is STRICT (<) — the point-in-time /
    no-leakage form: a feature row stamped at exactly the label's
    timestamp must NOT be visible to it.

    Ties on (by, ts) between left and right resolve right-first when
    inclusive (right row visible at its own instant), left-first when
    strict. Multiple right rows on the same (by, ts) must be
    pre-deduplicated by the caller for determinism.
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
    # inclusive: right sorts before left at equal ts (_is_right desc)
    # so the left row sees it; strict: left first, so it does not.
    tie = F.desc("_is_right") if inclusive else F.asc("_is_right")
    w = (Window.partitionBy("_by")
         .orderBy(F.asc("_ts"), tie)
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
    # NULL-custkey orders are unreachable by the oracle's ASOF equi-
    # join but the union-merge's PARTITION BY groups NULLs together
    # (same hazard as q_pit_enrich's dim) — drop them from the right
    # side; NULL-uid events then stay unmatched on both sides.
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey").isNotNull())
         .groupBy(F.col("o_custkey").alias("user_id"),
                  F.col("o_orderdate").alias("odate"))
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    return asof_join(e, o, by="user_id", left_ts="ts", right_ts="odate",
                     payload_cols=["o_orderkey", "odate"])


ORACLE_ASOF_EVENTS_ORDERS = f"""
WITH ev AS {_EVENTS_US},
o AS (
    SELECT o_custkey AS user_id, o_orderdate AS odate,
           max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.odate
FROM ev e
ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.odate
"""


# --- point-in-time dimension enrichment (leakage-safe feature join) -----

def q_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of the event stream against the SCD2
    dimension history (``q_scd2_history``): each event is enriched with
    the segment version that was valid STRICTLY BEFORE its timestamp —
    the leakage-safe lookup a feature store must guarantee (an
    attribute change stamped at the label's own instant is the label's
    CONSEQUENCE, not its feature). First events carry the 'none'/0
    sentinel.

    Scale shape: the same union-merge as ``asof_join`` (one shuffle +
    sort per user, no range explosion), with the strict tie order —
    at equal timestamps the event sorts BEFORE the dimension start it
    itself triggered. The oracle is an INDEPENDENT formulation (max
    prior version via join + QUALIFY), so the merge trick is checked
    against plain relational semantics, not against itself."""
    from .relational import q_scd2_history

    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts", "event_type")
    # Anonymous dim rows (NULL user_id) are unreachable by the oracle's
    # equi-join (NULL never matches `=`), but the union-merge's window
    # PARTITION BY groups NULLs TOGETHER — a NULL-uid event would see a
    # NULL-uid "history" the relational formulation says doesn't exist.
    # Drop them from the dim: anonymous events then take the 'none'/0
    # sentinel on both sides.
    dim = q_scd2_history(spark, sf_dir).select(
        "user_id", F.col("event_type").alias("seg_type"),
        "valid_from", "version").filter(F.col("user_id").isNotNull())
    # asof_join contract: one right row per (by, ts). Two same-instant
    # events with different types can start two runs at one
    # valid_from; keep the max version (what any strictly-later event
    # observes, and the oracle's QUALIFY pick) so the merge stays
    # deterministic under any partitioning.
    wd = Window.partitionBy("user_id", "valid_from")         .orderBy(F.desc("version"))
    dim = (dim.withColumn("_rn", F.row_number().over(wd))
           .filter(F.col("_rn") == 1).drop("_rn"))
    out = asof_join(ev, dim, by="user_id", left_ts="ts",
                    right_ts="valid_from",
                    payload_cols=["seg_type", "version"],
                    inclusive=False)
    return out.select(
        "event_id", "user_id", "event_type",
        F.coalesce("seg_type", F.lit("none")).alias("prev_seg"),
        F.coalesce("version", F.lit(0)).cast("long").alias("prev_version"))


from .relational import SCD2_STARTS_SQL as _SCD2_STARTS_SQL

ORACLE_PIT_ENRICH = f"""
WITH ev AS {_EVENTS_US},
starts AS (
    SELECT user_id, event_type AS seg_type, ts AS valid_from,
           CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS BIGINT) AS version
    FROM ({_SCD2_STARTS_SQL}) runs)
SELECT e.event_id, e.user_id, e.event_type,
       coalesce(s.seg_type, 'none') AS prev_seg,
       coalesce(s.version, 0) AS prev_version
FROM ev e LEFT JOIN starts s
  ON s.user_id = e.user_id AND s.valid_from < e.ts
QUALIFY row_number() OVER (PARTITION BY e.event_id
                           ORDER BY s.version DESC NULLS LAST) = 1
"""


# --- last-touch attribution ---------------------------------------------

ATTRIB_WINDOW_DAYS = 7


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every ``purchase`` event credits the
    user's most recent ``click`` within the lookback window — the
    join that prices marketing channels. Same union-merge as
    ``asof_join`` (inclusive bound: a click at the purchase instant
    counts), then a window-bound filter; purchases with no qualifying
    click report the unattributed sentinel, because "no touch" is the
    number the channel report actually needs."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    # NULL-uid clicks are unreachable by the oracle's equi-join but the
    # union-merge's PARTITION BY groups NULLs together (same hazard as
    # q_pit_enrich's dim): drop them, so anonymous purchases report the
    # unattributed sentinel on both sides.
    clicks = ev.filter((F.col("event_type") == "click")
                       & F.col("user_id").isNotNull()) \
        .select("user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"))
    # asof_join contract: one right row per (by, ts) — keep the max
    # click_id among same-instant clicks (the oracle's DESC tiebreak)
    wt = Window.partitionBy("user_id", "click_ts") \
        .orderBy(F.desc("click_id"))
    clicks = (clicks.withColumn("_rn", F.row_number().over(wt))
              .filter(F.col("_rn") == 1).drop("_rn"))
    out = asof_join(purchases, clicks, by="user_id", left_ts="ts",
                    right_ts="click_ts",
                    payload_cols=["click_id", "click_ts"])
    in_window = (F.col("click_ts").isNotNull()
                 & (F.col("click_ts") >= F.col("ts")
                    - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")))
    return out.select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.when(in_window, F.col("click_id")).otherwise(F.lit(-1))
        .cast("long").alias("attributed_click"),
        F.when(in_window,
               F.col("ts").cast("long") - F.col("click_ts").cast("long"))
        .otherwise(F.lit(-1)).cast("long").alias("lag_sec"))


ORACLE_ATTRIBUTION = f"""
WITH ev AS {_EVENTS_US},
p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM ev WHERE event_type = 'click'),
best AS (
    SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id AND c.click_ts <= p.ts
    QUALIFY row_number() OVER (PARTITION BY p.event_id
        ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC) = 1)
SELECT event_id AS purchase_id, user_id,
       CASE WHEN click_ts IS NOT NULL
             AND click_ts >= ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAYS
            THEN click_id ELSE -1 END AS attributed_click,
       CASE WHEN click_ts IS NOT NULL
             AND click_ts >= ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAYS
            THEN CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(click_ts)) AS BIGINT)
            ELSE -1 END AS lag_sec
FROM best
"""
