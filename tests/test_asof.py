"""as-of join operator semantics on crafted data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from ngrams_collocations_hadoop_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (1, _ts("2024-01-01T08:00:00"), "early"),   # before any right row
         (2, _ts("2024-01-01T11:00:00"), "c"),       # key with no right rows
         (1, _ts("2024-01-01T09:00:00"), "exact")],  # ts == right ts → inclusive
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("name", T.StringType()),
        ]))
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 100),
         (1, _ts("2024-01-01T11:30:00"), 200)],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("val", T.LongType()),
        ]))
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts",
                    payload_cols=["val"])
    got = {r["name"]: r["val"] for r in out.collect()}
    assert got == {
        "a": 100,       # latest right at 09:00 <= 10:00
        "b": 200,       # 11:30 <= 12:00
        "early": None,  # no right row at or before 08:00
        "c": None,      # no right rows for key 2
        "exact": 100,   # inclusive: right at equal ts matches
    }
    assert out.count() == 5  # left row count preserved


def test_pit_enrich_no_leakage_at_exact_instant(spark, tmp_path):
    """An event that itself starts a new segment run must see the
    PREVIOUS version, not the one its own timestamp created — the
    no-leakage property that distinguishes strict PIT from inclusive
    as-of. First events get the none/0 sentinel."""
    import datetime

    from ngrams_collocations_hadoop_spark.operators.asof import (
        q_pit_enrich,
    )

    t0 = datetime.datetime(2024, 3, 1)

    def ev(eid, user, minutes, typ):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user,
                typ, 0.0, "{}")

    rows = [ev(1, 1, 0, "a"), ev(2, 1, 10, "a"), ev(3, 1, 20, "b"),
            ev(4, 1, 30, "a")]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")

    out = {r.event_id: (r.prev_seg, r.prev_version)
           for r in q_pit_enrich(spark, sf).collect()}
    assert out[1] == ("none", 0)   # nothing strictly before
    assert out[2] == ("a", 1)      # inside run 1
    assert out[3] == ("a", 1)      # starts run 2 -> sees run 1 only
    assert out[4] == ("b", 2)      # starts run 3 -> sees run 2 only


def test_attribution_window_and_last_touch(spark, tmp_path):
    """Purchase credits the LATEST click inside the lookback window:
    a newer click wins over an older one, a click outside the window
    leaves the purchase unattributed, and a click AFTER the purchase
    never counts."""
    import datetime

    import pandas as pd

    from ngrams_collocations_hadoop_spark.operators.asof import (
        ATTRIB_WINDOW_DAYS, q_attribution,
    )

    t0 = datetime.datetime(2024, 6, 10, 12, 0, 0)
    day = datetime.timedelta(days=1)
    rows = [
        # user 1: two clicks before purchase -> latest (id 2) credited
        (1, t0 - 3 * day, 1, "click", 0.0, "{}"),
        (2, t0 - 1 * day, 1, "click", 0.0, "{}"),
        (3, t0, 1, "purchase", 9.0, "{}"),
        # user 2: click outside the window -> unattributed
        (4, t0 - (ATTRIB_WINDOW_DAYS + 2) * day, 2, "click", 0.0, "{}"),
        (5, t0, 2, "purchase", 9.0, "{}"),
        # user 3: click only AFTER the purchase -> unattributed
        (6, t0 + day, 3, "click", 0.0, "{}"),
        (7, t0, 3, "purchase", 9.0, "{}"),
    ]
    sf = str(tmp_path)
    pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]).to_parquet(f"{sf}/events.parquet", index=False)

    out = {r.purchase_id: (r.attributed_click, r.lag_sec)
           for r in q_attribution(spark, sf).collect()}
    assert out[3] == (2, 86400)
    assert out[5] == (-1, -1)
    assert out[7] == (-1, -1)
