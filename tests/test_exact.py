"""Unit tests for the order-independent aggregation idiom
(`functions/exact.py`) — in particular the `_qterm` floor-form
quantizer that replaced per-row round(): the two must agree on every
≤6-decimal input, the emitted text must be the cheap IEEE form (no
BigDecimal round path), and the Spark and DuckDB evaluations of the
SAME generated text must match exactly.
"""

from __future__ import annotations

import duckdb
import pytest

from ngrams_collocations_hadoop_spark.functions.exact import (
    _qterm, uavg_sql, usum, usum_sql)

# Representative money/value rows: positives, negatives, values whose
# binary expansion sits just off the 1e-6 grid, and boundary .005/.0005
# shapes that historically flipped round(sum(..)) across engines.
VALUES = [0.0, 0.005, -0.005, 1.115, -1.115, 123456.654321,
          -123456.654321, 0.000001, -0.000001, 9999.9999,
          36380.111750, 2.675, -2.675, 0.1 + 0.2]


def test_qterm_round_emits_ieee_floor_form():
    t = _qterm("x", "1e6", "round")
    assert "floor" in t and "+ 0.5E0" in t and "round" not in t
    # the irrational-grid path is unchanged: plain floor, no half
    t2 = _qterm("x", "1e12", "floor")
    assert t2 == "floor((x) * 1e12)"


def test_qterm_matches_round_on_six_decimal_inputs(spark):
    """floor(x*1e6 + 0.5) == round(x*1e6) for every ≤6-decimal input
    (they can differ only at exact grid halves, which such inputs
    never produce) — including negatives, where floor's half-toward-
    +inf and round's HALF_UP would diverge IF a half occurred."""
    df = spark.createDataFrame([(v,) for v in VALUES], "x double")
    rows = df.selectExpr(
        f"CAST({_qterm('x', '1e6', 'round')} AS BIGINT) AS q_floor",
        "CAST(round(x * 1e6) AS BIGINT) AS q_round").collect()
    for r in rows:
        assert r.q_floor == r.q_round


def test_usum_spark_equals_duckdb_on_shared_text(spark):
    """The generated sum text evaluates identically in both engines —
    the exact property every oracle comparison depends on."""
    df = spark.createDataFrame([(v,) for v in VALUES], "x double")
    got_spark = df.agg(usum("x", scale=4).alias("s")).collect()[0].s
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) v(x)".format(
        ", ".join(f"({v!r}::DOUBLE)" for v in VALUES)))
    got_duck = con.execute(
        f"SELECT {usum_sql('x', scale=4)} FROM t").fetchone()[0]
    assert got_spark == pytest.approx(got_duck, abs=0.0)


def test_uavg_spark_equals_duckdb_on_shared_text(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "x double")
    from pyspark.sql import functions as F
    from ngrams_collocations_hadoop_spark.functions.exact import uavg
    got_spark = df.agg(uavg("x", scale=6).alias("a")).collect()[0].a
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) v(x)".format(
        ", ".join(f"({v!r}::DOUBLE)" for v in VALUES)))
    got_duck = con.execute(
        f"SELECT {uavg_sql('x', scale=6)} FROM t").fetchone()[0]
    assert got_spark == pytest.approx(got_duck, abs=0.0)


def test_usum_is_partition_order_independent(spark):
    """The quantized BIGINT sum gives one answer at any parallelism —
    the determinism property the idiom exists for."""
    df = spark.createDataFrame([(v,) for v in VALUES * 101], "x double")
    one = df.coalesce(1).agg(usum("x").alias("s")).collect()[0].s
    many = df.repartition(13).agg(usum("x").alias("s")).collect()[0].s
    assert one == many


def test_inlined_ieee_round_copies_match_helper_emission():
    """Several oracle f-strings carry the EXPANDED text of
    ieee_round_sql (baked in when the round()-boundary class was
    closed package-wide) rather than composing the helper. This scans
    every registry oracle for that expansion shape and asserts each
    copy is byte-identical to what ieee_round_sql emits TODAY for the
    same expression and scale — so a future change to the shared
    derivation (e.g. the 4e9 magnitude guard) cannot silently desync
    an inlined oracle copy from its Spark-side ieee_round twin."""
    import re

    from ngrams_collocations_hadoop_spark.functions.exact import (
        ieee_round_sql)
    from ngrams_collocations_hadoop_spark.registry import ORACLES

    pat = re.compile(
        r"CASE WHEN abs\(\((.+?)\)\) < [0-9e.]+ "
        r"THEN floor\(\(\1\) \* 1e(\d+) \+ 0\.5E0\) / 1e\2 "
        r"ELSE \(\1\) END", re.S)
    n = 0
    for name, sql in ORACLES.items():
        for m in pat.finditer(sql):
            expr, scale = m.group(1), int(m.group(2))
            assert m.group(0) == ieee_round_sql(expr, scale), (
                f"{name}: inlined ieee_round copy desynced from helper")
            n += 1
    # the copies exist today; if a refactor composes them away, update
    assert n >= 20, n
