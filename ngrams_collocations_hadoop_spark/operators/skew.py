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

from ..functions.exact import usum, usum_sql
from .relational import EVENTS_VFIN, EVENTS_VFIN_SUB


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
                  usum("value").alias("type_sum")))
    # force the shuffle-join path: broadcasting the tiny stats side
    # would (correctly) make salting a no-op, which is not what this
    # query exists to demonstrate.
    out = salted_join(e, stats.hint("shuffle_hash"), ["event_type"],
                      n_salt=16)
    return out.select("event_id", "event_type", "value",
                      "type_n", "type_sum")


ORACLE_SALTED_JOIN = f"""
WITH stats AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS type_n,
           {usum_sql("value")} AS type_sum
    FROM {EVENTS_VFIN} WHERE ts IS NOT NULL GROUP BY event_type)
SELECT event_id, e.event_type, value, type_n, type_sum
FROM {EVENTS_VFIN_SUB} e JOIN stats USING (event_type)
WHERE ts IS NOT NULL
"""


# --- bloom-prefilter semi-join (explicit runtime filter) ----------------

BLOOM_M = 1 << 17          # filter bits; ~1% fp at ~8k keys with k=3
BLOOM_WORDS = BLOOM_M // 64
BLOOM_SEEDS = (1, 2, 3)    # extra literal mixed into xxhash64 per probe


def bloom_bitmap(keys: DataFrame, key: str) -> DataFrame:
    """Build an ``BLOOM_M``-bit bloom filter of ``keys[key]`` as a
    single-row DataFrame with one ``array<long>`` column ``bloom``
    (``BLOOM_WORDS`` little-endian 64-bit words) — broadcastable state,
    never collected to the driver.

    Shape: 3 hash positions per key fan out map-side; the bit-OR
    aggregation shuffles at most 3·|keys| tiny rows into
    ``BLOOM_WORDS`` groups; a left join against ``range(BLOOM_WORDS)``
    densifies absent words to 0; a final sorted collect_list packs the
    words into one deterministic array (sorted ⇒ order-independent)."""
    spark = keys.sparkSession
    pos = keys.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(BLOOM_M))
        for s in BLOOM_SEEDS])).alias("pos"))
    masks = (pos.select(
        (F.col("pos") / 64).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        .alias("m"))
        .groupBy("word").agg(F.bit_or("m").alias("mask")))
    dense = (spark.range(BLOOM_WORDS)
             .join(masks, F.col("id") == F.col("word"), "left")
             .select("id", F.coalesce("mask", F.lit(0)).alias("mask")))
    return dense.groupBy().agg(
        F.transform(F.array_sort(F.collect_list(F.struct("id", "mask"))),
                    lambda s: s["mask"]).alias("bloom"))


def bloom_prefilter_semi_join(probe: DataFrame, probe_key: str,
                              build: DataFrame, build_key: str) -> DataFrame:
    """LEFT SEMI join with an explicit bloom runtime filter: the probe
    side is prefiltered map-side against a broadcast bitmap of the
    build keys BEFORE the exact semi-join, so at scale the shuffle
    carries only probable matches (plus the bloom's false positives)
    instead of the full probe table. Result is exactly the plain
    semi-join — blooms have no false negatives.

    This is the manual form of Spark's injected runtime bloom filters
    (spark.sql.optimizer.runtime.bloomFilter.*), exposed as an operator
    so the pattern works on plans the optimizer won't rewrite."""
    bm = bloom_bitmap(build.select(build_key), build_key)
    checks = [
        (F.expr(f"shiftright(element_at(bloom, CAST(pmod(xxhash64("
                f"{probe_key}, {s}), {BLOOM_M}) / 64 AS INT) + 1), "
                f"CAST(pmod(xxhash64({probe_key}, {s}), {BLOOM_M}) % 64 "
                f"AS INT))").bitwiseAND(F.lit(1)) == 1)
        for s in BLOOM_SEEDS]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    survivors = probe.crossJoin(F.broadcast(bm)).filter(cond).drop("bloom")
    return survivors.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        on=probe_key, how="left_semi")


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry demonstration: lineitems belonging to URGENT orders via
    the bloom-prefiltered semi-join, aggregated per return flag. The
    oracle is the PLAIN semi-join — the equality IS the no-false-
    negative proof, and a bit-packing bug on either hash path would
    drop rows and fail the hash gate."""
    from ..sources.tables import load_table
    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderpriority") == "1-URGENT") \
        .select(F.col("o_orderkey").alias("k"))
    hit = bloom_prefilter_semi_join(
        li.withColumnRenamed("l_orderkey", "k"), "k", urgent, "k")
    return (hit.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 usum("l_quantity").alias("sum_qty")))


ORACLE_BLOOM_PREFILTER = f"""
SELECT l_returnflag, count(*) AS n_items,
       {usum_sql("l_quantity")} AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""
