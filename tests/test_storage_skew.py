"""Storage layout (partition pruning, bucketed shuffle-free joins) and
skew-mitigation (salted join) guarantees."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ngrams_collocations_hadoop_spark.operators.skew import salted_join
from ngrams_collocations_hadoop_spark.plans.checks import physical_plan
from ngrams_collocations_hadoop_spark.sources.storage import (
    read_table, write_bucketed, write_partitioned,
)
from ngrams_collocations_hadoop_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_partition_pruning(spark):
    d = tempfile.mkdtemp(prefix="part_") + "/docs"
    docs = load_table(spark, SF_SMALL, "documents")
    write_partitioned(docs, d, ["lang"])

    filtered = spark.read.parquet(d).filter(F.col("lang") == "en")
    plan = physical_plan(filtered)
    # the lang predicate must prune at the partition level, not scan+filter
    assert "PartitionFilters: [isnotnull(lang" in plan \
        or "PartitionFilters: [" in plan and "lang" in plan.split(
            "PartitionFilters:")[1].split("]")[0]
    # correctness: partition column round-trips
    assert filtered.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key must join with zero
    exchanges — the reference's hand-built co-partitioning, persisted."""
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(o.select("o_orderkey", "o_totalprice"),
                   "b_orders", ["o_orderkey"], 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "b_lineitem", ["l_orderkey"], 8)
    j = read_table(spark, "b_orders").join(
        read_table(spark, "b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"))
    plan = physical_plan(j)
    assert "Exchange hashpartitioning" not in plan, plan
    assert j.count() == li.count()  # every lineitem has its order


def test_salted_join_equals_plain_join(spark):
    large = load_table(spark, SF_SMALL, "lineitem") \
        .select("l_orderkey", "l_quantity", "l_linenumber")
    small = load_table(spark, SF_SMALL, "orders") \
        .select("o_orderkey", "o_totalprice") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    plain = large.join(small, on="l_orderkey").orderBy(
        "l_orderkey", "l_linenumber")
    salted = salted_join(large, small, ["l_orderkey"], n_salt=8).orderBy(
        "l_orderkey", "l_linenumber")
    assert [tuple(r) for r in plain.collect()] == \
           [tuple(r) for r in salted.collect()]
