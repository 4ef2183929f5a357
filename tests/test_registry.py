"""Registry-wide contract tests: every query with an oracle must
hash-match DuckDB at sf0.001 (the driver does the same at sf0.01), and
every oracle key must have a query."""

from __future__ import annotations

import pytest

from ngrams_collocations_hadoop_spark.registry import ORACLES, QUERIES

from .util_diff import assert_query_matches_oracle


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_differential(spark, name):
    assert_query_matches_oracle(spark, name, "/root/testdata/sf0.001")
