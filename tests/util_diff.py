"""Differential-test helper: run a Spark query and its DuckDB oracle on
the same parquet tables and compare row-count + order-insensitive values
(the driver's CORRECTNESS gate, reproduced locally)."""

from __future__ import annotations

import duckdb
import pandas as pd

from ngrams_collocations_hadoop_spark.sources.tables import TABLE_NAMES

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
}


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon(df: pd.DataFrame, float_round: int = 6) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort columns by name,
    round floats, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(float_round)
        elif df[c].dtype.kind == "M":
            # Spark's toPandas gives datetime64[ns], DuckDB's df() gives
            # datetime64[us]; assert_frame_equal treats the resolutions
            # as different values when NaT is present.
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_query_matches_oracle(spark, name: str, sf_dir: str) -> None:
    from ngrams_collocations_hadoop_spark.registry import ORACLES, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    duck_pdf = con.execute(ORACLES[name]).df()
    con.close()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns spark={sorted(spark_pdf.columns)} "
        f"duckdb={sorted(duck_pdf.columns)}")

    a, b = canon(spark_pdf), canon(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
