"""Observability: metric counters on running queries (reference X4 —
Job3.java:45,50,89 defines error/throughput counters; Spark's
equivalent is `df.observe` metrics evaluated inline with the query,
costing no extra pass)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_row_counter(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a row/sum counter at this point in the plan. Returns the
    (same-semantics) DataFrame and the Observation to read after an
    action completes."""
    obs = Observation(name)
    numeric = [f.name for f in df.schema.fields
               if f.dataType.typeName() in ("long", "integer", "double")]
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if numeric:
        metrics.append(F.sum(F.col(numeric[0])).alias(f"sum_{numeric[0]}"))
    return df.observe(obs, *metrics), obs
