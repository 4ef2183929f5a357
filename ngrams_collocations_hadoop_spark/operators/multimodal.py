"""Multimodal-column plumbing: opaque binary payloads with typed
metadata, processed in Arrow-batched Pandas iterators (mapInPandas).

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (``decode_stub`` raises NotImplementedError; tests
inject a deterministic fake). What IS real and tested end-to-end is
everything Spark-side: the binary column schema, the mapInPandas batch
shape (iterator of pandas DataFrames), the output schema contract, and
the downstream aggregation — exactly the plumbing a real decoder would
drop into.

Scale notes: mapInPandas streams Arrow batches; per-batch Python cost
amortizes over spark.sql.execution.arrow.maxRecordsPerBatch rows.
Binary payloads stay off the driver, and the metadata extraction is a
narrow map — no shuffle until the final (tiny) aggregation.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

META_SCHEMA = ("doc_id long, source string, n_bytes long, "
               "header_byte long, mime string")


def decode_stub(payload: bytes) -> dict:
    """Placeholder for a real image/audio decoder (PIL/ffmpeg are not in
    this container). Wire a real decoder through ``extract_metadata``'s
    ``decoder`` argument."""
    raise NotImplementedError(
        "No media codec available in this environment; inject a decoder "
        "via extract_metadata(..., decoder=...)")


def _default_meta(payload: bytes) -> dict:
    """Deterministic metadata that needs no codec: size + header byte."""
    return {"n_bytes": len(payload),
            "header_byte": payload[0] if payload else -1,
            "mime": "application/octet-stream"}


def with_payload(docs: DataFrame) -> DataFrame:
    """Stand-in binary column: utf-8 bytes of `text`. In a real corpus
    this is the stored image/audio bytes column."""
    return docs.withColumn("payload", F.encode("text", "utf-8"))


def extract_metadata(df: DataFrame,
                     decoder: Callable[[bytes], dict] | None = None
                     ) -> DataFrame:
    """mapInPandas over (doc_id, source, payload): per Arrow batch,
    apply ``decoder`` (default: codec-free metadata) to each payload."""
    decode = decoder or _default_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": metas.map(lambda m: m["n_bytes"]).astype("int64"),
                "header_byte": metas.map(lambda m: m["header_byte"]).astype("int64"),
                "mime": metas.map(lambda m: m["mime"]),
            })

    return (df.select("doc_id", "source", "payload")
            .mapInPandas(run, schema=META_SCHEMA))


def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column stats per source via the Pandas-UDF path; the
    oracle recomputes byte lengths SQL-side (texts are ASCII here, but
    octet_length measures the same utf-8 payload either way)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    meta = extract_metadata(docs)
    return (meta.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
                 F.min("header_byte").alias("min_header")))


ORACLE_MM_BINARY_STATS = """
SELECT source, count(*) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       round(avg(octet_length(encode(text))), 6) AS avg_bytes,
       CAST(min(CASE WHEN octet_length(encode(text)) > 0
                THEN ord(text[1]) ELSE -1 END) AS BIGINT) AS min_header
FROM documents GROUP BY source
"""
