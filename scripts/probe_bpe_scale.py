#!/usr/bin/env python
"""Measure text_bpe_learn's vocabulary-boundedness claim: replicate
the corpus K x (same texts, fresh doc_ids — corpus mass grows K x,
the distinct-word vocabulary does not) and time the learn loop. If
the rounds are truly vocabulary-bounded, runtime should grow far
slower than K (only the initial word-count pass sees K x rows).

Usage: python scripts/probe_bpe_scale.py [sf_dir] [factors...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    factors = [int(f) for f in sys.argv[2:]] or [1, 4, 16]
    from ngrams_collocations_hadoop_spark.operators.textstats import (
        q_bpe_learn)
    from ngrams_collocations_hadoop_spark.session import get_spark

    spark = get_spark(app_name="probe_bpe", cpus=8)
    for k in factors:
        d = tempfile.mkdtemp(prefix=f"bpe_scale_{k}x_")
        con = duckdb.connect()
        con.execute(f"""
            COPY (SELECT doc_id * {k} + r.i AS doc_id, text, lang,
                         source, n_chars
                  FROM read_parquet('{sf_dir}/documents.parquet'),
                       (SELECT unnest(range({k})) AS i) r)
            TO '{d}/documents.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM '{d}/documents.parquet'").fetchone()[0]
        con.close()
        runs = []
        for _ in range(3):
            t0 = time.time()
            q_bpe_learn(spark, d).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
        print(f"{k}x: docs={n} learn min={min(runs)}s runs={runs}")


if __name__ == "__main__":
    main()
