#!/usr/bin/env python
"""Degenerate-input campaign: run the FULL registry against a corpus
where the large tables are EMPTY (schema preserved) — the zero-rows
slice every 100 TB deployment eventually feeds a query (an empty
partition/day/language, a first run before ingest).

The hazard class this guards (all found by the first run of this
probe): global aggregates over zero rows (Spark ANSI DIVIDE_BY_ZERO vs
DuckDB NULL in the recall audits; sum() NULL vs count() 0 in the
profile), grouping-set grand totals (Spark's Expand emits NO rows on
empty input where the standard emits one () row), and constant-oracle
invariants that are only data-independent on non-empty input
(simhash losslessness' nonempty column).

Usage: python scripts/fuzz_empty.py [table ...]
       (default: documents events embeddings orders lineitem)
Exit 1 on any divergence.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402


def empty_out(out_dir: str, tables: list[str]) -> None:
    for t in tables:
        f = f"{out_dir}/{t}.parquet"
        pq.write_table(pq.read_table(f).slice(0, 0), f)


def main() -> None:
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark
    from tests.fuzz_corpus import write_fuzz_corpus
    from tests.test_registry_fuzz import run_fuzz

    which = sys.argv[1:] or ["documents", "events", "embeddings",
                             "orders", "lineitem"]
    spark = get_spark(app_name="fuzz_empty")
    with tempfile.TemporaryDirectory(prefix="fuzz_empty_") as d:
        write_fuzz_corpus(101, d)
        empty_out(d, which)
        failures = run_fuzz(spark, d, list(QUERIES))
    for name, why in failures.items():
        print(f"FAIL {name}: {why}", flush=True)
    print(f"DONE {len(QUERIES) - len(failures)}/{len(QUERIES)} green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
