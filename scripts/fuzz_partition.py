#!/usr/bin/env python
"""Partitioning-invariance fuzz: rewrite an adversarial corpus with
rows SHUFFLED and split into 8 part files per table, then require every
registry query's canonical output to be IDENTICAL to its single-file
output (Spark vs Spark — no oracle involved).

This tests the property the driver's hash gate (and any production
re-run) depends on: results must not depend on row order, file split,
partial-aggregation tree shape, or which partition a row lands in.
161/161 green at HEAD, streaming included (the stream-dir shim links
directory corpora file-by-file).

Usage: python scripts/fuzz_partition.py [seed]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402


def shuffle_split(base: str, out: str, seed: int, n_files: int = 8) -> None:
    from tests.fuzz_corpus import ALL_TABLES

    rng = random.Random(seed * 13 + 7)
    for t in ALL_TABLES:
        tbl = pq.read_table(f"{base}/{t}.parquet")
        idx = list(range(tbl.num_rows))
        rng.shuffle(idx)
        tbl = tbl.take(idx)
        d = f"{out}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        step = max(1, (tbl.num_rows + n_files - 1) // n_files)
        for i in range(0, tbl.num_rows, step):
            pq.write_table(tbl.slice(i, step), f"{d}/part-{i:05d}.parquet")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True).astype(str)


def main() -> None:
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark
    from tests.fuzz_corpus import write_fuzz_corpus

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 101
    spark = get_spark(app_name="fuzz_partition")
    base = write_fuzz_corpus(seed, tempfile.mkdtemp(prefix="pf_base_"))
    shuf = tempfile.mkdtemp(prefix="pf_shuf_")
    shuffle_split(base, shuf, seed)
    fails = []
    for name in QUERIES:
        try:
            a = canon(QUERIES[name](spark, base).toPandas())
            b = canon(QUERIES[name](spark, shuf).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            fails.append(name)
            continue
        if not a.equals(b):
            print(f"DIVERGE {name}: rows {len(a)} vs {len(b)}", flush=True)
            fails.append(name)
    print(f"DONE seed={seed} "
          f"{len(QUERIES) - len(fails)}/{len(QUERIES)} invariant")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
