#!/usr/bin/env python
"""Full-registry differential fuzz campaign: generate an adversarial
10-table corpus per seed (tests/fuzz_corpus.py) and strict-compare
EVERY registry query against its DuckDB oracle on it — the wide form of
the quick gate in tests/test_registry_fuzz.py.

Usage: python scripts/fuzz_sweep.py [seed ...]    (default: 3 seeds)

Prints one line per failing (query, seed) and a summary; exit code 1 on
any failure. A failing seed reproduces exactly — the corpus is a pure
function of the seed.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark
    from tests.fuzz_corpus import write_fuzz_corpus
    from tests.test_registry_fuzz import run_fuzz

    seeds = [int(s) for s in sys.argv[1:]] or [11, 42, 1337]
    spark = get_spark(app_name="fuzz_sweep")
    n_fail = 0
    for seed in seeds:
        with tempfile.TemporaryDirectory(prefix=f"fuzz_{seed}_") as d:
            write_fuzz_corpus(seed, d)
            failures = run_fuzz(spark, d, list(QUERIES))
        for name, why in failures.items():
            print(f"FAIL {name}@{seed}: {why}", flush=True)
            n_fail += 1
        print(f"seed {seed}: {len(QUERIES) - len(failures)}/{len(QUERIES)} "
              f"green", flush=True)
    print(f"DONE seeds={len(seeds)} failures={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
