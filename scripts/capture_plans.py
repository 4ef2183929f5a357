#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench queries into plans/r10/.

Usage: python scripts/capture_plans.py <tag> [sf_dir] [name ...]

Writes plans/r10/<name>_<tag>.txt for each bench query (default: every
entry in bench.BENCH_QUERIES). Constructing a lifecycle query executes
its eager build side effects (index/table builds, streams) exactly as
the bench does, so the captured plan is the plan the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    sess = df.sparkSession
    return sess._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from bench import BENCH_QUERIES
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark

    names = sys.argv[3:] or [n for n in BENCH_QUERIES if n in QUERIES]
    spark = get_spark(app_name="capture_plans", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        try:
            df = QUERIES[name](spark, sf_dir)
            text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name} ({len(text)} chars)")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
