#!/usr/bin/env python
"""Measured Z-order pruning: write the events table twice — Morton
layout (`write_zordered`) and single-column sort — then, for a
two-sided point-ish predicate (a user_id band AND a time band), count
which parquet files a stats-pruning reader must open (footer min/max
intersection, the same test parquet row-group pruning applies). The
audit query (`rel_zorder_layout`) reports the envelopes; this probe
turns them into the number every scan planner cares about:
files-that-must-be-read.

Usage: python scripts/probe_zorder.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as papq  # noqa: E402


def file_bounds(path: str, cols: tuple[str, str]) -> dict:
    md = papq.ParquetFile(path).metadata
    lo, hi = {c: None for c in cols}, {c: None for c in cols}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            n = col.path_in_schema
            if n in lo and col.statistics is not None \
                    and col.statistics.min is not None \
                    and col.statistics.max is not None:
                s = col.statistics
                lo[n] = s.min if lo[n] is None else min(lo[n], s.min)
                hi[n] = s.max if hi[n] is None else max(hi[n], s.max)
    return {c: (lo[c], hi[c]) for c in cols}


def must_read(bounds: dict, pred: dict) -> bool:
    for c, (plo, phi) in pred.items():
        blo, bhi = bounds[c]
        if blo is None or bhi is None:
            # absence of stats cannot prove absence of matches — a
            # real pruning reader MUST read such a file
            return True
        if bhi < plo or blo > phi:
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from ngrams_collocations_hadoop_spark.operators import relational as rel
    from ngrams_collocations_hadoop_spark.session import get_spark
    from ngrams_collocations_hadoop_spark.sources.storage import (
        write_zordered)

    spark = get_spark(app_name="probe_zorder", cpus=8)
    ev = (rel._t(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select("user_id", F.col("ts").cast("long").alias("tsec")))
    st = ev.agg(F.min("user_id").alias("ul"), F.max("user_id").alias("uh"),
                F.min("tsec").alias("tl"), F.max("tsec").alias("th"),
                F.count(F.lit(1)).alias("n")).collect()[0]
    base = tempfile.mkdtemp(prefix="zorder_probe_")
    zdir, sdir = f"{base}/z", f"{base}/s"
    write_zordered(ev, zdir, "user_id", "tsec")
    n_files = rel.ZORDER_BLOCKS
    (ev.repartitionByRange(n_files, "user_id")
     .sortWithinPartitions("user_id")
     .write.mode("overwrite").parquet(sdir))

    du, dt = st.uh - st.ul, st.th - st.tl
    # centered band predicates, each 1/8 of its dimension's range:
    # the u-band alone (the sorted layout's best case), the t-band
    # alone (its worst case), and the conjunction
    uband = {"user_id": (st.ul + 7 * du // 16, st.ul + 9 * du // 16)}
    tband = {"tsec": (st.tl + 7 * dt // 16, st.tl + 9 * dt // 16)}
    preds = {"u_band": uband, "t_band": tband, "both": {**uband, **tband}}
    summary = []
    for name, d in (("zorder", zdir), ("user_sorted", sdir)):
        files = [f for f in glob.glob(f"{d}/**/*.parquet", recursive=True)]
        bounds = [file_bounds(f, ("user_id", "tsec")) for f in files]
        reads = {p: sum(must_read(b, pred) for b in bounds)
                 for p, pred in preds.items()}
        summary.append(f"{name}=" + ",".join(
            f"{p}:{r}/{len(files)}" for p, r in reads.items()))
        print(f"{name}: " + "  ".join(
            f"{p} reads {r}/{len(files)}" for p, r in reads.items()))
    print(f"DONE {' '.join(summary)} rows={st.n}")


if __name__ == "__main__":
    main()
