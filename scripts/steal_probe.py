#!/usr/bin/env python
"""CPU-steal probe for this sandbox (guide §1: measure first — and
trust no wall-clock on a contended hypervisor).

Round-10 finding: the box suffers BURSTY hypervisor CPU steal — 40-44%
of CPU time stolen for minutes at a time (measured from /proc/stat
during two full bench runs), then quiet (<2%) for long stretches. A
bench run that straddles a burst reports 2-7x inflated wall times for
exactly the parallel-heavy rows, with light rows untouched — the same
signature VERDICT r09 called "bench-context noise" and the r10
mid-build probe called "cross-JVM contamination" (both were measuring
this: steal bursts, not page cache).

Steal only accrues while vCPUs are runnable, so an idle box cannot be
probed passively: this script spins every core for ``--secs`` and
reports the steal fraction. Use it to (a) gate bench runs on a quiet
window and (b) annotate any measurement with the conditions it ran
under. Exit code 0 = quiet (steal below --max-pct), 1 = contended.
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import sys
import time


def _read_cpu() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user + nice + system + irq + softirq = busy-for-us; field 8 = steal
    busy = sum(int(parts[i]) for i in (1, 2, 3, 6, 7))
    return busy, int(parts[8])


def _spin(deadline: float) -> None:
    x = 0
    while time.time() < deadline:
        x += 1


def probe(secs: float) -> float:
    """Spin all cores for ``secs``; return steal percentage."""
    b0, s0 = _read_cpu()
    deadline = time.time() + secs
    procs = [mp.Process(target=_spin, args=(deadline,))
             for _ in range(mp.cpu_count())]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    b1, s1 = _read_cpu()
    db, ds = b1 - b0, s1 - s0
    return 100.0 * ds / max(1, db + ds)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--max-pct", type=float, default=5.0)
    args = ap.parse_args()
    pct = probe(args.secs)
    print(f"steal_pct={pct:.2f}")
    sys.exit(0 if pct <= args.max_pct else 1)


if __name__ == "__main__":
    main()
