#!/usr/bin/env python
"""Run a command in a hypervisor-quiet window (see steal_probe.py).

Polls the steal probe until a quiet reading, runs the command, then
measures the steal fraction OVER the command's lifetime and reports
it. If the run was contended above --max-pct, retries (up to
--tries). The child's stdout/stderr pass through.

Usage: python scripts/run_quiet.py [--max-pct 5] [--tries 3] -- cmd...
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

from steal_probe import _read_cpu, probe


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-pct", type=float, default=5.0)
    ap.add_argument("--tries", type=int, default=3)
    ap.add_argument("--probe-secs", type=float, default=2.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    for attempt in range(1, args.tries + 1):
        # wait for a quiet window
        waited = 0.0
        while True:
            pct = probe(args.probe_secs)
            if pct <= args.max_pct:
                break
            print(f"run_quiet: contended (steal={pct:.1f}%), waiting...",
                  file=sys.stderr)
            time.sleep(10)
            waited += 10
            if waited > 900:
                print("run_quiet: no quiet window in 15 min; "
                      "running anyway", file=sys.stderr)
                break
        b0, s0 = _read_cpu()
        rc = subprocess.call(cmd)
        b1, s1 = _read_cpu()
        db, ds = b1 - b0, s1 - s0
        run_pct = 100.0 * ds / max(1, db + ds)
        print(f"run_quiet: attempt {attempt} rc={rc} "
              f"steal_during_run={run_pct:.2f}%", file=sys.stderr)
        if run_pct <= args.max_pct and rc == 0:
            sys.exit(0)
        if rc != 0:
            sys.exit(rc)
    print(f"run_quiet: all {args.tries} attempts contended; "
          f"last result stands", file=sys.stderr)
    sys.exit(0)


if __name__ == "__main__":
    main()
