"""Shared-host weather probe: wait for (or just log) a clean window.

This sandbox's host throughput swings 3-5x with noisy neighbors
(BENCH/BASELINE.md); benchmark numbers captured in a bad window are
measurements of the neighbors, not the engine.  This script times a
fixed pure-python workload (no Spark, no numpy allocations beyond a
small array) every few seconds and declares a window "clean" when the
probe lands within TOLERANCE of the best time ever observed in this
run (the least-contended estimate of the machine).

Usage:
    python scripts/host_weather.py --watch 120 --log BENCH/host_weather_r5.log
        # sample for 120s, write log, exit 0 if any clean sample
    python scripts/host_weather.py --wait 1800
        # block until a clean window (or deadline), exit 0/1 — used to
        # gate a bench capture on host weather
"""

from __future__ import annotations

import argparse
import sys
import time

TOLERANCE = 1.15  # clean = within 15% of the best observed probe


def probe_once(n: int = 6_000_000) -> float:
    """Fixed ALU+memory workload, single core, ~1-2 s on a quiet host."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc = (acc + i * i) & 0xFFFFFFFF
    return time.perf_counter() - t0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--watch", type=float, default=None,
                   help="sample for N seconds, then exit")
    p.add_argument("--wait", type=float, default=None,
                   help="block until a clean window, up to N seconds")
    p.add_argument("--log", default=None, help="append samples to this file")
    p.add_argument("--interval", type=float, default=6.0)
    args = p.parse_args(argv)
    deadline = time.time() + (args.wait or args.watch or 60.0)

    best = None
    t_start = time.time()
    any_clean = False
    out = open(args.log, "a") if args.log else None
    try:
        while time.time() < deadline:
            dt = probe_once()
            best = dt if best is None else min(best, dt)
            ok = dt <= best * TOLERANCE
            any_clean = any_clean or ok
            stamp = time.strftime("%M:%S", time.gmtime(time.time() - t_start))
            line = f"{stamp} probe={dt:.3f} best={best:.3f} ok={int(ok)}"
            print(line, flush=True)
            if out:
                out.write(line + "\n")
                out.flush()
            if args.wait is not None and ok and time.time() - t_start > 3 * args.interval:
                # clean AND we have enough samples to trust `best`
                print("clean window", flush=True)
                if out:
                    out.write("clean window\n")
                return 0
            time.sleep(args.interval)
    finally:
        if out:
            out.close()
    if args.wait is not None:
        print("no clean window found", flush=True)
        return 1
    return 0 if any_clean else 1


if __name__ == "__main__":
    sys.exit(main())
