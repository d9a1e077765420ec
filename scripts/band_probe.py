"""Quick host-band probe for bench scheduling (round-15).

This box (Firecracker microVM, no steal-time accounting) suffers
bursty host-side contention invisible to the guest: fixed CPU work
stretches 2-10x with zero GC and zero external busy cores (NOTES.md
"bench-band adjudication"). bench.py's stall census detects it AFTER
a 15-minute run; this probe samples the band in ~3 seconds BEFORE
launching one.

Method: 10 samples of a fixed single-thread integer loop; the
max/min ratio is the verdict. On a quiet band the loop is
constant-work so the ratio sits near 1.0-1.2; host oversubscription
shows up as individual samples stretching (the same mechanism that
makes a 2.5 s bench query sample 26 s). Thresholds from this box's
observed history: <=1.3 likely-clean, <=1.6 marginal, above that
dirty. A clean probe does NOT guarantee a clean 15-minute window
(bursts recur on a minutes scale) — it gates out the certainly-bad
launches.

Usage:  python scripts/band_probe.py   # prints one JSON line
Exit code: 0 likely-clean, 1 marginal, 2 dirty.
"""

from __future__ import annotations

import json
import os
import sys
import time


def spin(n: int = 4_000_000) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(n):
        s += i * i
    return time.perf_counter() - t0


def main() -> int:
    samples = [spin() for _ in range(10)]
    ratio = max(samples) / min(samples)
    load1 = os.getloadavg()[0]
    verdict = (
        "likely-clean" if ratio <= 1.3 and load1 < 2.0
        else "marginal" if ratio <= 1.6 and load1 < 4.0
        else "dirty"
    )
    print(json.dumps({
        "ratio": round(ratio, 2),
        "min_s": round(min(samples), 3),
        "max_s": round(max(samples), 3),
        "load1": round(load1, 2),
        "verdict": verdict,
    }))
    return {"likely-clean": 0, "marginal": 1, "dirty": 2}[verdict]


if __name__ == "__main__":
    sys.exit(main())
