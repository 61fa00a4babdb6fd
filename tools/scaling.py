#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule) — CLI.

Thin wrapper over the probe embedded in ``bench.py`` (the same pairs the
driver-recorded bench JSON carries): primary local[2] vs local[8] and
secondary local[8] vs local[32], both on the 800k-row (2 GB) input,
each leg a fresh JVM, best-of-reps, starts gated on a /proc/stat
CPU-idle sample.

Prints the measured pairs as a markdown fragment plus one JSON line.
BENCH.md is hand-curated — paste the fragment there if the numbers are
worth recording (this tool never rewrites the file).

Usage: python tools/scaling.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fmt_pair(title: str, p: dict) -> str:
    return f"""
### {title}: local[{p['n_cpus']}] vs local[{p['n4_cpus']}] — {p['content_bytes']:,} content bytes

| parallelism | encode wall (s) | content GB/s | per-run walls (s) | membw at start (GB/s) |
|---|---|---|---|---|
| local[{p['n_cpus']}]  (N)  | {p['t_n']:.2f} | {p['gbps_n']:.4f} | {', '.join(map(str, p['walls_n']))} | {', '.join(map(str, p['membw_n']))} |
| local[{p['n4_cpus']}] (4N) | {p['t_n4']:.2f} | {p['gbps_n4']:.4f} | {', '.join(map(str, p['walls_n4']))} | {', '.join(map(str, p['membw_n4']))} |

**Scaling efficiency (T_N / T_4N) / ({p['n4_cpus']}/{p['n_cpus']}) = {p['efficiency']:.2f}** (target >= 0.8); plain-codec legs {p['plain']['efficiency']:.2f}.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    os.environ["BENCH_SCALING_REPS"] = str(args.reps)

    import bench

    probe = bench._scaling_probe()
    if probe is None:
        print("probe produced no runs", file=sys.stderr)
        sys.exit(1)

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    print(f"Measured {stamp}; best of {args.reps} runs per leg.")
    for title in ("primary", "secondary"):
        p = probe.get(title)
        if p is not None:
            print(fmt_pair(title, p))
    print(json.dumps({k: {"t_n": v["t_n"], "t_n4": v["t_n4"],
                          "efficiency": v["efficiency"]}
                      for k, v in probe.items()
                      if isinstance(v, dict)}))


if __name__ == "__main__":
    main()
