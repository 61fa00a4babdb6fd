#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

The rule demands encode-throughput scaling efficiency >= 0.8 from N to 4N
executors. This sandbox has no real cluster, so (per driver instruction)
the two cluster sizes are evidenced as two parallelism levels on the same
input: local[8] vs local[32]. This script runs
``BENCH_ONLY=encode_repofiles bench.py`` at both levels, REPS times each,
takes the best run per level (the box has noisy co-tenants — wall clock
varies ~3x under external load, and best-of-N is the standard defence),
and writes the table into BENCH.md.

Usage: python tools/scaling.py [--reps 3] [--rows 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def wait_quiet(limit: float = 4.0, timeout: float = 300.0) -> float:
    t0 = time.monotonic()
    while loadavg() > limit and time.monotonic() - t0 < timeout:
        time.sleep(15)
    return loadavg()


def run_once(cpus: int, rows: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               BENCH_REPOFILES_ROWS=str(rows),
               BENCH_ONLY="encode_repofiles")
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rows", type=int, default=200000)
    args = ap.parse_args()

    results: dict[int, list[dict]] = {8: [], 32: []}
    for rep in range(args.reps):
        for cpus in (8, 32):
            la = wait_quiet()
            r = run_once(cpus, args.rows)
            r["loadavg_at_start"] = la
            results[cpus].append(r)
            print(f"rep {rep} local[{cpus}]: "
                  f"{r['queries']['encode_repofiles']}s "
                  f"(load {la})", flush=True)

    best = {c: min(rs, key=lambda r: r["queries"]["encode_repofiles"])
            for c, rs in results.items()}
    t8 = best[8]["queries"]["encode_repofiles"]
    t32 = best[32]["queries"]["encode_repofiles"]
    cb = best[32]["content_bytes"]
    gb8, gb32 = cb / t8 / 1e9, cb / t32 / 1e9
    eff = (t8 / t32) / (32 / 8)

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    table = f"""## Scaling evidence — N vs 4N (sandbox substitute: local[8] vs local[32])

Measured {stamp}; input = deterministic north-rule table
(`cpp_parquet_spark.synth.repofiles`, seed 42, {best[32]['repofiles_rows']:,} rows,
{cb:,} content bytes); query = `encode_repofiles` (salted repartition +
auto-selected codecs + mapInArrow encode, forced via noop sink); best of
{args.reps} runs per level (box has noisy co-tenants; per-run load recorded
below).

| parallelism | encode wall (s) | content GB/s | per-run walls (s) |
|---|---|---|---|
| local[8]  (N)  | {t8:.2f} | {gb8:.4f} | {', '.join(str(r['queries']['encode_repofiles']) for r in results[8])} |
| local[32] (4N) | {t32:.2f} | {gb32:.4f} | {', '.join(str(r['queries']['encode_repofiles']) for r in results[32])} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.2f}** (target >= 0.8,
BASELINE.json:2,14).
"""
    path = os.path.join(REPO, "BENCH.md")
    marker = "## Scaling evidence"
    old = open(path).read() if os.path.exists(path) else "# BENCH\n\n"
    head = old.split(marker)[0].rstrip() + "\n\n"
    with open(path, "w") as f:
        f.write(head + table)
    print(json.dumps({"t8": t8, "t32": t32, "gbps8": round(gb8, 4),
                      "gbps32": round(gb32, 4), "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
