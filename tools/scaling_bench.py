"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
from N to 4N executors).

No real cluster exists in this sandbox, so per the driver's rule we
run the SAME job at two parallelism levels (local[8] vs local[32]) on
the same input and report throughput at both plus scaling efficiency.
Each level runs in a fresh subprocess (a JVM can't change master).

    python tools/scaling_bench.py [--rows 4000000] [--low 8 --high 32]

Appends a BENCH section row to stdout as JSON; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, rows: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_PAGES_ROWS=str(rows),
        BENCH_QUERIES="pipeline_e2e",  # minimal sf-dir query; pipeline dominates
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run_level(args.low, args.rows)
    hi = run_level(args.high, args.rows)
    t_lo = lo["queries"]["pipeline_synthetic"]
    t_hi = hi["queries"]["pipeline_synthetic"]
    speedup = t_lo / t_hi
    eff = speedup / (args.high / args.low)
    print(
        json.dumps(
            {
                "rows": args.rows,
                f"local[{args.low}]_sec": t_lo,
                f"local[{args.high}]_sec": t_hi,
                f"local[{args.low}]_docs_per_sec": round(args.rows / t_lo, 1),
                f"local[{args.high}]_docs_per_sec": round(args.rows / t_hi, 1),
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
                "target": ">= 0.8",
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
