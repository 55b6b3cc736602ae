"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] (N) and local[32] (4N) — on the same input;
efficiency = (T_8 / T_32) / 4. Each level runs `trials` times in a fresh
JVM; best wall time per level is used (the sandbox shares cores with the
build harness, so min filters external noise).

Usage: python tools/scaling_bench.py [--sf-dir /root/testdata/sf0.1] [--trials 2]
Writes JSON to stdout; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, replicate: int = 1) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_PIPELINE_ONLY="1",
        SPARK_GRAFT_BENCH_REPLICATE=str(replicate),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument(
        "--replicate",
        type=int,
        default=1,
        help="union N deterministic corpus variants so compute dominates fixed overhead",
    )
    args = ap.parse_args()

    # Paired A/B design: alternate levels each trial so both sample the same
    # host-contention window (the sandbox shares cores with the build
    # harness and capacity swings over minutes); min-per-level filters the
    # noise bursts.
    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for t in range(args.trials):
        for cpus in (args.low, args.high):
            r = run_bench(args.sf_dir, cpus, args.replicate)
            runs[cpus].append(r)
            print(
                f"# local[{cpus}] trial {t}: {r['value']}s, {r['triples_per_sec']} triples/s",
                file=sys.stderr,
            )
    results = {c: min(rs, key=lambda r: r["value"]) for c, rs in runs.items()}

    lo, hi = results[args.low], results[args.high]
    speedup = lo["value"] / hi["value"]
    efficiency = speedup / (args.high / args.low)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "replicate": args.replicate,
                "low_cpus": args.low,
                "high_cpus": args.high,
                "low_sec": lo["value"],
                "high_sec": hi["value"],
                "low_triples_per_sec": lo["triples_per_sec"],
                "high_triples_per_sec": hi["triples_per_sec"],
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(efficiency, 3),
                "edges": hi["rows"]["edges"],
            }
        )
    )


if __name__ == "__main__":
    main()
