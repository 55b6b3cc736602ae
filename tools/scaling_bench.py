"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] (N) and local[32] (4N) — on the same input.
Two metrics per level:

 - WALL: best wall time per level over paired alternating trials
   (efficiency_wall = (T_N / T_4N) / (4N/N)). The sandbox host is shared
   and its capacity swings 2-4x over minutes (identical runs measured
   987s and 406s an hour apart), so wall comparisons are only meaningful
   when both levels happen to sample comparable windows — reported, but
   noisy.
 - CPU CONCURRENCY: per-run CPU-seconds of the whole bench process TREE
   (walked by ppid from /proc/<pid>/stat — NOT the process group: pyspark's
   worker daemon detaches its pgroup, so pgroup accounting misses every
   python UDF worker), split java vs python, giving sustained concurrency
   = cpu_sec / wall_sec. This is the contention-robust signal: if the 4N
   run sustains ~4x the concurrency of the N run on the SAME total CPU
   work, the job has no serial bottleneck and scales — wall differences
   beyond that are host noise, not Amdahl.
   efficiency_cpu = (concurrency_4N / concurrency_N) / (4N/N).

Usage: python tools/scaling_bench.py [--sf-dir ...] [--trials 2] [--replicate N]
Writes JSON to stdout; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_TICK = os.sysconf("SC_CLK_TCK")


def _tree_cpu_seconds(root_pid: int) -> dict[str, float]:
    """CPU of the whole process TREE under root_pid, split java/python.

    Tree, not process group: pyspark's worker daemon detaches its pgroup, so
    pgroup accounting silently misses EVERY python UDF worker — during the
    difflib-scorer stage that is most of the compute, which made the low
    parallelism level look ~40% idle when it was actually saturated.
    utime+stime+cutime+cstime per pid; reaped workers roll up into the
    daemon's cutime, so totals survive worker churn."""
    info: dict[int, tuple[int, str, int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                raw = f.read().decode("latin-1")
            # fields after the (comm) — comm may contain spaces/parens
            rest = raw[raw.rindex(")") + 2 :].split()
            ppid = int(rest[1])
            ticks = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                exe = f.read().decode("latin-1", "replace").split("\x00")[0]
            kind = "java" if "java" in exe else "python"
            info[int(pid)] = (ppid, kind, ticks)
        except (OSError, ValueError, IndexError):
            continue
    keep: set[int] = {root_pid}
    for pid in info:
        chain = []
        p = pid
        while p in info and p not in keep:
            chain.append(p)
            p = info[p][0]
        if p in keep:
            keep.update(chain)
    out = {"java": 0.0, "python": 0.0}
    for pid in keep:
        if pid in info:
            _, kind, ticks = info[pid]
            out[kind] += ticks / _TICK
    return out


def run_bench(
    sf_dir: str,
    cpus: int,
    replicate: int = 1,
    master: str | None = None,
    pin: bool = False,
    fixed_width: int = 24,
) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_PIPELINE_ONLY="1",
        SPARK_GRAFT_BENCH_REPLICATE=str(replicate),
        # IDENTICAL plan at both cluster sizes: shuffle width and explicit
        # repartition width are properties of the DATA on a real cluster
        # (bytes / target partition size) — growing N→4N executors adds task
        # slots, it does not change the plan. Level-dependent widths made the
        # 4N leg run 4x the task count, paying 4x the per-task fixed overhead
        # (python batch setup, memo cold-start, task serialization): measured
        # +23% total CPU at the 4N level, capping eff_wall at ~0.70 even in
        # quiet windows. Both knobs honor a caller override.
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(fixed_width)
        ),
        SPARK_GRAFT_PLAN_WIDTH=os.environ.get(
            "SPARK_GRAFT_PLAN_WIDTH", str(fixed_width)
        ),
        # Throughput GC, worker pool sized to the LEVEL, not the host: JVM
        # ergonomics otherwise size GC threads from the host's 32 cores, and
        # G1's concurrent marking burned >2x the entire job's compute at high
        # thread counts (measured local[16] sf0.1x12: default G1 4333 cpu-s /
        # 340s wall vs ParallelGC 1848 cpu-s / 194s wall, identical output).
        # Honors a caller override (like the width knobs). In cluster mode
        # the default is WRONG per executor (the level ≠ per-JVM cores), so
        # leave it unset there and let session.py derive per-executor cores
        # from the local-cluster master string.
        **(
            {}
            if master
            else {
                "SPARK_GRAFT_JAVA_OPTS": os.environ.get(
                    "SPARK_GRAFT_JAVA_OPTS",
                    f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(cpus, 2)}",
                )
            }
        ),
    )
    if master:
        # e.g. local-cluster[2,4,4096]: SEPARATE executor JVMs — the faithful
        # "N executors vs 4N executors" topology (thread-mode local[N] shares
        # one JVM heap/GC across all cores, which penalizes the 4N level).
        env["SPARK_GRAFT_MASTER"] = master
    t0 = time.time()
    # --pin: taskset each level onto exactly its own core count (cores
    # 0..cpus-1). Unpinned, the N-thread leg floats across all 32 host
    # cores and rarely contends while the 4N leg needs every core free —
    # asymmetric noise exposure. Pinned, background tenant load (spread by
    # the scheduler over all cores) hits both legs at the same per-core
    # rate, so the WALL ratio measures the job, not the host.
    cmd = [sys.executable, os.path.join(ROOT, "bench.py")]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    import tempfile

    errf = tempfile.NamedTemporaryFile(
        mode="w+", prefix="scaling_bench_err_", suffix=".log", delete=False
    )
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=errf,
        text=True,
        env=env,
        start_new_session=True,
    )
    cpu_max = {"java": 0.0, "python": 0.0}
    while proc.poll() is None:
        s = _tree_cpu_seconds(proc.pid)
        for k in cpu_max:
            cpu_max[k] = max(cpu_max[k], s[k])
        time.sleep(2.0)
        if time.time() - t0 > int(os.environ.get("SPARK_GRAFT_SCALING_TIMEOUT", "1800")):
            proc.kill()
            raise TimeoutError("bench run exceeded the scaling timeout")
    stdout = proc.stdout.read() if proc.stdout else ""
    wall = time.time() - t0
    json_lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    if not json_lines:
        errf.seek(0)
        tail = errf.read()[-3000:]
        raise RuntimeError(
            f"bench (cpus={cpus}, pin={pin}) emitted no JSON; stderr tail:\n{tail}"
        )
    line = json_lines[-1]
    out = json.loads(line)
    out["_wall"] = wall
    out["_cpu_sec"] = cpu_max["java"] + cpu_max["python"]
    out["_cpu_java"] = cpu_max["java"]
    out["_cpu_python"] = cpu_max["python"]
    out["_concurrency"] = out["_cpu_sec"] / out["value"] if out["value"] > 0 else 0.0
    return out


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
    ap.add_argument(
        "--mode",
        choices=["threads", "cluster"],
        default="threads",
        help=(
            "threads: local[N] vs local[4N] (one JVM). cluster: "
            "local-cluster[N/4,4,4096] vs local-cluster[N,4,4096] — separate "
            "executor JVMs, the faithful N-vs-4N-executors comparison"
        ),
    )
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset each level to exactly its core count (cores 0..N-1) so "
        "background load hits both legs at the same per-core rate",
    )
    args = ap.parse_args()
    masters = {args.low: None, args.high: None}
    if args.mode == "cluster":
        masters = {
            args.low: f"local-cluster[{max(args.low // 4, 1)},4,4096]",
            args.high: f"local-cluster[{max(args.high // 4, 1)},4,4096]",
        }

    # Paired A/B design: alternate levels each trial so both sample the same
    # host-contention window; min-per-level filters the noise bursts.
    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for t in range(args.trials):
        for cpus in (args.low, args.high):
            r = run_bench(
                args.sf_dir,
                cpus,
                args.replicate,
                master=masters[cpus],
                pin=args.pin,
                fixed_width=3 * args.high,
            )
            runs[cpus].append(r)
            print(
                f"# local[{cpus}] trial {t}: {r['value']}s wall, "
                f"{r['_cpu_sec']:.0f} cpu-s, concurrency {r['_concurrency']:.1f}, "
                f"{r['triples_per_sec']} triples/s",
                file=sys.stderr,
            )
    best = {c: min(rs, key=lambda r: r["value"]) for c, rs in runs.items()}
    best_conc = {c: max(rs, key=lambda r: r["_concurrency"]) for c, rs in runs.items()}

    lo, hi = best[args.low], best[args.high]
    ratio = args.high / args.low
    speedup = lo["value"] / hi["value"]
    conc_lo = best_conc[args.low]["_concurrency"]
    conc_hi = best_conc[args.high]["_concurrency"]
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "replicate": args.replicate,
                "mode": args.mode,
                "pinned": args.pin,
                "plan_width": int(
                    os.environ.get("SPARK_GRAFT_PLAN_WIDTH", 3 * args.high)
                ),
                "masters": {str(k): v for k, v in masters.items()},
                "low_cpus": args.low,
                "high_cpus": args.high,
                "low_sec": lo["value"],
                "high_sec": hi["value"],
                "low_triples_per_sec": lo["triples_per_sec"],
                "high_triples_per_sec": hi["triples_per_sec"],
                "speedup": round(speedup, 3),
                "scaling_efficiency_wall": round(speedup / ratio, 3),
                "low_cpu_sec": round(best_conc[args.low]["_cpu_sec"], 1),
                "high_cpu_sec": round(best_conc[args.high]["_cpu_sec"], 1),
                "low_cpu_split": {
                    "java": round(best_conc[args.low]["_cpu_java"], 1),
                    "python": round(best_conc[args.low]["_cpu_python"], 1),
                },
                "high_cpu_split": {
                    "java": round(best_conc[args.high]["_cpu_java"], 1),
                    "python": round(best_conc[args.high]["_cpu_python"], 1),
                },
                "low_concurrency": round(conc_lo, 2),
                "high_concurrency": round(conc_hi, 2),
                "scaling_efficiency_cpu": round((conc_hi / conc_lo) / ratio, 3) if conc_lo else None,
                "edges": hi["rows"]["edges"],
                "all_walls": {str(c): [r["value"] for r in rs] for c, rs in runs.items()},
                "all_concurrency": {
                    str(c): [round(r["_concurrency"], 2) for r in rs] for c, rs in runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
