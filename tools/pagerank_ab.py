"""Paired A/B of PageRank's dangling-mass handling (VERDICT r2 "What's wrong" #4).

Round 2 rewrote the per-iteration dangling-mass collect() into a broadcast
crossJoin of the 1-row aggregate (one Spark job per iteration instead of two,
no driver barrier). The sf0.1 bench then moved 11.4 -> 16.7 s on a host with
documented 3-4x wall swings — almost certainly noise, but this paired A/B
settles it: same session, same warmed edge list, alternating variants, so
JVM startup / JIT / host drift hit both arms equally.

Usage: python tools/pagerank_ab.py [--sf-dir ...] [--replicate 4] [--trials 3]
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=10)
    args = ap.parse_args()

    from graphiti_spark.session import get_spark
    from graphiti_spark.synth import pages_from_documents
    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.analytics.centrality import pagerank

    spark = get_spark(app_name="pagerank_ab")
    spark.sparkContext.setLogLevel("ERROR")

    pages = pages_from_documents(spark, args.sf_dir, replicate=args.replicate)
    out = run_pipeline(spark, pages)
    edges = out["edges"].select("source_node_uuid", "target_node_uuid").persist()
    n_edges = edges.count()

    # Warm-up (JIT + shuffle infra) — one run per variant, discarded.
    for mode in ("crossjoin", "collect"):
        pagerank(edges, iterations=2, dangling_mode=mode).count()

    walls: dict[str, list[float]] = {"crossjoin": [], "collect": []}
    sums: dict[str, float] = {}
    for t in range(args.trials):
        for mode in ("crossjoin", "collect"):
            t0 = time.time()
            pr = pagerank(edges, iterations=args.iterations, dangling_mode=mode)
            s = pr.agg({"pagerank": "sum"}).collect()[0][0]
            walls[mode].append(round(time.time() - t0, 2))
            sums[mode] = s
            print(
                f"# trial {t} {mode}: {walls[mode][-1]}s (sum={s:.9f})",
                file=sys.stderr,
            )

    med = {m: sorted(w)[len(w) // 2] for m, w in walls.items()}
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "replicate": args.replicate,
                "edges": n_edges,
                "iterations": args.iterations,
                "trials": args.trials,
                "walls": walls,
                "median_crossjoin_sec": med["crossjoin"],
                "median_collect_sec": med["collect"],
                "crossjoin_over_collect": round(med["crossjoin"] / med["collect"], 3),
                "rank_sums_equal": abs(sums["crossjoin"] - sums["collect"]) < 1e-9,
            }
        )
    )


if __name__ == "__main__":
    main()
