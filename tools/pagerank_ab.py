"""Paired A/B: PageRank dangling-mass handling — broadcast-crossJoin vs
per-iteration collect (VERDICT r2 'what's wrong' #4).

BENCH_r01 -> r02 moved kg_pagerank10 11.4 -> 16.7s after the dangling
collect was folded into the iteration job (centrality.py:90-104). Both
numbers were n<=2 on a host with documented 3-4x wall swings, so this tool
settles it: the SAME edge table, both variants, alternating trials in one
process (same JVM, same cache state), min-per-variant reported.

The crossJoin variant is unambiguously right at cluster scale (a collect is
a driver barrier: 20 extra jobs of pure serial time under Amdahl); this
A/B only checks it is not a local[N] pessimization.

Usage: python tools/pagerank_ab.py [--sf-dir /root/testdata/sf0.1] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_collect(
    edges: DataFrame, damping: float = 0.85, iterations: int = 10
) -> DataFrame:
    """The r1 shape: identical math to centrality.pagerank but the dangling
    mass is collect()ed to the driver each iteration (one extra job + a
    driver barrier per iteration). Kept ONLY as the A/B control."""
    e = edges.select(
        F.col("source_node_uuid").alias("src"), F.col("target_node_uuid").alias("dst")
    ).dropDuplicates(["src", "dst"])
    nodes = (
        e.select(F.col("src").alias("uuid"))
        .unionByName(e.select(F.col("dst").alias("uuid")))
        .dropDuplicates(["uuid"])
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_w = e.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            e_w.join(ranks.withColumnRenamed("uuid", "src"), "src")
            .groupBy(F.col("dst").alias("uuid"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "uuid"), "uuid", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .collect()[0]["d"]
        )
        ranks = (
            nodes.join(contribs, "uuid", "left")
            .withColumn(
                "rank",
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n)),
            )
            .drop("contrib")
            .localCheckpoint(eager=True)
        )
    return ranks.withColumnRenamed("rank", "pagerank")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from graphiti_spark.analytics.centrality import pagerank
    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.session import get_spark
    from graphiti_spark.synth import pages_from_documents

    spark = get_spark(
        app_name="pagerank_ab",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges_path = "/tmp/prab_edges.parquet"
    if not os.path.isdir(edges_path):
        out = run_pipeline(spark, pages_from_documents(spark, args.sf_dir))
        out["edges"].select("source_node_uuid", "target_node_uuid").write.mode(
            "overwrite"
        ).parquet(edges_path)
    edges = spark.read.parquet(edges_path)

    walls: dict[str, list[float]] = {"crossjoin": [], "collect": []}
    sums: dict[str, float] = {}
    for t in range(args.trials):
        for name, fn in (("crossjoin", pagerank), ("collect", pagerank_collect)):
            t0 = time.time()
            s = fn(edges).agg(F.sum("pagerank")).collect()[0][0]
            walls[name].append(round(time.time() - t0, 2))
            sums[name] = s
            print(f"# {name} trial {t}: {walls[name][-1]}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
                "walls": walls,
                "min": {k: min(v) for k, v in walls.items()},
                "rank_sums_equal": abs(sums["crossjoin"] - sums["collect"]) < 1e-9,
            }
        )
    )


if __name__ == "__main__":
    main()
