"""Raw crawl shards -> knowledge graph: the full front-to-back path.

1. (setup) synthesize pages and pack them into .warc.gz shards — standing in
   for a crawler's output directory;
2. parse the shards back to the pages table (sources/warc.py, map-only);
3. run the S1-S9 pipeline (plans/pipeline.py) with committed stage snapshots.

Run:  python examples/warc_to_kg.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import sys


def main(sf_dir: str, work_dir: str) -> dict:
    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.session import get_spark
    from graphiti_spark.sources.warc import (
        pack_warc_files,
        parse_warc_files,
        to_warc_records,
    )
    from graphiti_spark.synth import pages_from_documents

    spark = get_spark(app_name="warc_to_kg")
    spark.sparkContext.setLogLevel("ERROR")

    # -- setup: a fake crawl directory of member-gzip WARC shards ----------
    shard_dir = os.path.join(work_dir, "crawl")
    os.makedirs(shard_dir, exist_ok=True)
    shards = pack_warc_files(
        to_warc_records(pages_from_documents(spark, sf_dir)),
        n_files=8,
        gzip_per_record=True,
    ).collect()
    for r in shards:
        with open(os.path.join(shard_dir, f"shard-{r.file_id:05d}.warc.gz"), "wb") as f:
            f.write(bytes(r.warc))

    # -- ingest: shards -> pages -> graph ----------------------------------
    import pyspark.sql.functions as F

    raw = spark.read.format("binaryFile").load(shard_dir)
    pages = parse_warc_files(
        raw.select(F.col("content").alias("warc")), gzip_per_record=True
    ).withColumn("text", F.lit(None).cast("string"))

    out = run_pipeline(spark, pages, output_dir=os.path.join(work_dir, "kg"))
    counts = {k: out[k].count() for k in ("episodes", "nodes", "edges", "mentions")}
    print(counts)
    return counts


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/warc_kg_example"
    main(sf, wd)
