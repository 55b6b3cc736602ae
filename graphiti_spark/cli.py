"""spark-submit entrypoint: run the S1-S9 DAG over a pages table.

Cluster usage (north rule: `spark-submit --py-files` on a multi-executor
cluster):

    python tools/make_pyfiles.py                       # -> graphiti_spark.zip
    spark-submit --py-files graphiti_spark.zip \\
        -m graphiti_spark.cli \\
        --input  <path or iceberg table of pages(url, warc_ts, html, text, lang)> \\
        --output <warehouse dir>  [--resume]

Local twin (what the sandbox bench does):

    python -m graphiti_spark.cli --input-documents /root/testdata/sf0.01 \\
        --output /tmp/kg_out

Every stage commits a snapshot under --output; re-running with the same
config resumes from the committed prefix (checkpoint/resume per north rule).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="graphiti_spark KG-construction pipeline")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path / table of pages(url, warc_ts, html, text, lang)")
    src.add_argument(
        "--input-documents",
        help="testdata sf dir: synthesize pages from its documents.parquet (deterministic)",
    )
    ap.add_argument("--output", required=True, help="stage-commit warehouse directory")
    ap.add_argument("--master", default=None, help="override spark master (default env/local)")
    ap.add_argument("--fresh", action="store_true", help="ignore committed stages (no resume)")
    args = ap.parse_args(argv)

    from graphiti_spark.session import get_spark

    spark = get_spark(app_name="graphiti_spark_cli", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.input_documents:
        from graphiti_spark.synth import pages_from_documents

        pages = pages_from_documents(spark, args.input_documents)
    else:
        pages = spark.read.parquet(args.input)

    if args.fresh:
        import shutil

        shutil.rmtree(args.output, ignore_errors=True)

    from graphiti_spark.plans.pipeline import run_pipeline

    t0 = time.time()
    out = run_pipeline(spark, pages, output_dir=args.output)
    counts = {k: out[k].count() for k in ("episodes", "nodes", "edges", "mentions")}
    ledger = out["_ledger"]
    print(
        json.dumps(
            {
                "seconds": round(time.time() - t0, 2),
                "counts": counts,
                "stages_run": ledger.stages_run,
                "stages_resumed": ledger.stages_resumed,
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
