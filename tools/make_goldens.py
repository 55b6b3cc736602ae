"""Generate pinned golden outputs for the non-SQL-expressible kg_* queries.

The KG pipeline's extraction/ER stages are Python-UDF-driven and have no
feasible DuckDB twin (the html stripper alone is ~200 lines of regex logic).
Instead of leaving the flagship output rows-only-checked, we pin its sf0.01
output as golden parquet under tests/golden/sf0.01/ and point each query's
``oracle_sql()`` at ``read_parquet('<golden>')`` — turning the driver's
correctness gate into a hard regression lock on row count, schema, AND
values. Regenerating goldens is an explicit, reviewed act (rerun this tool).

Usage:
  python tools/make_goldens.py            # write goldens
  python tools/make_goldens.py --check    # recompute + compare, write nothing
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden", "sf0.01")

GOLDEN_QUERIES = [
    "kg_nodes",
    "kg_edges",
    "kg_mentions",
    "kg_raw_mentions",
    "kg_duplicate_pairs",
    "kg_extract_text",
    "kg_pagerank",
    "kg_communities",
    "kg_search_hybrid",
    "kg_message_edges",
    "kg_json_edges",
    "kg_pages",
    "kg_episode_lens",
    "bpe_merges",
    "bpe_segment_stats",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(
            "|".join(
                "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else repr(v)
                for v in tup
            )
        )
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from graphiti_spark.session import get_spark

    check = "--check" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("-")}
    spark = get_spark(app_name="make_goldens", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rc = 0
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        pdf = qs[name](spark, SF_DIR).toPandas()
        cols = sorted(pdf.columns)
        pdf = pdf[cols].sort_values(cols).reset_index(drop=True)
        h = value_hash(pdf)
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if check:
            if not os.path.exists(path):
                print(f"MISSING {name}")
                rc = 1
                continue
            old = pd.read_parquet(path)
            oh = value_hash(old[sorted(old.columns)])
            status = "OK" if oh == h else "DRIFT"
            if status != "OK":
                rc = 1
            print(f"{status:7s} {name}: {len(pdf)} rows hash={h}")
        else:
            pdf.to_parquet(path, index=False)
            print(f"WROTE  {name}: {len(pdf)} rows hash={h} -> {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
