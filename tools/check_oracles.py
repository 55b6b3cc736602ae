"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count + column set + order-insensitive value hash.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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


def norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("Int64")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from graphiti_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle_check", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({took:.1f}s) [no oracle]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        s, o = norm(sdf), norm(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rowcount {len(s)} vs {len(o)}")
        if sorted(s.columns) != sorted(o.columns):
            problems.append(f"columns {sorted(s.columns)} vs {sorted(o.columns)}")
        elif value_hash(s) != value_hash(o):
            problems.append("value hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({took:.1f}s)")
            if len(s) and len(o) and sorted(s.columns) == sorted(o.columns):
                cols = sorted(s.columns)
                ss = s[cols].sort_values(cols).reset_index(drop=True)
                oo = o[cols].sort_values(cols).reset_index(drop=True)
                m = min(len(ss), len(oo))
                diff = (ss.iloc[:m].astype(str) != oo.iloc[:m].astype(str)).any(axis=1)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"      spark : {ss.iloc[i].to_dict()}")
                    print(f"      oracle: {oo.iloc[i].to_dict()}")
        else:
            print(f"OK    {name}: {len(s)} rows ({took:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
