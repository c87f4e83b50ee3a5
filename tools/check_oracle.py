"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at the given sf dir, and compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified tuple). Usage: python tools/check_oracle.py [sf_dir] [only,names]
(the optional second arg is a comma list of query-name substrings to run).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir: str, only: list[str] | None = None) -> int:
    # fixture-backed oracles (extract_pipeline) must follow the sf under test
    sf_key = os.path.basename(sf_dir.rstrip("/"))
    if sf_key.startswith("sf"):
        os.environ["PDFX_ORACLE_SF"] = sf_key[2:]

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        spark_df = fn(spark, sf_dir).toPandas()
        took = time.time() - t0
        if name not in oracles:
            print(f"  {name:34s} rows-only: {len(spark_df)} rows  ({took:.1f}s)")
            assert len(spark_df) >= 0
            continue
        duck_df = con.sql(oracles[name]).df()
        problems = []
        if len(spark_df) != len(duck_df):
            problems.append(f"rowcount {len(spark_df)} != {len(duck_df)}")
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            problems.append(f"columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}")
        elif value_hash(spark_df) != value_hash(duck_df):
            problems.append("value hash mismatch")
            merged = spark_df[sorted(spark_df.columns)].round(6) if len(spark_df) else spark_df
        if problems:
            failures += 1
            print(f"  {name:34s} FAIL: {'; '.join(problems)}  ({took:.1f}s)")
            sd = spark_df[sorted(spark_df.columns)]
            dd = duck_df[sorted(duck_df.columns)]
            print("    spark:", sd.head(3).to_dict("records"))
            print("    duck :", dd.head(3).to_dict("records"))
        else:
            print(f"  {name:34s} OK ({len(spark_df)} rows, {took:.1f}s)")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(main(sf, only))
