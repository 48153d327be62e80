#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run graft.Verify first (writes <out>/<name>/ parquet +
<out>/oracle_sql.json), then this script replays each oracle SQL in DuckDB
over the same sf dir and diffs (sorted columns, sorted rows).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable, type-tolerant compare (driver hashes values)
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v))
                          else repr(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


def fresh_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir: str, out_dir: str) -> int:
    con = fresh_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            try:
                duck_df = con.execute(sql).df()
            except duckdb.Error:
                # DuckDB's per-connection memory accounting accumulates
                # across the ~200 sequential queries and can OOM — and an
                # OOM can leave the connection CLOSED, which would cascade
                # "Connection has already been closed" over every later
                # query (seen r10 part 7: 89 spurious FAILs). ANY duckdb
                # error → rebuild the connection and retry once; genuine
                # SQL errors reproduce on the fresh connection.
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
                con = fresh_con(sf_dir)
                duck_df = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"error: {e}"))
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns differ: {list(a.columns)} vs {list(b.columns)}"))
        elif len(a) != len(b):
            failures.append((name, f"row count {len(a)} vs {len(b)}"))
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            idx = neq[neq].index[:3]
            detail = "; ".join(
                f"row{i}: {a.loc[i].to_dict()} vs {b.loc[i].to_dict()}" for i in idx)
            failures.append((name, f"values differ ({neq.sum()} rows): {detail[:400]}"))
        else:
            print(f"  OK   {name} ({len(a)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
