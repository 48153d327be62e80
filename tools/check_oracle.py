#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run graft.Verify first (writes <out>/<name>/ parquet +
<out>/oracle_sql.json), then this script replays each oracle SQL in DuckDB
over the same sf dir and diffs (sorted columns, sorted rows).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --smoke <sfDir> <oracleJsonOrVerifyOutDir> [memLimit [timeoutSec]]
       python3 tools/check_oracle.py --minmem <sfDir> <oracleJsonOrVerifyOutDir> [timeoutSec]

--smoke is the ORACLE-COST GUARD (r11 verdict item 6): the
x_eval_tokenizer class of failure — an oracle that OOMs DuckDB while
the Spark side is fine — was only caught by a full driver sweep. Smoke
mode replays every oracle SQL on its OWN fresh connection under a tight
memory_limit (default 2GiB) at a small SF and fails fast on memory
blowups, without needing any Spark output. Run it at sf0.001 after
adding/altering oracles; a MATERIALIZED-heavy oracle goes red here
before it can zero a driver round.

--minmem is the HEADROOM PROFILER (r12 verdict item 1): for every
oracle, binary-search the smallest DuckDB memory_limit on the ladder
below that still completes (fresh connection, no spill). The r12 driver
red was 10 oracles dying to ~256KB allocation failures on a pressured
checker box; this mode ranks the board by peak-memory appetite so the
hungriest oracles get rewritten BEFORE the next sweep, and documents
each one's distance from the cliff. Run at sf0.01 (the driver's SF).
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


def _load_oracle(oracle_path: str) -> dict:
    import os
    if os.path.isdir(oracle_path):
        oracle_path = f"{oracle_path}/oracle_sql.json"
    return json.load(open(oracle_path))


def _run_one(sf_dir: str, sql: str, mem_limit: str, timeout_s: float):
    """Run one oracle on a fresh connection under mem_limit with no spill.
    Returns (ok, kind, msg, elapsed_s)."""
    import threading
    import time
    con = duckdb.connect()
    timer = None
    timed_out = []
    t0 = time.monotonic()
    try:
        con.execute(f"SET memory_limit='{mem_limit}'")
        # no spill: DuckDB offloads past memory_limit into temp_directory
        # by default, turning a memory blowup into a silent slow success —
        # the guard must see the hard OOM error
        con.execute("SET temp_directory=''")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        timer = threading.Timer(
            timeout_s, lambda: (timed_out.append(True), con.interrupt()))
        timer.start()
        con.execute(sql).fetchall()
        return True, "OK", "", time.monotonic() - t0
    except duckdb.Error as e:
        msg = str(e).replace("\n", " ")[:200]
        kind = ("timeout" if timed_out
                else "OOM" if "emory" in msg else "error")
        return False, kind, msg, time.monotonic() - t0
    finally:
        if timer is not None:
            timer.cancel()
        try:
            con.close()
        except Exception:  # noqa: BLE001
            pass


# the minmem search ladder (MiB): DuckDB's buffer manager needs ~50-100
# MiB floor just to scan parquet, so start at 128
MINMEM_LADDER = [128, 192, 256, 384, 512, 768, 1024, 1536, 2048]


def minmem(sf_dir: str, oracle_path: str, timeout_s: float = 120.0) -> int:
    timeout_s = float(timeout_s)
    oracle = _load_oracle(oracle_path)
    results = []
    for name, sql in sorted(oracle.items()):
        # binary search the ladder for the smallest passing limit; an OOM
        # at index i never passes below i (memory appetite is monotone)
        lo, hi, best = 0, len(MINMEM_LADDER) - 1, None
        ok_top, kind, msg, _ = _run_one(
            sf_dir, sql, f"{MINMEM_LADDER[-1]}MiB", timeout_s)
        if not ok_top:
            results.append((name, None, f"{kind}: {msg[:120]}"))
            continue
        best = MINMEM_LADDER[-1]
        hi -= 1
        while lo <= hi:
            mid = (lo + hi) // 2
            ok, _, _, _ = _run_one(
                sf_dir, sql, f"{MINMEM_LADDER[mid]}MiB", timeout_s)
            if ok:
                best = MINMEM_LADDER[mid]
                hi = mid - 1
            else:
                lo = mid + 1
        results.append((name, best, ""))
    results.sort(key=lambda r: (-(r[1] or 10**9), r[0]))
    for name, mb, why in results:
        print(f"  {'FAIL@2048MiB' if mb is None else f'{mb:>5} MiB'}  {name}"
              f"{'  ' + why if why else ''}")
    worst = [r for r in results if r[1] is None or r[1] > 1024]
    print(f"minmem: {len(oracle)} oracles profiled; "
          f"{len(worst)} need >1GiB at {sf_dir}")
    return 1 if worst else 0


def smoke(sf_dir: str, oracle_path: str, mem_limit: str = "2GiB",
          timeout_s: float = 120.0) -> int:
    import re
    if not re.fullmatch(r"\d+(\.\d+)?\s*[KMGT]i?B", mem_limit.strip(),
                        re.IGNORECASE):
        print(f"bad memLimit {mem_limit!r}: expected e.g. 1GiB, 512MiB")
        return 2
    timeout_s = float(timeout_s)
    oracle = _load_oracle(oracle_path)
    failures = []
    for name, sql in sorted(oracle.items()):
        # one FRESH connection per query: the shared-connection compare
        # path deliberately tolerates cross-query memory accounting (it
        # reconnects on error); the guard must NOT — a per-query limit is
        # only meaningful when each query starts from zero. _run_one also
        # arms the runaway-cost watchdog (interrupt past timeout_s).
        ok, kind, msg, _ = _run_one(sf_dir, sql, mem_limit, timeout_s)
        if ok:
            print(f"  OK   {name}")
        else:
            failures.append((name, f"{kind}: {msg}"))
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"smoke: {len(oracle) - len(failures)}/{len(oracle)} oracles "
          f"ran under memory_limit={mem_limit}, timeout={timeout_s}s")
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) < 3 or (sys.argv[1].startswith("--")
                             and len(sys.argv) < 4):
        print(__doc__)
        sys.exit(2)
    if sys.argv[1] == "--smoke":
        sys.exit(smoke(*sys.argv[2:]))
    if sys.argv[1] == "--minmem":
        sys.exit(minmem(*sys.argv[2:]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
