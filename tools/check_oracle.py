#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run graft.Verify first (writes <out>/<name>/ parquet +
<out>/oracle_sql.json), then this script replays each oracle SQL in DuckDB
over the same sf dir and diffs (sorted columns, sorted rows).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --smoke <sfDir> <oracleJsonOrVerifyOutDir> [memLimit [timeoutSec]]
       python3 tools/check_oracle.py --minmem <sfDir> <oracleJsonOrVerifyOutDir> [timeoutSec]
       python3 tools/check_oracle.py --oomtest <sfDir> <verifyOutDir>

The compare is ENV-OOM SELF-ADJUDICATING (r15 verdict item 1): any
memory-exhaustion error (duckdb OutOfMemoryException, pyarrow
ArrowMemoryError, Python MemoryError) samples /proc/meminfo
MemAvailable, retries that oracle up to 3 times with 1/5/15 s backoff
on a fresh connection, and — only if the box was pressured (<2 GiB
available) at some failure — classifies the row ENV_OOM instead of
FAIL. The summary separates the classes; exit 0 = all match, 1 = real
FAILs, 3 = env_oom rows only (re-run on an idle box). Set
CHECK_ORACLE_ONLY=name1,name2 to adjudicate a subset of rows (e.g. a
contaminated driver board's reds) without a full sweep. --oomtest is
the classifier's own gate: it ballasts THIS process until MemAvailable
< ~1 GiB and requires the squeezed sweep to produce zero spurious
FAILs.

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
    import os
    con = duckdb.connect()
    # CHECK_ORACLE_MEMLIMIT: compare-path duckdb memory_limit (no-spill).
    # Unset in normal runs; --oomtest sets it tiny so the OOM class
    # genuinely fires while the box-pressure signal comes from the
    # ballast — deterministic classifier coverage with no kernel risk.
    lim = os.environ.get("CHECK_ORACLE_MEMLIMIT")
    if lim:
        con.execute(f"SET memory_limit='{lim}'")
        con.execute("SET temp_directory=''")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _rebuild(con, sf_dir: str):
    try:
        con.close()
    except Exception:  # noqa: BLE001
        pass
    return fresh_con(sf_dir)


# error-text shapes of a memory-exhaustion death, across duckdb
# (OutOfMemoryException / "failed to allocate"), pyarrow
# (ArrowMemoryError / "malloc of size ... failed"), and the Python
# allocator itself (MemoryError)
import re as _re
OOM_RE = _re.compile(
    r"out of memory|outofmemory|arrowmemory|failed to allocate|"
    r"could not allocate|bad_alloc|memoryerror|malloc of size",
    _re.IGNORECASE)

# a box with less than this much MemAvailable is PRESSURED: an OOM row
# there is an environment artifact, not an engine/oracle verdict (the
# r12/r14 driver boards died to KB-scale allocation failures)
ENV_OOM_AVAILABLE_BYTES = 2 << 30
# retry backoff: total ~21 s per stubborn row — long enough for a
# transient co-tenant spike to drain, short enough for a 221-row sweep
OOM_BACKOFFS_S = (1.0, 5.0, 15.0)


def _mem_available_bytes():
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except Exception:  # noqa: BLE001
        pass
    return None


def main(sf_dir: str, out_dir: str) -> int:
    import os
    import time
    con = fresh_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("CHECK_ORACLE_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    # CHECK_ORACLE_JSON=<path>: also write a per-query board in the
    # driver's CORRECTNESS_r{N}.json shape (r15 verdict item 2 — the
    # same-session artifact a contaminated driver board is diffed
    # against without re-running)
    board_path = os.environ.get("CHECK_ORACLE_JSON")
    board = {}

    def record(name, *, rows=None, schema=None, hashm=None, srows=None,
               orows=None, err=None):
        board[name] = {"rows_match": rows, "schema_match": schema,
                       "hash_match": hashm, "spark_rows": srows,
                       "oracle_rows": orows, "err": err}
    failures = []
    env_ooms = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            record(name, err="no spark output")
            continue
        attempt = 0
        saw_pressure = False
        while True:
            err = None
            try:
                spark_df = pd.concat(
                    [pd.read_parquet(f) for f in files], ignore_index=True)
                try:
                    duck_df = con.execute(sql).df()
                except duckdb.Error:
                    # DuckDB's per-connection memory accounting accumulates
                    # across the ~200 sequential queries and can OOM — and
                    # an OOM can leave the connection CLOSED, which would
                    # cascade "Connection has already been closed" over
                    # every later query (seen r10 part 7: 89 spurious
                    # FAILs). ANY duckdb error → rebuild the connection and
                    # retry once; genuine SQL errors reproduce on the fresh
                    # connection.
                    con = _rebuild(con, sf_dir)
                    duck_df = con.execute(sql).df()
            except (Exception, MemoryError) as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"
            if err is None:
                a, b = canon(spark_df), canon(duck_df)
                cols_ok = list(a.columns) == list(b.columns)
                rows_ok = len(a) == len(b)
                vals_ok = cols_ok and rows_ok and a.equals(b)
                record(name, rows=rows_ok, schema=cols_ok, hashm=vals_ok,
                       srows=len(a), orows=len(b))
                if not cols_ok:
                    failures.append(
                        (name, f"columns differ: {list(a.columns)} vs {list(b.columns)}"))
                elif not rows_ok:
                    failures.append((name, f"row count {len(a)} vs {len(b)}"))
                elif not vals_ok:
                    neq = (a != b).any(axis=1)
                    idx = neq[neq].index[:3]
                    detail = "; ".join(
                        f"row{i}: {a.loc[i].to_dict()} vs {b.loc[i].to_dict()}" for i in idx)
                    failures.append(
                        (name, f"values differ ({neq.sum()} rows): {detail[:400]}"))
                else:
                    print(f"  OK   {name} ({len(a)} rows)")
                break
            if not OOM_RE.search(err):
                failures.append((name, f"error: {err[:400]}"))
                record(name, err=err[:400])
                break
            # memory-exhaustion class (r15 verdict item 1): sample box
            # pressure, retry on a fresh connection with backoff, and only
            # after the retries classify — env_oom on a pressured box
            # (checker environment, not an engine/oracle verdict), FAIL on
            # an idle one (the oracle itself is too hungry)
            avail = _mem_available_bytes()
            if avail is not None and avail < ENV_OOM_AVAILABLE_BYTES:
                saw_pressure = True
            if attempt < len(OOM_BACKOFFS_S):
                time.sleep(OOM_BACKOFFS_S[attempt])
                attempt += 1
                con = _rebuild(con, sf_dir)
                continue
            ava = "?" if avail is None else f"{avail / 2**30:.2f} GiB"
            if saw_pressure:
                env_ooms.append(
                    (name, f"{err[:160]} (box pressured: MemAvailable {ava} "
                           f"after {attempt} retries)"))
                record(name, err=f"env_oom: {err[:200]}")
            else:
                failures.append(
                    (name, f"OOM on an unpressured box (MemAvailable {ava}, "
                           f"{attempt} retries): {err[:200]}"))
                record(name, err=f"oom_unpressured: {err[:200]}")
            break
    for name, why in env_ooms:
        print(f"  ENV_OOM {name}: {why}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    n_match = len(oracle) - len(failures) - len(env_ooms)
    print(f"{n_match}/{len(oracle)} queries match "
          f"({len(env_ooms)} env_oom, {len(failures)} fail)")
    if board_path:
        with open(board_path, "w") as f:
            json.dump(board, f, indent=1, sort_keys=True)
        print(f"per-query board written to {board_path}")
    return 1 if failures else (3 if env_ooms else 0)


def oomtest(sf_dir: str, out_dir: str) -> int:
    """Self-test of the env_oom classifier (r15 verdict item 1 'Done'
    criterion), two real signals with no kernel-rampage risk:
    (1) ballast in THIS process squeezes the box to <~1 GiB MemAvailable
    (the PRESSURE signal the classifier samples — genuinely true);
    (2) a tiny duckdb memory_limit on the compare connections
    (CHECK_ORACLE_MEMLIMIT=32MiB) makes the per-oracle OOM class
    genuinely fire (OutOfMemoryException from duckdb's own allocator,
    the exact error shape of the r12/r14 driver boards). Requires every
    non-OK row to be classified env_oom — zero spurious FAILs — then
    frees the ballast. A first variant squeezed alone: this board's
    oracles are ≤256 MiB appetite, so at 1.1 GiB available all rows
    still MATCHED (resilience, but no classifier coverage); starving
    further risks the kernel, hence the memory_limit pincer. Marks
    itself the preferred OOM-kill victim anyway.
    """
    import os
    try:
        with open("/proc/self/oom_score_adj", "w") as f:
            f.write("1000")
    except Exception:  # noqa: BLE001
        pass
    os.environ.setdefault("CHECK_ORACLE_MEMLIMIT", "32MiB")
    target = 1 << 30  # leave ~1 GiB available
    ballast = []
    chunk = 256 << 20
    avail = _mem_available_bytes()
    while avail is not None and avail > target + chunk:
        try:
            b = bytearray(chunk)
            # touch every page so the kernel actually commits it (one
            # C-level strided store, not a python loop — 20× faster)
            b[0:chunk:4096] = b"\x01" * (chunk // 4096)
            ballast.append(b)
        except MemoryError:
            break
        avail = _mem_available_bytes()
    print(f"oomtest: ballast {len(ballast) * chunk / 2**30:.1f} GiB held, "
          f"MemAvailable now {0 if avail is None else avail / 2**30:.2f} GiB")
    try:
        rc = main(sf_dir, out_dir)
    finally:
        ballast.clear()
    if rc == 1:
        print("oomtest: FAIL — spurious FAIL rows under pressure (above)")
        return 1
    print(f"oomtest: PASS — exit {rc} "
          f"({'all matched despite squeeze' if rc == 0 else 'only env_oom rows'})")
    return 0


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
    if sys.argv[1] == "--oomtest":
        sys.exit(oomtest(*sys.argv[2:]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
