#!/usr/bin/env python3
"""Interleaved graft/DuckDB windows for one query (round-9 ask #1/#2).

This host shows bursty neighbor contention (identical graft runs swing
3.5x in CPU time, 24s..98s wall on the same plan — see
docs/artifacts/joinagg_metrics_r9.txt). Sequential per-engine benches
therefore confound engine cost with whichever window was quiet. This
driver alternates engines within each window — G,D,G,D,... — and takes
the per-engine MIN across windows, so both engines get an equal shot
at the quiet windows.

graft's wall is measured INSIDE the JVM (QueryOnce prints it; JVM/
session startup excluded), mirroring how duck_bench.py excludes
process startup for DuckDB.

Usage: tools/interleave_bench.py <sfDir> <oracleSqlJson> <query> [windows]
"""
import json
import os
import re
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def graft_once(sf_dir, query):
    out = subprocess.run(
        ["tools/run_main.sh", "graft.tools.QueryOnce", sf_dir, query],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    m = re.search(r"GRAFT \S+ pass1 ([0-9.]+) s", out.stdout)
    if not m:
        sys.exit(f"graft run failed:\n{out.stdout}\n{out.stderr}")
    return float(m.group(1))


def duck_once(sf_dir, sql):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue  # doc-only corpora (DocCorpusGen) carry one table
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    con.sql(sql).fetchall()  # warm (same treatment as graft side)
    t0 = time.time()
    con.sql(sql).fetchall()
    dt = time.time() - t0
    con.close()
    return dt


def main():
    sf_dir, oracle_path, query = sys.argv[1], sys.argv[2], sys.argv[3]
    windows = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sql = json.load(open(oracle_path))[query]
    g, d = [], []
    for w in range(windows):
        stamp = time.strftime("%H:%M:%S")
        g.append(graft_once(sf_dir, query))
        d.append(duck_once(sf_dir, sql))
        print(f"window {w + 1} @ {stamp}: graft {g[-1]:.2f} s | "
              f"duckdb {d[-1]:.2f} s", flush=True)
    print(f"{query} @ {sf_dir}: graft min {min(g):.2f} s "
          f"(all: {', '.join(f'{x:.1f}' for x in g)}) | "
          f"duckdb min {min(d):.2f} s "
          f"(all: {', '.join(f'{x:.1f}' for x in d)}) | "
          f"ratio {min(g) / min(d):.2f}x")


if __name__ == "__main__":
    main()
