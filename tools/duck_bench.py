#!/usr/bin/env python3
"""Time the oracle SQL set in DuckDB over the same parquet tables.

The reference (vector-io) publishes no benchmarks, so the strongest
single-node baseline for BASELINE.md section (c) is DuckDB running the
IDENTICAL semantics (the oracle SQL) on the identical data.

Usage: python3 tools/duck_bench.py <sfDir> <verifyOutDir> [threads]
(<verifyOutDir> must contain oracle_sql.json from graft.Verify.)
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        # table can be a single parquet file (driver testdata) or a
        # Spark-written directory of part files (tools/BigGen output)
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # warm-up pass (buffer cache, JIT-ish planning), then timed pass
    for name, sql in sorted(oracle.items()):
        try:
            con.sql(sql).fetchall()
        except Exception as e:
            print(f"WARM-FAIL {name}: {e}")
    # per-query MIN over `passes` timed runs — same noise treatment as
    # graft.Bench (bursty neighbor contention; see BASELINE.md (c))
    passes = int(os.environ.get("DUCK_BENCH_PASSES", "3"))
    times = {}
    failed = []
    for _ in range(passes):
        for name, sql in sorted(oracle.items()):
            if name in failed:
                continue
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                # keep the benchmark alive: a single dialect-drifted query
                # must not discard every other timing
                failed.append(name)
                print(f"TIMED-FAIL {name}: {e}", file=sys.stderr)
                continue
            dt = time.time() - t0
            times[name] = min(times.get(name, dt), dt)
    total = sum(times.values())
    print(json.dumps({"engine": "duckdb", "threads": threads,
                      "passes": passes,
                      "total_sec": round(total, 3), "failed": failed,
                      "queries": {k: round(v, 4) for k, v in
                                  sorted(times.items(), key=lambda x: -x[1])}}))


if __name__ == "__main__":
    main()
