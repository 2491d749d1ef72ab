#!/usr/bin/env python3
"""Measured DuckDB baseline for the bench comparison (BASELINE.md's 2x bar).

Times every SparkEntry oracle SQL in DuckDB over the same parquet tables the
Spark bench reads, and writes a committed artifact so the Spark-vs-DuckDB
ratio is auditable from the repo alone. Methodology mirrors graft.Bench:
each query is warmed once (plan + buffer cache) and the SECOND run is the
reported time, so both engines are measured steady-state.

Usage:
    python3 tools/duckbase.py <sfDir> <oracle_sql.json> <outFile>
e.g.
    python3 tools/duckbase.py /root/testdata/sf0.1 /tmp/verify/oracle_sql.json DUCKBASE_r03.json
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf, oracle_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    times = {}
    for name in sorted(oracle):
        try:
            con.sql(oracle[name]).fetchall()          # warm
            best = None                               # min of 2 timed runs
            for _ in range(2):                        # (same as graft.Bench)
                t0 = time.perf_counter()
                con.sql(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
        except Exception as e:
            times[name] = None
            print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
    ok = {k: v for k, v in times.items() if v is not None}
    doc = {
        "metric": "duckdb_total", "value": round(sum(ok.values()), 3),
        "unit": "sec", "n_queries": len(ok), "sf": sf,
        "methodology": "duckdb " + duckdb.__version__ +
            ", per-query min of 2 warmed runs (steady-state, same as graft.Bench)",
        "queries": times,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({k: doc[k] for k in ("metric", "value", "n_queries", "sf")}))

if __name__ == "__main__":
    main()
