#!/usr/bin/env python3
"""Measured DuckDB baseline for the bench comparison (BASELINE.md's 2x bar).

Times every SparkEntry oracle SQL in DuckDB over the same parquet tables the
Spark bench reads, and writes a committed artifact so the Spark-vs-DuckDB
ratio is auditable from the repo alone.

Methodology — IDENTICAL sampling rule to graft.Bench, per query:
  1. one warm run (plan cache + buffer pool), untimed;
  2. adaptive min-of-N timed runs: keep timing until two runs agree within
     20% of the running min, capped at 5 runs / 30 s per query;
  3. the per-query MIN successful run is reported.
When the Spark side takes per-query minima across R whole-suite repeats
(BENCH_IDLE artifacts), pass the same R as the 4th argument here so the
minima are taken over the same number of samples on both engines.

Usage:
    python3 tools/duckbase.py <sfDir> <oracle_sql.json> <outFile> [repeats]
e.g.
    python3 tools/duckbase.py /root/testdata/sf0.1 /tmp/verify/oracle_sql.json DUCKBASE_r05.json 3
"""
import os, sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Known structural DNFs (r13 verdict item 5): when one of these keys times
# out or dies, the artifact records the named reason instead of a silent
# null, so the suite-ratio accounting stays self-describing. Reasons are
# structural properties of the DuckDB comparable, not transient noise.
STRUCTURAL_DNF = {
    "dd12_embedding_manifest":
        "recursive-CTE connected components enumerates every "
        "(src, reachable-node) pair — quadratic per cluster (457 s in r11, "
        ">600 s watchdog in r12); pinned smaller-SF points in BASELINE.md "
        "show the superlinear slope. Spark side: iterative min-label "
        "propagation, ~0.1 s.",
    "dd26_semdedup":
        "per-cell all-pairs cosine in one recursive union-find spills "
        ">50 GB at sf1 (killed); Spark side: per-cell union-find over "
        "LSH-bucketed candidates.",
    "sim3_ivf_ann":
        "no IVF index path in the SQL comparable — brute-force re-scan per "
        "probe exceeds the watchdog at sf1.",
}

def time_query(con, sql, hard_timeout=None):
    """Adaptive min-of-N (same stop rule as graft.Bench): stop when 2 runs
    agree within 20% of the running min, cap 5 runs / 30 s. With
    hard_timeout (sec), a watchdog interrupts any single run past the cap
    (DUCKBASE_TIMEOUT env) — the query is then reported as timed out."""
    import threading

    def run_once():
        """One full execution; returns the SUCCESSFUL attempt's own duration
        (ADVICE r12: a stale-interrupt retry must not inflate the caller's
        timed sample with the aborted partial run)."""
        if hard_timeout is None:
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            return time.perf_counter() - t0
        # Watchdog race (ADVICE r11): if the Timer fires just as the query
        # completes, con.interrupt() lands with no query running and would
        # interrupt the NEXT run on the shared connection. An
        # InterruptException raised before the budget elapsed is therefore a
        # stale interrupt from a prior timer, not a timeout: drain it with a
        # throwaway statement and retry. Three consecutive stale interrupts
        # are a harness fault, not a query timeout (ADVICE r12) — classify
        # as an error rather than re-raising InterruptException.
        for _ in range(3):
            t = threading.Timer(hard_timeout, con.interrupt)
            t0 = time.perf_counter()
            t.start()
            try:
                con.sql(sql).fetchall()
                return time.perf_counter() - t0
            except duckdb.InterruptException:
                if time.perf_counter() - t0 >= hard_timeout:
                    raise
                try:  # absorb any still-pending interrupt before retrying
                    con.sql("SELECT 1").fetchall()
                except duckdb.InterruptException:
                    pass
            finally:
                t.cancel()
        raise RuntimeError("three consecutive stale watchdog interrupts "
                           "(harness fault, not a query timeout)")

    run_once()                                     # warm
    ts, attempts, elapsed = [], 0, 0.0
    while True:
        dt = run_once()
        attempts += 1
        elapsed += dt
        ts.append(dt)
        m = min(ts)
        if (len(ts) >= 2 and sum(1 for t in ts if t <= m * 1.2) >= 2) \
           or attempts >= 5 or elapsed > 30.0:
            return m

def main():
    sf, oracle_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    hard_timeout = float(os.environ["DUCKBASE_TIMEOUT"]) \
        if "DUCKBASE_TIMEOUT" in os.environ else None
    times, timeouts = {}, []
    for r in range(repeats):
        for name in sorted(oracle):
            # Queries already past the 30 s per-query cap (dd12's recursive
            # CTE is ~355 s) are timed on the first repeat only — they are
            # excluded from the headline ratio anyway (value_excl_dd12).
            prev = times.get(name)
            if r > 0 and ((prev is not None and prev > 30.0)
                          or name in timeouts):
                continue
            try:
                dt = time_query(con, oracle[name], hard_timeout)
                times[name] = round(dt if prev is None else min(prev, dt), 3)
            except duckdb.InterruptException:
                times.setdefault(name, None)
                timeouts.append(name)
                print(f"TIMEOUT {name}: interrupted after {hard_timeout}s",
                      file=sys.stderr)
            except Exception as e:
                times.setdefault(name, None)
                if r == 0:
                    print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
    ok = {k: v for k, v in times.items() if v is not None}
    # Every null key must carry a named reason (r13 verdict item 5):
    # a known structural DNF gets its note; anything else is flagged
    # loudly as unexplained so it cannot pass silently.
    dnf_reasons = {
        k: STRUCTURAL_DNF.get(
            k, "UNEXPLAINED — investigate before committing this artifact")
        for k, v in times.items() if v is None}
    doc = {
        "metric": "duckdb_total", "value": round(sum(ok.values()), 3),
        "value_excl_dd12": round(sum(v for k, v in ok.items()
                                     if k != "dd12_embedding_manifest"), 3),
        "unit": "sec", "n_queries": len(ok), "sf": sf,
        "methodology": "duckdb " + duckdb.__version__ +
            ", per-query adaptive min-of-N warmed runs (stop when 2 agree "
            "within 20% of running min, cap 5 runs/30s — same rule as "
            f"graft.Bench), per-query min over {repeats} suite repeat(s); "
            "queries past the 30s cap timed on repeat 1 only",
        "suite_repeats": repeats,
        **({"hard_timeout_sec": hard_timeout, "timed_out": sorted(set(timeouts))}
           if hard_timeout is not None else {}),
        **({"dnf_reasons": dnf_reasons} if dnf_reasons else {}),
        "note": "dd12_embedding_manifest is an outlier (~355 s): DuckDB's "
            "recursive-CTE connected components enumerates every "
            "(src, reachable-node) pair, quadratic per cluster, while the "
            "Spark side runs iterative min-label propagation (~0.1 s). The "
            "honest engine-vs-engine suite ratio uses value_excl_dd12 for "
            "the DuckDB side; dd12 is reported but not credited to the "
            "Spark total as a 355 s win.",
        "queries": times,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({k: doc[k] for k in ("metric", "value", "n_queries", "sf")}))

if __name__ == "__main__":
    main()
