#!/usr/bin/env python3
"""Merge N graft.Bench detail files (whole-suite repeats) into one idle
artifact with per-query minima. The repeat count MUST match the `repeats`
argument given to tools/duckbase.py for the same round — the committed
Spark/DuckDB ratio is only honest when minima on both sides come from the
same number of samples (see BASELINE.md "Methodology").

Usage:
    python3 tools/merge_bench.py BENCH_IDLE_r05.json run1.json run2.json ...
"""
import sys, json

def main():
    out, ins = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in ins]
    # Symmetric-sampling invariant: every input must be a FULL-suite run.
    # A partial detail (SPARK_GRAFT_BENCH_ONLY) merged with full runs would
    # silently give some queries fewer samples than suite_repeats claims.
    keysets = [frozenset(r["queries"]) for r in runs]
    if len(set(keysets)) > 1:
        common = frozenset.intersection(*keysets)
        for p, ks in zip(ins, keysets):
            extra, missing = sorted(ks - common), sorted(
                frozenset.union(*keysets) - ks)
            if extra or missing:
                print(f"{p}: +{extra[:5]} -{missing[:5]}", file=sys.stderr)
        sys.exit("merge_bench: input runs disagree on query key sets — "
                 "all merged runs must cover the identical full suite")
    queries = {}
    for r in runs:
        for k, v in r["queries"].items():
            if v < 0:          # failed-run sentinel: never a minimum
                queries.setdefault(k, None)
                continue
            prev = queries.get(k)
            queries[k] = v if prev is None else min(prev, v)
    ok = {k: v for k, v in queries.items() if v is not None}
    doc = {
        "metric": "total", "value": round(sum(ok.values()), 3), "unit": "sec",
        "n_queries": len(queries), "n_failed": len(queries) - len(ok),
        "suite_repeats": len(runs),
        "single_run_totals": [r["value"] for r in runs],
        "methodology": "per-query min over %d idle whole-suite repeats, each "
            "query itself adaptive min-of-N within a run (graft.Bench); "
            "DUCKBASE artifact for the same round uses the identical rule "
            "and repeat count" % len(runs),
        "sf": runs[0].get("sf"),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({k: doc[k] for k in
                      ("metric", "value", "n_queries", "suite_repeats")}))

if __name__ == "__main__":
    main()
