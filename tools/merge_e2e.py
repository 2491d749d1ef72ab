#!/usr/bin/env python3
"""Merge the two sides of the BENCH_E2E stage-wall-time comparable into one
committed artifact (BASELINE.md "BENCH comparison target": stage wall time on
identical input — load -> standardize -> aggregate build -> 14 analytics
queries — measured on the same machine).

Inputs:
  spark.json — written by `Cli run-e2e ... --timings spark.json`
               (stages: load quality standardize aggregates dims analytics
                finalize, + total + fact_rows)
  ref.json   — written by `tools/bench_e2e_ref.py` driving the reference's
               own loader/quality_checks/standardize/aggregations modules in
               DuckDB (stages: init_schema load quality standardize
               aggregates analytics, + total + fact_rows + analytics_rows)

Stage mapping notes recorded in the artifact:
  - the reference's `init_schema` (DDL + zones CSV load) has no Spark
    counterpart stage; Spark reads zones inline during `load`.
  - Spark's `dims` + `finalize` (dim-table writes + ingestion-log write)
    fold into the reference's `standardize`/`load` stages respectively;
    the honest headline is the TOTAL plus the five shared stages.

Usage:
  python3 tools/merge_e2e.py <out.json> <spark.json> <ref.json> <copies> <trips>
"""
import json
import sys


def main():
    out, spark_p, ref_p, copies, trips = sys.argv[1:6]
    spark = json.load(open(spark_p))
    ref = json.load(open(ref_p))
    shared = ["load", "quality", "standardize", "aggregates", "analytics"]
    doc = {
        "metric": "e2e_stage_wall_seconds",
        "unit": "sec",
        "input": {
            "generator": "graft.tlc.RawGen",
            "copies": int(copies),
            "trips": int(trips),
            "services": ["yellow", "green", "hvfhv"],
        },
        "spark": spark,
        "reference_duckdb": ref,
        "shared_stages": {
            s: {"spark": spark.get(s), "reference": ref.get(s)} for s in shared
        },
        "totals": {
            "spark": spark["total"],
            "reference": ref["total"],
            # ref totals of 0 only occur on malformed input, but the
            # artifact is committed — guard the division.
            "ratio_spark_over_reference": (
                round(spark["total"] / ref["total"], 3) if ref["total"] else None),
        },
        "fact_rows": {
            "spark": spark["fact_rows"],
            "reference": ref["fact_rows"],
            "match": spark["fact_rows"] == ref["fact_rows"],
        },
        "notes": (
            "Identical raw parquet input to both engines; reference side runs "
            "the reference's OWN Python modules (loader.py, quality_checks.py, "
            "standardize.py, aggregations.py, sql/analytics/*.sql) against "
            "DuckDB. Spark dims+finalize stages have no 1:1 reference stage "
            "(folded into its standardize/load); compare shared stages and "
            "totals. init_schema is reference-only (DDL + zones CSV)."
        ),
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(json.dumps(doc["totals"]))
    if not doc["fact_rows"]["match"]:
        print(f"WARNING: fact row mismatch {doc['fact_rows']}", file=sys.stderr)


if __name__ == "__main__":
    main()
