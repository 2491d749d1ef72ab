#!/usr/bin/env python3
"""Reference-engine side of the BENCH_E2E stage-wall-time comparable
(BASELINE.md "BENCH comparison target"): drive the reference pipeline's OWN
modules (loader.py -> quality_checks.py -> standardize.py -> aggregations.py
-> the 14 sql/analytics files) against its own DuckDB database, on the same
raw parquet files `Cli run-e2e` consumes, and print per-stage wall seconds.

The reference code is imported from /root/reference at runtime (loguru is
shimmed to a no-op logger; nothing is copied). DuckDB thread/memory settings
are whatever the reference's own connection/transform code sets -- that
configuration is part of the system under measurement.

Usage:
    python3 tools/bench_e2e_ref.py <rawDir> <dbPath>

rawDir must contain yellow.parquet/ green.parquet/ hvfhv.parquet (Spark
part-file directories or single files) and zones_csv/ (one CSV part), as
written by `runMain graft.tlc.RawGen <rawDir> <copies>`.

Prints ONE JSON line:
    {"init_schema": s, "load": s, "quality": s, "standardize": s,
     "aggregates": s, "analytics": s, "total": s, "fact_rows": n,
     "analytics_rows": {...}}
"""
import glob
import json
import os
import sys
import time
import types
from pathlib import Path


def main():
    raw_dir, db_path = sys.argv[1], sys.argv[2]

    # no-op loguru shim: the reference imports `from loguru import logger`
    class _NoopLogger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    sys.modules["loguru"] = types.SimpleNamespace(logger=_NoopLogger())
    sys.path.insert(0, "/root/reference")
    for p in glob.glob(db_path + "*"):
        os.remove(p)
    os.environ["DUCKDB_PATH"] = db_path  # absolute -> overrides PROJECT_ROOT join

    from src.database.schema import SchemaManager
    from src.database.loader import DataLoader
    from src.database.connection import DatabaseConnection
    from src.transformations.standardize import DataTransformer
    from src.transformations.aggregations import AggregationBuilder
    from src.transformations.quality_checks import DataQualityChecker

    timings = {}

    def timed(name, fn):
        print(f"[ref] stage {name}...", file=sys.stderr, flush=True)
        t0 = time.time()
        r = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"[ref] stage {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return r

    def part_files(name):
        d = Path(raw_dir) / name
        if d.is_dir():
            return sorted(d.glob("*.parquet"))
        return [d]

    def init_schema():
        SchemaManager.initialize_database()
        zcsv = sorted(glob.glob(os.path.join(raw_dir, "zones_csv", "*.csv")))
        SchemaManager.load_taxi_zones(Path(zcsv[0]))

    def load():
        for svc in ("yellow", "green", "hvfhv"):
            for p in part_files(f"{svc}.parquet"):
                r = DataLoader.load_parquet_to_raw(p, svc)
                assert r["status"] in ("success", "skipped"), r

    def quality():
        checker = DataQualityChecker()
        for t in ("raw_yellow", "raw_green", "raw_hvfhv"):
            checker.run_all_checks(t)

    def standardize():
        return DataTransformer.transform_all()

    def aggregates():
        return AggregationBuilder.build_all()

    analytics_rows = {}
    analytics_failed = {}

    def analytics():
        # Per-query failure capture: the reference's own schema dropped
        # fact_trips.dropoff_zone_id / dropoff_datetime (schema.py), but
        # sql/analytics/06 and 10 still reference them — `run-analytics`
        # on those files fails against the reference's own pipeline. Time
        # the stage over the queries that run; record the failures.
        conn = DatabaseConnection.get_connection()
        for f in sorted(glob.glob("/root/reference/sql/analytics/*.sql")):
            print(f"[ref] {Path(f).stem}", file=sys.stderr, flush=True)
            sql = Path(f).read_text()
            try:
                df = conn.execute(sql).fetchdf()
                analytics_rows[Path(f).stem] = len(df)
            except Exception as e:
                analytics_failed[Path(f).stem] = str(e).split("\n")[0][:200]

    timed("init_schema", init_schema)
    timed("load", load)
    timed("quality", quality)
    timed("standardize", standardize)
    timed("aggregates", aggregates)
    timed("analytics", analytics)

    conn = DatabaseConnection.get_connection()
    fact_rows = conn.execute("SELECT COUNT(*) FROM fact_trips").fetchone()[0]
    timings["total"] = round(sum(timings.values()), 3)
    timings["fact_rows"] = fact_rows
    timings["analytics_rows"] = analytics_rows
    if analytics_failed:
        timings["analytics_failed"] = analytics_failed
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
