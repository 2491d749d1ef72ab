#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
    python3 tools/crosscheck.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet dir against oracle_sql.json run in
DuckDB with views over <sfDir>/*.parquet. Reports row-count, schema (column
name), ordered-equality and unordered-equality per query."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def reprhash(df):
    """Driver-style representation-sensitive digest: stringify every cell
    (so int64 0 vs float64 0.0, and -0.0 vs +0.0, DIFFER) after sorting
    columns by name and rows by stringified values. Catches the two oracle
    representation classes (DuckDB HUGEINT->float64, ROUND IEEE -0.0) that
    elementwise == comparison cannot see."""
    import hashlib
    d = df.reindex(sorted(df.columns), axis=1).copy()
    for c in d.columns:
        if pd.api.types.is_float_dtype(d[c]):
            d[c] = d[c].map(lambda v: repr(float(v)))  # repr(-0.0) == '-0.0'
        elif pd.api.types.is_datetime64_any_dtype(d[c]):
            d[c] = pd.to_datetime(d[c]).dt.strftime("%Y-%m-%d %H:%M:%S")
        else:
            import datetime as _dt
            def _r(v):
                # normalize date/datetime objects to the datetime64 string
                # form so Spark's datetime.date == DuckDB's Timestamp
                # (the driver compares these as equal; only float sign and
                # int-vs-float dtype are the real hash classes)
                if isinstance(v, (_dt.datetime, _dt.date)):
                    return pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S")
                return repr(v)
            d[c] = d[c].astype(object).map(_r)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()

def cmp_vals(a, b):
    """Exact elementwise comparison with NaN==NaN and dtype laxity."""
    if a.shape != b.shape:
        return False, "shape %s vs %s" % (a.shape, b.shape)
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv, yv = x.astype(float).values, y.astype(float).values
            ok = (np.isnan(xv) & np.isnan(yv)) | (xv == yv)
            if not ok.all():
                i = int(np.argmin(ok))
                return False, f"col {c} row {i}: {xv[i]!r} != {yv[i]!r}"
        elif pd.api.types.is_datetime64_any_dtype(x) or pd.api.types.is_datetime64_any_dtype(y):
            xv = pd.to_datetime(x).astype("datetime64[ns]")
            yv = pd.to_datetime(y).astype("datetime64[ns]")
            ok = (xv.isna() & yv.isna()) | (xv == yv)
            if not ok.all():
                i = int(np.argmin(ok.values))
                return False, f"col {c} row {i}: {xv.iloc[i]!r} != {yv.iloc[i]!r}"
        else:
            ok = (x.isna() & y.isna()) | (x.astype(object) == y.astype(object))
            if not ok.all():
                i = int(np.argmin(ok.values))
                return False, f"col {c} row {i}: {x.iloc[i]!r} != {y.iloc[i]!r}"
    return True, ""

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pqdir = os.path.join(out, name)
        files = sorted(glob.glob(f"{pqdir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pqdir}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s, dk = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(dk.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(dk.columns)}")
            n_fail += 1
            continue
        ok_ord, why = cmp_vals(s, dk)
        if ok_ord:
            hs, hd = reprhash(s), reprhash(dk)
            if hs == hd:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
            else:
                # values equal but representation differs (e.g. -0.0 / dtype)
                # -> find the first differing cell repr for the message
                detail = ""
                ss = s.reindex(sorted(s.columns), axis=1)
                dd2 = dk.reindex(sorted(dk.columns), axis=1)
                for c in ss.columns:
                    for i in range(len(ss)):
                        if repr(ss[c].iloc[i]) != repr(dd2[c].iloc[i]):
                            detail = f" col {c} row {i}: {ss[c].iloc[i]!r} vs {dd2[c].iloc[i]!r}"
                            break
                    if detail:
                        break
                print(f"HASHDIFF {name}: values equal, repr differs{detail}")
                n_fail += 1
        else:
            # retry unordered: sort by all stringified columns
            try:
                key = lambda df: df.sort_values(by=list(df.columns),
                    key=lambda col: col.astype(str)).reset_index(drop=True)
                ok_uno, why2 = cmp_vals(key(s), key(dk))
            except Exception:
                ok_uno = False
            tag = "ORDER-ONLY" if ok_uno else "FAIL"
            print(f"{tag} {name}: {why}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)}")
    sys.exit(1 if n_fail else 0)

main()
