#!/usr/bin/env python3
"""Deterministic sf1 scale-up (10x sf0.1) for scaling-slope measurement.

/root/testdata tops out at sf0.1 and is read-only, so the sf1 bench input
is DERIVED: every fact table becomes 10 key-shifted copies of its sf0.1
version, written to a scratch dir. Pure SQL over the source parquet —
no RNG, no timestamps — so two runs produce byte-identical inputs and the
BENCH_SF1/DUCKBASE_SF1 artifacts are reproducible from the repo alone.

Shift design (what stays realistic at 10x):
- dims (region nation customer supplier part): copied once, unshifted —
  fact-to-dim fan-in grows 10x, exactly how a fixed dim sees more traffic.
- orders/lineitem: o_orderkey/l_orderkey shifted per copy — join keys stay
  consistent, key cardinality grows 10x, group counts per key stay flat.
- events: event_id + user_id shifted — 10x users over the same time range
  (session/window state cardinality scales; per-user series unchanged).
- documents: doc_id shifted; copies > 0 get a copy-marker word PREPENDED —
  texts are distinct but near-identical across copies, so the dedup suite
  faces bounded near-dup clusters (size 10): candidate pairs grow ~45x,
  still LINEAR in corpus size (bounded cluster size), which is the
  worst-case-but-sane regime for LSH banding.
- embeddings: vec_id shifted, vectors unchanged — ANN cells grow 10x
  members; ranking ties across copies break deterministically on vec_id.

Usage: python3 tools/gen_sf1.py [/root/testdata/sf0.1] [/tmp/graft_sf1]
"""
import sys
import duckdb

COPIES = 10


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(name, sql):
        con.sql(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        write(dim, f"SELECT * FROM '{src}/{dim}.parquet'")

    # key spans (max+1) so shifted ids never collide
    ko = con.sql(f"SELECT MAX(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
    ke = con.sql(f"SELECT MAX(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
    ku = con.sql(f"SELECT MAX(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
    kd = con.sql(f"SELECT MAX(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
    kv = con.sql(f"SELECT MAX(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]

    def copies(body):
        return " UNION ALL ".join(body(c) for c in range(COPIES))

    write("orders", copies(lambda c: f"""
        SELECT o_orderkey + {c * ko} AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'"""))

    write("lineitem", copies(lambda c: f"""
        SELECT l_orderkey + {c * ko} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'"""))

    write("events", copies(lambda c: f"""
        SELECT event_id + {c * ke} AS event_id, ts,
               user_id + {c * ku} AS user_id, event_type, value, props
        FROM '{src}/events.parquet'"""))

    # shifted copies prepend 'v{c} ' to text, so n_chars must shift by the
    # prefix length too — otherwise ~90% of sf1 docs carry n_chars !=
    # length(text) and length-proxy gates bench against stale metadata
    write("documents", copies(lambda c: f"""
        SELECT doc_id + {c * kd} AS doc_id,
               {"text" if c == 0 else f"'v{c} ' || text"} AS text,
               lang, source,
               {"n_chars" if c == 0 else f"n_chars + {len(f'v{c} ')}"} AS n_chars
        FROM '{src}/documents.parquet'"""))

    write("embeddings", copies(lambda c: f"""
        SELECT vec_id + {c * kv} AS vec_id, embedding, label
        FROM '{src}/embeddings.parquet'"""))


if __name__ == "__main__":
    main()
