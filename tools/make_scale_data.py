#!/usr/bin/env python
"""Scale-factor multiplier for the driver-generated test tables.

Produces an sf-K' dataset from an existing sf directory by replicating each
fact table ``factor`` times with disjoint key spaces and consistent foreign
keys (classic TPC-H-style scale-out: region/nation stay fixed, every other
table grows linearly).  Text and embeddings are perturbed per copy so
dedup/similarity operators see *near*-duplicates across copies instead of
degenerate exact clones (which would quadratically inflate every LSH
bucket and measure a pathology, not a scale-up).

DuckDB does the heavy lifting — no Spark session, so a bench/test run can
share the box.  Determinism: pure key arithmetic + per-copy constants; no
RNG.

Usage: python tools/make_scale_data.py SRC_DIR DST_DIR FACTOR
       python tools/make_scale_data.py /root/testdata/sf0.1 scale_data/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb


def q(con, sql):
    return con.execute(sql)


def main() -> int:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def src_tbl(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def write(name: str, select_sql: str) -> None:
        q(con, f"COPY ({select_sql}) TO '{dst}/{name}.parquet' "
               f"(FORMAT PARQUET)")
        n = q(con, f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # key strides: one disjoint key space per copy
    stride = {}
    for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
        stride[t] = q(con, f"SELECT MAX({k}) + 1 FROM {src_tbl(t)}").fetchone()[0]
    user_stride = q(con, f"SELECT MAX(user_id) + 1 FROM {src_tbl('events')}"
                    ).fetchone()[0]

    copies = f"(SELECT UNNEST(range({factor})) AS __i)"

    # dimensions: fixed size at every scale factor (TPC-H semantics)
    write("region", f"SELECT * FROM {src_tbl('region')}")
    write("nation", f"SELECT * FROM {src_tbl('nation')}")

    write("customer", f"""
        SELECT c_custkey + __i * {stride['customer']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src_tbl('customer')} CROSS JOIN {copies}""")

    write("supplier", f"""
        SELECT s_suppkey + __i * {stride['supplier']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {src_tbl('supplier')} CROSS JOIN {copies}""")

    write("part", f"""
        SELECT p_partkey + __i * {stride['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src_tbl('part')} CROSS JOIN {copies}""")

    write("orders", f"""
        SELECT o_orderkey + __i * {stride['orders']} AS o_orderkey,
               o_custkey + __i * {stride['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src_tbl('orders')} CROSS JOIN {copies}""")

    write("lineitem", f"""
        SELECT l_orderkey + __i * {stride['orders']} AS l_orderkey,
               l_partkey + __i * {stride['part']} AS l_partkey,
               l_suppkey + __i * {stride['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src_tbl('lineitem')} CROSS JOIN {copies}""")

    # events keep their timestamps: K x the events per window exercises the
    # window/session state exactly like a denser stream would
    write("events", f"""
        SELECT event_id + __i * {stride['events']} AS event_id, ts,
               user_id + __i * {user_stride} AS user_id,
               event_type, value, props
        FROM {src_tbl('events')} CROSS JOIN {copies}""")

    # per-copy text suffix: near-duplicates across copies (shingle sets
    # differ by one token), never exact clones
    write("documents", f"""
        SELECT doc_id + __i * {stride['documents']} AS doc_id,
               CASE WHEN __i = 0 THEN text
                    ELSE text || ' copy' || __i END AS text,
               lang, source,
               CASE WHEN __i = 0 THEN n_chars
                    ELSE n_chars + LENGTH(' copy' || __i) END AS n_chars
        FROM {src_tbl('documents')} CROSS JOIN {copies}""")

    # per-copy scale+shift: changes the angle slightly (cosine-near, not
    # cosine-identical) while staying deterministic
    write("embeddings", f"""
        SELECT vec_id + __i * {stride['embeddings']} AS vec_id,
               CASE WHEN __i = 0 THEN embedding
                    ELSE list_transform(
                        embedding,
                        x -> CAST(x * (1.0 + 0.001 * __i) + 0.0001 * __i
                                  AS FLOAT))
               END AS embedding,
               label
        FROM {src_tbl('embeddings')} CROSS JOIN {copies}""")

    print(f"done: {dst} = {factor}x {src}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
