#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and the
matching ``oracle_sql()`` in DuckDB over the same parquet, then compares
row count, column-name set, and exact values (columns sorted by name, rows
sorted).  Prints one line per query plus a first-diff detail on mismatch.

Usage: python tools/verify_local.py [sf_dir] [query ...]
       python tools/verify_local.py --fingerprint [sf_dir] [query ...]

``--fingerprint`` replaces the collect-based compare with an AGGREGATE
fingerprint computed inside each engine — count(*) plus the sum of a
60-bit integer slice of md5 over the name-sorted, normalized row string
— so results far too large to collect (the ~27 M-row sf5 pair listings)
still get a values-grade check.  Engine parity of every building block
(md5 hex, 15-hex-char → int) is probe-verified.  Doubles are normalized
as ``floor(col * 1e6)`` cast to an exact integer string: the multiply
and floor are IEEE754 ops both engines execute identically on the same
bits, where printf-style formatting is NOT portable (Java %.9f pads the
SHORTEST decimal repr with zeros, C prints the exact binary expansion)
— i.e. double columns fingerprint at 1e-6 truncation granularity.
Supported column types: numeric/string/bool/timestamp (arrays/structs
would need engine-specific stringification).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from llmxmapreduce_spark import TABLES  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402

NULL_SENTINEL = "\x00NULL"


def spark_fingerprint(sdf):
    """(row_count, fingerprint) computed ENGINE-SIDE — nothing collects
    but the two aggregates."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    dt = dict(sdf.dtypes)
    parts = []
    inf = float("inf")
    for c in cols:
        if dt[c] in ("double", "float"):
            d = F.col(c).cast("double")
            e = (F.when(F.isnan(d), F.lit("NaN"))
                 .when(d == F.lit(inf), F.lit("Inf"))
                 .when(d == F.lit(-inf), F.lit("-Inf"))
                 .otherwise(F.floor(d * F.lit(1_000_000.0))
                            .cast("decimal(38,0)").cast("string")))
        else:
            e = F.col(c).cast("string")
        parts.append(F.coalesce(e, F.lit(NULL_SENTINEL)))
    s = F.concat_ws("\x1f", *parts)
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("decimal(38,0)")
    row = sdf.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(h).alias("fp")).collect()[0]
    return int(row["n"]), int(row["fp"] or 0)


def duck_fingerprint(con, osql: str):
    """Same fingerprint in DuckDB over the oracle SQL."""
    desc = con.execute(f"DESCRIBE SELECT * FROM ({osql}) t").fetchall()
    cols = sorted((r[0], r[1]) for r in desc)
    parts = []
    for name, typ in cols:
        base = typ.upper().split("(")[0]
        if base in ("DOUBLE", "FLOAT", "REAL"):
            d = f'CAST("{name}" AS DOUBLE)'
            e = (f"CASE WHEN isnan({d}) THEN 'NaN' "
                 f"WHEN {d} = 'Infinity'::DOUBLE THEN 'Inf' "
                 f"WHEN {d} = '-Infinity'::DOUBLE THEN '-Inf' "
                 f"ELSE CAST(CAST(floor({d} * 1000000.0) AS HUGEINT) "
                 f"AS VARCHAR) END")
        else:
            e = f'CAST("{name}" AS VARCHAR)'
        parts.append(f"coalesce({e}, chr(0) || 'NULL')")
    s = "concat_ws(chr(31), " + ", ".join(parts) + ")"
    h = f"CAST(('0x' || substr(md5({s}),1,15)) AS UBIGINT)"
    n, fp = con.execute(
        f"SELECT count(*), sum({h}) FROM ({osql}) t").fetchone()
    return int(n), int(fp or 0)


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    args = [a for a in sys.argv[1:] if a != "--fingerprint"]
    fingerprint = "--fingerprint" in sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if fingerprint:
            osql = oracles.get(name)
            try:
                sdf = fn(spark, sf)
                sn, sfp = spark_fingerprint(sdf)
            except Exception as e:
                print(f"FAIL {name}: spark error: {str(e)[:300]}")
                n_fail += 1
                continue
            if osql is None:
                print(f"ROWS-ONLY {name}: {sn} rows ({time.time()-t0:.1f}s)")
                n_pass += 1
                continue
            try:
                on, ofp = duck_fingerprint(con, osql)
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
                n_fail += 1
                continue
            if (sn, sfp) == (on, ofp):
                print(f"PASS-FP {name}: {sn} rows, fp {sfp % 10**12} "
                      f"({time.time()-t0:.1f}s)")
                n_pass += 1
            else:
                print(f"FAIL {name}: fingerprint spark=({sn},{sfp}) "
                      f"duck=({on},{ofp})")
                n_fail += 1
            continue
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        osql = oracles.get(name)
        if osql is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.execute(osql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
            if a != b:
                ndiff = sum(1 for x, y in zip(a, b) if x != y)
                first = next(((x, y) for x, y in zip(a, b) if x != y), None)
                problems.append(f"values: {ndiff}/{len(a)} rows differ; first: spark={first[0]} duck={first[1]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
