"""Z-order layout: Morton math vs a pure-Python reference, curve
properties (monotonicity, aligned-block contiguity), the DuckDB twin of
the portable normalization, and the pruning property zorder_sort exists
for (multi-column data skipping vs a single-column sort)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.zorder import (column_stats,
                                                  zorder_key,
                                                  zorder_key_sql,
                                                  zorder_sort)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _morton_py(vals: list[int], bits: int) -> int:
    n = len(vals)
    out = 0
    for c, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + c)
    return out


def _ident_stats(cols, bits):
    # (0, 2^bits-1) stats make normalization the identity on in-range ints
    return {c: (0.0, float((1 << bits) - 1)) for c in cols}


def test_interleave_matches_python_reference(spark):
    import random
    rng = random.Random(7)
    bits = 10
    rows = [(i, rng.randrange(1 << bits), rng.randrange(1 << bits),
             rng.randrange(1 << bits)) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, x long, y long, z long")
    got = {r.id: r.zkey for r in zorder_key(
        df, ["x", "y", "z"], bits=bits,
        stats=_ident_stats("xyz", bits)).collect()}
    for i, x, y, z in rows:
        assert got[i] == _morton_py([x, y, z], bits)


def test_single_axis_monotone(spark):
    bits = 8
    df = spark.createDataFrame([(x, 5) for x in range(256)], "x long, y long")
    rows = zorder_key(df, ["x", "y"], bits=bits,
                      stats=_ident_stats("xy", bits)).orderBy("x").collect()
    keys = [r.zkey for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == 256


def test_aligned_quadrant_is_contiguous(spark):
    # the quadtree property pruning relies on: an aligned 2^s x 2^s block
    # occupies one contiguous key range
    bits = 4
    grid = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, "x long, y long")
    keyed = zorder_key(df, ["x", "y"], bits=bits,
                       stats=_ident_stats("xy", bits))
    quad = sorted(r.zkey for r in
                  keyed.filter("x < 8 AND y < 8").collect())
    assert quad == list(range(64))
    all_keys = sorted(r.zkey for r in keyed.collect())
    assert all_keys == list(range(256))


def test_nulls_and_degenerate_range(spark):
    df = spark.createDataFrame(
        [(None, 3), (0, 3), (100, 3)], "x long, c long")
    rows = {(r.x, r.zkey) for r in
            zorder_key(df, ["x", "c"], bits=4).collect()}
    # constant column contributes lane 0; null x normalizes to 0
    assert (None, 0) in rows and (0, 0) in rows
    assert all(k < (1 << 8) for _, k in rows)


def test_computed_stats_match_manual(spark):
    df = spark.read.parquet(EVENTS)
    st = column_stats(df, ["user_id", "value"])
    mn, mx = st["value"]
    row = df.agg(F.min("value"), F.max("value")).collect()[0]
    assert (mn, mx) == (row[0], row[1])


def test_duckdb_twin_on_events(spark):
    df = spark.read.parquet(EVENTS)
    got = sorted((r.event_id, r.zkey) for r in
                 zorder_key(df, ["user_id", "value"], bits=16)
                 .select("event_id", "zkey").collect())
    sql = zorder_key_sql(f"'{EVENTS}'", ["user_id", "value"], bits=16,
                         id_cols=["event_id"])
    want = sorted((a, b) for a, b in duckdb.sql(sql).fetchall())
    assert got == want


def test_zorder_sort_prunes_where_linear_sort_cannot(spark):
    # 64x64 grid, 16 partitions; predicate selective on y ONLY.
    # x-sorted layout: every partition holds every y -> all 16 hit.
    # z-ordered layout: y<4 rows share a short key prefix -> few hit.
    bits = 6
    grid = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x long, y long")
    stats = _ident_stats("xy", bits)

    def partitions_hit(laid_out):
        hit = (laid_out.withColumn("p", F.spark_partition_id())
               .filter("y < 4").select("p").distinct().count())
        return hit

    z = zorder_sort(df, ["x", "y"], bits=bits, n_partitions=16, stats=stats)
    linear = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    z_hit, lin_hit = partitions_hit(z), partitions_hit(linear)
    assert lin_hit == 16
    assert z_hit <= 6          # 256 rows confined to the 1376-key prefix
    assert z.count() == 4096   # layout is a reordering, not a filter


def test_key_width_guard(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)
