"""Heavy hitters: the Misra-Gries guarantee (bounded undercount, no
false negatives above threshold), exact-recount equivalence with the
plain HAVING query under multiple partitionings, and the exact
top_frequent path vs DuckDB."""

import random
from collections import Counter

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.sketches import (heavy_hitters,
                                                    mg_summaries,
                                                    top_frequent)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _zipf_rows(n=20_000, seed=11):
    rng = random.Random(seed)
    # ~zipf over 2000 keys: key i with weight 1/(i+1)
    keys = [f"k{i:04d}" for i in range(2000)]
    w = [1.0 / (i + 1) for i in range(2000)]
    tot = sum(w)
    cum, acc = [], 0.0
    for x in w:
        acc += x / tot
        cum.append(acc)
    import bisect
    return [(i, keys[bisect.bisect_left(cum, rng.random())])
            for i in range(n)]


def _exact_hitters(rows, capacity):
    c = Counter(k for _, k in rows)
    n = len(rows)
    thr = n / (capacity + 1)
    return {k: v for k, v in c.items() if v > thr}


def test_heavy_hitters_equals_having_query(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "id long, key string")
    want = _exact_hitters(rows, capacity=64)
    got = {r.key: r.freq for r in
           heavy_hitters(df, "key", capacity=64).collect()}
    assert got == want
    assert len(got) > 5                      # the fixture has hitters


def test_partitioning_invariance(spark):
    rows = _zipf_rows(n=8_000, seed=3)
    want = _exact_hitters(rows, capacity=32)
    for parts in (1, 4, 13):
        df = spark.createDataFrame(rows, "id long, key string") \
            .repartition(parts)
        got = {r.key: r.freq for r in
               heavy_hitters(df, "key", capacity=32).collect()}
        assert got == want, f"parts={parts}"


def test_mg_summary_bounds(spark):
    rows = _zipf_rows(n=10_000, seed=5)
    df = spark.createDataFrame(rows, "id long, key string").repartition(4)
    cap = 50
    s = mg_summaries(df, "key", cap).toPandas()
    true = Counter(k for _, k in rows)
    n = len(rows)
    # sentinel channel carries exactly N
    assert int(s["n_seen"].sum()) == n
    data = s[s["key"].notna()]
    # ≤ cap non-null rows per partition → ≤ 4*cap total
    assert len(data) <= 4 * cap
    merged = data.groupby("key")["est"].sum()
    for k, est in merged.items():
        assert est <= true[k]                       # only undercounts
        assert true[k] - est <= n / (cap + 1) + 1e-9


def test_no_false_negatives_above_threshold(spark):
    # adversarial shape for a naive top-capacity cut: one partition of
    # junk singletons inflating other keys' estimates
    rows = [(i, "hot") for i in range(800)]
    rows += [(1000 + i, f"warm{i % 30}") for i in range(3000)]
    rows += [(10_000 + i, f"junk{i}") for i in range(4000)]
    random.Random(0).shuffle(rows)
    rows = [(i, k) for i, (_, k) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(8)
    cap = 16
    want = _exact_hitters(rows, cap)
    got = {r.key: r.freq for r in
           heavy_hitters(df, "key", capacity=cap).collect()}
    assert got == want
    assert "hot" in got


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (5, None), (6, "b")],
        "id long, key string")
    got = {r.key: r.freq for r in
           heavy_hitters(df, "key", capacity=2).collect()}
    # N = 3 non-null rows... no: N counts non-null = 3? a=2,b=1 -> N=3,
    # threshold 1.0 -> only a qualifies
    assert got == {"a": 2}


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, key string")
    assert heavy_hitters(df, "key", capacity=4).count() == 0


def test_top_frequent_matches_duckdb(spark):
    from llmxmapreduce_spark.operators.text_stats import lower_ws_tokens

    docs = spark.read.parquet(DOCS)
    toks = docs.select(F.explode(lower_ws_tokens(F.col("text")))
                       .alias("tok")).filter("tok <> ''")
    got = [(r.key, r.freq) for r in top_frequent(toks, "tok", 20).collect()]
    want = duckdb.sql(f"""
        WITH t AS (
          SELECT unnest(string_split_regex(
                   trim(lower(text)), '\\s+')) AS tok
          FROM '{DOCS}' WHERE text IS NOT NULL)
        SELECT tok, COUNT(*) AS freq FROM t WHERE tok <> ''
        GROUP BY tok ORDER BY freq DESC, tok ASC LIMIT 20
    """).fetchall()
    assert got == want
