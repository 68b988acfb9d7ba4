"""One-pass DQ constraints: per-kind semantics on planted data, the
DuckDB twin over documents, single-aggregation plan pin, and failure
reporting (measured value recorded next to the verdict)."""

import duckdb
import pytest

from llmxmapreduce_spark.operators.constraints import (constraints_sql,
                                                       dq_check)

DOCS = "/root/testdata/sf0.001/documents.parquet"

RULES = [
    {"name": "text_complete", "kind": "complete", "col": "text",
     "bound": 0.95},
    {"name": "id_unique", "kind": "unique", "col": "doc_id",
     "bound": 1.0},
    {"name": "chars_min", "kind": "min", "col": "n_chars", "bound": 0.0},
    {"name": "chars_max", "kind": "max", "col": "n_chars",
     "bound": 1e9},
    {"name": "lang_vocab", "kind": "in_set", "col": "lang",
     "values": ["en", "zh", "de", "fr", "es"], "bound": 1.0},
    {"name": "lang_shape", "kind": "matches", "col": "lang",
     "pattern": "^[a-z][a-z]$", "bound": 1.0},
    {"name": "chars_nonneg", "kind": "satisfies",
     "expr": "n_chars >= 0", "bound": 1.0},
]


def test_matches_duckdb_twin(spark):
    df = spark.read.parquet(DOCS)
    got = sorted((r.rule, r.column, r.metric, round(r.value, 12),
                  r.threshold, r.passed)
                 for r in dq_check(df, RULES).collect())
    want = sorted((a, b, c, round(d, 12), e, f) for a, b, c, d, e, f in
                  duckdb.sql(constraints_sql(f"'{DOCS}'",
                                             RULES)).fetchall())
    assert got == want
    assert all(p for *_, p in got)       # the shipped fixtures are clean


def test_kind_semantics(spark):
    rows = [(1, "a", 10.0), (2, None, -3.0), (3, "b", 10.0),
            (3, "zz", 4.0)]
    df = spark.createDataFrame(rows, "id long, cat string, x double")
    rules = [
        {"name": "c", "kind": "complete", "col": "cat", "bound": 0.9},
        {"name": "u", "kind": "unique", "col": "id", "bound": 1.0},
        {"name": "mn", "kind": "min", "col": "x", "bound": 0.0},
        {"name": "mx", "kind": "max", "col": "x", "bound": 5.0},
        {"name": "s", "kind": "in_set", "col": "cat",
         "values": ["a", "b"], "bound": 0.9},
        {"name": "m", "kind": "matches", "col": "cat",
         "pattern": "^[a-b]$", "bound": 0.9},
        {"name": "p", "kind": "satisfies", "expr": "x > 0",
         "bound": 1.0},
    ]
    got = {r.rule: (round(r.value, 9), r.passed) for r in
           dq_check(df, rules).collect()}
    assert got["c"] == (0.75, False)          # 3/4 non-null
    assert got["u"] == (0.75, False)          # 3 distinct / 4 rows
    assert got["mn"] == (-3.0, False)
    assert got["mx"] == (10.0, False)
    # in_set / matches ignore nulls: 2 of 3 non-null are in {a,b}
    assert got["s"] == (round(2 / 3, 9), False)
    assert got["m"] == (round(2 / 3, 9), False)
    assert got["p"] == (0.75, False)          # -3.0 fails


def test_single_pass_plan(spark):
    df = spark.read.parquet(DOCS)
    plan = dq_check(df, RULES)._jdf.queryExecution() \
        .executedPlan().toString()
    # one scan feeds everything: exactly one parquet scan node
    assert plan.count("Scan parquet") == 1
    assert "Python" not in plan


def test_empty_rules_raise(spark):
    df = spark.read.parquet(DOCS)
    with pytest.raises(ValueError):
        dq_check(df, [])
