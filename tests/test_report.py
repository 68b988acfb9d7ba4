"""Corpus datasheet rollup (operators/report.py): exact DuckDB twin,
grouping-level semantics with genuinely-null strata, internal
consistency of the hierarchy, and the one-scan plan pin."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.report import corpus_report

_WORDS = r"CAST(LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS BIGINT)"


def _rows():
    out = []
    for i in range(120):
        src = f"s{i % 3}"
        lang = None if i % 10 == 0 else f"l{i % 2}"
        out.append((i, src, lang, f"word{i} " * (1 + i % 7)))
    return out


def test_twin_matches_duckdb(spark):
    rows = _rows()
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "lang",
                                      "text"])  # noqa: F841
    sdf = spark.createDataFrame(
        rows, "doc_id bigint, source string, lang string, text string")
    def _key(t):
        return tuple((x is None, x) for x in t)

    got = sorted((tuple(r) for r in corpus_report(sdf).collect()),
                 key=_key)
    duck = duckdb.sql(f"""
        SELECT source, lang,
               CAST(GROUPING(source, lang) AS BIGINT) AS level,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum({_WORDS}) AS BIGINT) AS total_words,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               CAST((sum({_WORDS}) * 1000000) // count(*) AS BIGINT)
                 AS avg_words_micro
        FROM pdf GROUP BY ROLLUP (source, lang)""").fetchall()
    assert got == sorted((tuple(r) for r in duck), key=_key)


def test_levels_and_null_strata_disambiguated(spark):
    sdf = spark.createDataFrame(
        _rows(), "doc_id bigint, source string, lang string, text string")
    out = corpus_report(sdf).collect()
    # grand total: level 3, both strata null, all 120 docs
    gt = [r for r in out if r["level"] == 3]
    assert len(gt) == 1 and gt[0]["n_docs"] == 120
    # per-source subtotals: level 1 (lang rolled up), one per source
    subs = [r for r in out if r["level"] == 1]
    assert {r["source"] for r in subs} == {"s0", "s1", "s2"}
    assert sum(r["n_docs"] for r in subs) == 120
    # genuinely-null lang rows stay at level 0, distinct from subtotals
    nulls = [r for r in out if r["level"] == 0 and r["lang"] is None]
    assert sum(r["n_docs"] for r in nulls) == 12
    # hierarchy is internally consistent (finest sums to subtotals)
    fine = [r for r in out if r["level"] == 0]
    for s in ("s0", "s1", "s2"):
        want = next(r for r in subs if r["source"] == s)
        assert sum(r["n_docs"] for r in fine if r["source"] == s) \
            == want["n_docs"]
        assert sum(r["total_words"] for r in fine if r["source"] == s) \
            == want["total_words"]


def test_single_scan_single_shuffle(spark):
    sdf = spark.createDataFrame(
        _rows(), "doc_id bigint, source string, lang string, text string")
    plan = corpus_report(sdf) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1        # one agg shuffle, no joins
    assert "Expand" in plan                   # rollup via Expand, 1 scan
