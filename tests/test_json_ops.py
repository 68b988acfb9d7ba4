"""JSON column operators: corrupt/null lanes, typed extraction vs
DuckDB, kv explode vs json_each, and the zero-Python plan pin."""

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.json_ops import (json_kv_explode,
                                                    json_scalar,
                                                    parse_json)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_scalar_extract_matches_duckdb(spark):
    ev = spark.read.parquet(EVENTS)
    got = sorted((r.event_id, r.k) for r in ev.select(
        "event_id", json_scalar("props", "$.k", "long").alias("k"))
        .collect())
    want = sorted(duckdb.sql(f"""
        SELECT event_id, CAST(props::JSON ->> 'k' AS BIGINT) AS k
        FROM '{EVENTS}'
    """).fetchall())
    assert got == want
    assert any(k is not None for _, k in got)


def test_parse_json_lanes(spark):
    rows = [(1, '{"k": 7}'), (2, "not json"), (3, None),
            (4, '{"k": "notint"}'), (5, '{"other": 1}')]
    df = spark.createDataFrame(rows, "id long, props string")
    out = parse_json(df, "props", "k long")
    got = {r.id: (r.parsed["k"] if r.parsed is not None else None,
                  r.corrupt) for r in out.collect()}
    assert got[1] == (7, False)
    assert got[2] == (None, True)        # malformed -> corrupt lane
    assert got[3] == (None, False)       # null payload is NOT corrupt
    assert got[5] == (None, False)       # missing key: parsed, k null
    # "notint" fails the long coercion: field null AND flagged corrupt
    assert got[4] == (None, True)


def test_kv_explode_matches_json_each(spark):
    rows = [(1, '{"a": 1, "b": "x"}'), (2, '{"c": 2.5}'), (3, None),
            (4, "broken")]
    df = spark.createDataFrame(rows, "id long, props string")
    got = sorted((r.id, r.key, r.value) for r in
                 json_kv_explode(df, "props", ["id"]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                "(1, '{\"a\": 1, \"b\": \"x\"}'), (2, '{\"c\": 2.5}')"
                ") AS v(id, props)")
    want = sorted(con.execute("""
        SELECT t.id, u.k AS key, t.props::JSON ->> u.k AS value
        FROM t, unnest(json_keys(t.props::JSON)) AS u(k)
    """).fetchall())
    assert got == want


def test_kv_explode_on_events(spark):
    ev = spark.read.parquet(EVENTS)
    prof = (json_kv_explode(ev, "props", ["event_id"])
            .groupBy("key").count().collect())
    assert {r.key for r in prof} == {"k"}
    assert prof[0]["count"] == ev.filter("props IS NOT NULL").count()


def test_plan_is_pure_codegen(spark):
    ev = spark.read.parquet(EVENTS)
    out = parse_json(ev.select("event_id", "props"), "props", "k long")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
