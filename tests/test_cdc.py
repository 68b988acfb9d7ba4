"""CDC apply: compaction tie rules, delete/upsert interleavings,
base passthrough, and the DuckDB window-ladder twin."""

import duckdb
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators.cdc import apply_cdc, latest_changes

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"


def test_compaction_latest_wins(spark):
    rows = [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "x"),
            (2, 5.0, "y")]                       # tie on (2, 5.0)
    df = spark.createDataFrame(rows, "k long, ts double, v string")
    got = {r.k: (r.ts, r.v) for r in
           latest_changes(df, on="k", ts_cols="ts").collect()}
    assert got[1] == (20.0, "b")
    assert got[2] == (5.0, "y")                  # max payload on tie
    # repartition-invariant
    got2 = {r.k: (r.ts, r.v) for r in
            latest_changes(df.repartition(5), on="k").collect()}
    assert got2 == got


def test_apply_semantics(spark):
    base = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, 1.0, "up", "new1"),          # upsert existing
         (2, 1.0, "delete", None),        # delete existing
         (2, 2.0, "up", "back2"),         # ...but a LATER upsert wins
         (3, 1.0, "up", "x"),
         (3, 2.0, "delete", None),        # delete wins over older upsert
         (4, 1.0, "up", "new4"),          # insert new key
         (5, 1.0, "delete", None)],       # delete absent key: no-op
        "k long, ts double, op string, v string")
    got = {r.k: r.v for r in
           apply_cdc(base, changes, on="k").collect()}
    assert got == {1: "new1", 2: "back2", 4: "new4"}


def test_matches_duckdb_twin(spark):
    ev = load_table(spark, SF, "events")
    base = (ev.filter((F.col("event_type") == "purchase")
                      & (F.col("event_id") % 2 == 0))
            .groupBy("user_id").agg(F.max("value").alias("value")))
    changes = ev.filter(F.col("event_type").isin("purchase", "error")) \
        .select("user_id", "ts",
                F.when(F.col("event_type") == "error", "delete")
                .otherwise("upsert").alias("op"), "value")
    got = sorted((r.user_id, None if r.value is None
                  else round(r.value, 9)) for r in
                 apply_cdc(base, changes, on="user_id").collect())
    want = sorted(duckdb.sql(f"""
        WITH e AS (SELECT * FROM '{EVENTS}'),
        base AS (SELECT user_id, MAX(value) AS value FROM e
                 WHERE event_type = 'purchase' AND event_id % 2 = 0
                 GROUP BY user_id),
        ch AS (SELECT user_id, ts,
                      CASE WHEN event_type = 'error' THEN 'delete'
                           ELSE 'upsert' END AS op, value
               FROM e WHERE event_type IN ('purchase', 'error')),
        latest AS (SELECT user_id, op, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ts DESC, op DESC, value DESC NULLS LAST) AS rn
            FROM ch) WHERE rn = 1)
        SELECT COALESCE(b.user_id, l.user_id) AS user_id,
               CASE WHEN l.user_id IS NOT NULL THEN l.value
                    ELSE b.value END AS value
        FROM base b FULL OUTER JOIN latest l USING (user_id)
        WHERE NOT (l.user_id IS NOT NULL AND l.op = 'delete')
    """).fetchall())
    want = [(u, None if v is None else round(v, 9)) for u, v in want]
    assert got == want


def test_null_key_changes_are_dropped(spark):
    # review finding: a null-key change row never joins (null == null is
    # false), so it used to emit a spurious all-null snapshot row; a
    # null-key delete could never apply either
    from llmxmapreduce_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame([(1, "a")], "id int, v string")
    changes = spark.createDataFrame(
        [(None, "x", 1, "upsert"), (None, None, 2, "delete"),
         (2, "b", 3, "upsert")],
        "id int, v string, ts int, op string")
    got = sorted((r.id, r.v) for r in
                 apply_cdc(base, changes, on="id").collect())
    assert got == [(1, "a"), (2, "b")]       # no all-null row
