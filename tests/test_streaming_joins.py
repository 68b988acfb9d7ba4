"""Watermarked stream-stream interval join (streaming/joins.py):
stream ≡ batch on the same data, attribution semantics (only clicks in
[impression, impression + bound] pair), outer-mode null padding, and
the bounded-state contract (watermarks present on both streaming
sides)."""

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.streaming.joins import interval_join


def _fixture(spark):
    imps = spark.createDataFrame(
        [(1, "i1", "2024-01-01 10:00:00"),
         (1, "i2", "2024-01-01 12:00:00"),
         (2, "i3", "2024-01-01 10:30:00"),
         (3, "i4", "2024-01-01 09:00:00")],
        "user_id int, imp_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    clicks = spark.createDataFrame(
        [(1, "c1", "2024-01-01 10:05:00"),   # pairs with i1
         (1, "c2", "2024-01-01 12:20:00"),   # outside i2's 10-min bound
         (2, "c3", "2024-01-01 10:29:00"),   # BEFORE i3 — must not pair
         (4, "c4", "2024-01-01 10:00:00")],  # no impression for user 4
        "user_id int, click_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    return imps, clicks


def test_batch_attribution_semantics(spark):
    imps, clicks = _fixture(spark)
    got = interval_join(imps, clicks, "user_id", max_delay="10 minutes")
    pairs = {(r.imp_id, r.click_id) for r in got.collect()}
    assert pairs == {("i1", "c1")}
    # right timestamp surfaced as ts_r next to the left's ts
    assert set(got.columns) == {"user_id", "imp_id", "ts",
                                "click_id", "ts_r"}


def test_left_outer_pads_unmatched(spark):
    imps, clicks = _fixture(spark)
    got = interval_join(imps, clicks, "user_id",
                        max_delay="10 minutes", how="left_outer")
    by_imp = {r.imp_id: r.click_id for r in got.collect()}
    assert by_imp == {"i1": "c1", "i2": None, "i3": None, "i4": None}


def test_full_outer_keeps_right_orphans(spark):
    imps, clicks = _fixture(spark)
    got = interval_join(imps, clicks, "user_id",
                        max_delay="10 minutes", how="full_outer")
    rows = got.collect()
    orphan = [r for r in rows if r.imp_id is None]
    assert {r.click_id for r in orphan} == {"c2", "c3", "c4"}
    # key coalesced from the surviving side
    assert all(r.user_id is not None for r in rows)


def test_stream_matches_batch(spark, tmp_path):
    """The predicate is pure Catalyst, so replaying both sides through
    the file source in micro-batches yields the batch result exactly."""
    imps, clicks = _fixture(spark)
    ipath, cpath = str(tmp_path / "imps"), str(tmp_path / "clicks")
    imps.repartition(2).write.parquet(ipath)
    clicks.repartition(2).write.parquet(cpath)

    si = (spark.readStream
          .schema("user_id int, imp_id string, ts timestamp")
          .option("maxFilesPerTrigger", "1").parquet(ipath))
    sc = (spark.readStream
          .schema("user_id int, click_id string, ts timestamp")
          .option("maxFilesPerTrigger", "1").parquet(cpath))
    joined = interval_join(si, sc, "user_id", max_delay="10 minutes")
    # the streaming plan carries watermarks on both sides (the
    # bounded-state contract this module exists to enforce)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
    out = []
    q = (joined.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .foreachBatch(lambda df, _i: out.extend(df.collect()))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    batch = interval_join(imps, clicks, "user_id",
                          max_delay="10 minutes")
    assert {(r.imp_id, r.click_id) for r in out} == \
        {(r.imp_id, r.click_id) for r in batch.collect()} == \
        {("i1", "c1")}


def test_guards(spark):
    imps, clicks = _fixture(spark)
    with pytest.raises(ValueError, match="how must be"):
        interval_join(imps, clicks, "user_id", how="cross")


def test_multi_key(spark):
    l = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00")],
        "u int, site string, ts string").withColumn(
        "ts", F.to_timestamp("ts"))
    r = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:01:00"),
         (1, "b", "2024-01-01 10:01:00")],
        "u int, site string, ts string").withColumn(
        "ts", F.to_timestamp("ts"))
    got = interval_join(l, r, ["u", "site"], max_delay="5 minutes")
    assert got.count() == 1
