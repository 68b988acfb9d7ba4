"""Streaming/batch parity: the watermarked streaming aggregations must equal
their batch twins on the same (static) events data."""

import tempfile

import pytest

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.streaming import events as se

SF = "/root/testdata/sf0.001"


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("agg_name", ["tumbling", "sliding", "session"])
def test_stream_matches_batch(spark, agg_name):
    stream = se.read_events_stream(spark, SF)
    batch = load_table(spark, SF, "events")
    if agg_name == "tumbling":
        s, b = se.tumbling_counts(stream), se.tumbling_counts(batch.withWatermark("ts", "10 minutes"))
    elif agg_name == "sliding":
        s, b = se.sliding_counts(stream), se.sliding_counts(batch.withWatermark("ts", "10 minutes"))
    else:
        s, b = se.session_counts(stream), se.session_counts(batch.withWatermark("ts", "10 minutes"))
    with tempfile.TemporaryDirectory() as ckpt:
        got = rows_set(se.run_available_now(s, f"t_{agg_name}", ckpt))
    assert got == rows_set(b)
    assert len(got) > 0


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState: per-user state accumulates across
    micro-batches; the final emission per user equals the batch aggregate."""
    batch = load_table(spark, SF, "events").select("user_id", "value", "ts")
    src = str(tmp_path / "src")
    batch.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    emissions = []
    q = (
        se.user_running_totals(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, _id: emissions.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # cross-batch accumulation actually happened: at least one user was
    # updated in more than one micro-batch with growing totals
    per_user = {}
    multi = 0
    for r in emissions:
        prev = per_user.get(r["user_id"])
        if prev is not None:
            assert r["total_events"] > prev["total_events"]
            multi += 1
        if prev is None or r["total_events"] > prev["total_events"]:
            per_user[r["user_id"]] = r
    assert multi > 0, "expected multi-batch state updates"

    expected = {r["user_id"]: r for r in se.user_totals_batch(batch).collect()}
    assert set(per_user) == set(expected)
    for uid, r in per_user.items():
        e = expected[uid]
        assert (r["total_events"], r["total_value_micros"]) == \
            (e["total_events"], e["total_value_micros"]), uid


def test_streaming_dedupe_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a REPLAYED source: the same
    event files land twice, arrive across micro-batches, and exactly
    one copy per event_id survives — matching the batch distinct."""
    batch = load_table(spark, SF, "events") \
        .select("event_id", "user_id", "ts")
    src = str(tmp_path / "replayed")
    batch.repartition(2).write.mode("overwrite").parquet(src)
    batch.repartition(3).write.mode("append").parquet(src)   # the replay

    stream = (
        spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = se.dedupe_events(stream, keys=["event_id"],
                               watermark="1 hour")
    got = se.run_available_now(deduped, "t_dedupe",
                               str(tmp_path / "ckpt"),
                               output_mode="append")
    n_unique = batch.select("event_id").distinct().count()
    assert got.count() == n_unique
    per_key = got.groupBy("event_id").count() \
        .filter("count > 1").count()
    assert per_key == 0
    # exact-mode variant on the same bounded replay
    deduped2 = se.dedupe_events(stream, keys=["event_id"],
                                within_watermark=False)
    got2 = se.run_available_now(deduped2, "t_dedupe2",
                                str(tmp_path / "ckpt2"),
                                output_mode="append")
    assert got2.count() == n_unique
