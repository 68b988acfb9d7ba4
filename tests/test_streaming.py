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
