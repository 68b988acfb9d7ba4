"""Streaming document ingestion: the dedup/quality stack as a
Structured Streaming pipeline (scale extension).

A 100 TB training corpus is not built in one batch job — it ACCRETES:
crawl shards arrive continuously and each must be (a) quality-gated,
(b) exact-deduped against recent arrivals, (c) near-deduped against the
ENTIRE kept corpus before admission.  This module maps those three steps
onto Spark's streaming primitives:

- quality gating is stateless (`quality_filters` is pure projection), so
  it composes into any stream for free;
- exact dedup is ``dropDuplicatesWithinWatermark`` on a content hash —
  Spark's state store keeps only hashes inside the watermark horizon, so
  state is bounded by arrival-rate × watermark, never corpus size;
- near-dedup is the ``foreachBatch`` + ``minhash_dedup_incremental``
  pattern: each micro-batch is a shard joined (bucket equi-join) against
  the kept corpus, with survivors appended to the corpus — per-batch cost
  scales with the BATCH, never corpus² (dedup.py:330 has the full
  scale argument).

Exactly-once note: the kept-corpus append inside ``foreachBatch`` is
at-least-once under restarts (Spark replays an unacknowledged batch; a
plain parquet append would double-write it).  Production deployments put
an ACID table format (Delta/Iceberg/Hudi — txn-id = batch epoch) or an
idempotent MERGE behind this; the harness documents the seam and tests
the single-run semantics.

Correctness gate: stream ≡ the same shards applied sequentially in batch
mode (tests/test_streaming_ingest.py), the same stream-equals-batch
contract as streaming/events.py.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Exact content dedup on a stream: first arrival of each text wins;
    re-arrivals inside the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` (not ``dropDuplicates``) is the
    scale-critical choice: plain streaming dropDuplicates keeps EVERY key
    seen forever (state grows with the corpus); the watermarked variant
    evicts hashes older than the horizon, bounding state by
    arrival-rate × watermark.  Duplicates separated by more than the
    horizon are the near-dedup stage's job (it checks the full corpus).

    The state key is the 128-bit hash, never the text — same rule as the
    batch ``exact_dedup``: document bytes never enter the state store.
    """
    return (
        stream.withColumn(hash_col, F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([hash_col])
        .drop(hash_col)
    )


def run_incremental_neardup_ingest(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    pre_filter: Callable[[DataFrame], DataFrame] | None = None,
    on_batch: Callable[[int, DataFrame, DataFrame], None] | None = None,
    **dedup_kwargs,
):
    """Run the accreting near-dedup ingest to completion over the
    currently available stream input (Trigger.AvailableNow).

    Per micro-batch: ``pre_filter`` (e.g. a ``quality_filter``) → shard
    vs kept-corpus ``minhash_dedup_incremental`` → survivors appended to
    the kept corpus at ``{state_dir}/kept``.  ``on_batch(epoch_id,
    batch_df, survivors_df)`` is a test/observability hook called after
    each append.

    Returns after the stream drains; read ``{state_dir}/kept`` for the
    admitted corpus.  ``dedup_kwargs`` pass through to
    :func:`llmxmapreduce_spark.operators.dedup.minhash_dedup_incremental`
    (threshold, verify mode, band layout …).
    """
    from llmxmapreduce_spark.operators.dedup import minhash_dedup_incremental

    kept_path = os.path.join(state_dir, "kept")
    spark = stream.sparkSession
    schema = stream.schema

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if pre_filter is not None:
            batch_df = pre_filter(batch_df)
        batch_df = batch_df.localCheckpoint(eager=True)  # used 3×: sig/bucket/verify
        try:
            corpus = spark.read.schema(schema).parquet(kept_path)
        except AnalysisException as e:
            # ONLY "no kept corpus yet" may fall back to empty — a real
            # read failure (permissions, corrupt footer) must not silently
            # dedup against nothing and re-admit duplicates forever
            if "PATH_NOT_FOUND" not in str(e):
                raise
            corpus = spark.createDataFrame([], schema)
        survivors = minhash_dedup_incremental(batch_df, corpus,
                                              **dedup_kwargs)
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(kept_path)
        if on_batch is not None:
            on_batch(epoch_id, batch_df, survivors)

    q = (
        stream.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
