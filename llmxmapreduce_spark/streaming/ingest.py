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

Exactly-once admission WITHOUT an ACID dependency: ``foreachBatch``
replays an unacknowledged micro-batch with the SAME epoch id, so the
kept corpus is laid out epoch-keyed — each batch's survivors land at
``kept/epoch=<epoch_id>/`` with ``mode("overwrite")`` scoped to that one
directory.  A crash after the write but before the checkpoint commit
replays the batch, recomputes the same survivors (the corpus read
EXCLUDES the in-flight epoch's directory, so a partial prior write can
never dedup the batch against itself), and overwrites the directory —
replay is a no-op.  This is the batch-id-as-transaction-id pattern the
Structured Streaming guide describes for idempotent foreachBatch sinks;
Delta/Iceberg buy the same property via txn ids, not more.  Restart-
replay gated by tests/test_streaming_ingest.py (commit marker deleted →
batch replayed → no duplicate admission).

Correctness gate: stream ≡ the same shards applied sequentially in batch
mode (tests/test_streaming_ingest.py), the same stream-equals-batch
contract as streaming/events.py.
"""

from __future__ import annotations

import os
from typing import Callable

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


def _epoch_dirs(spark, kept_path: str) -> list[str]:
    """Committed epoch directories under the kept corpus, via the Hadoop
    FileSystem API — an explicit existence/listing check, not a parse of
    one Spark version's AnalysisException text (the old PATH_NOT_FOUND
    string-match broke on versions that phrase the error differently,
    and a real read failure must never silently bootstrap-to-empty)."""
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(kept_path)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(base):
        return []
    glob = jvm.org.apache.hadoop.fs.Path(
        os.path.join(kept_path, "epoch=*"))
    stats = fs.globStatus(glob)
    if stats is None:
        return []
    return sorted(str(s.getPath()) for s in stats if s.isDirectory())


def read_kept(spark, state_dir: str, schema) -> DataFrame:
    """The admitted corpus written by :func:`run_incremental_neardup_ingest`
    — the union of its epoch directories (empty DataFrame before the
    first admission).  Reading the epoch dirs as explicit roots keeps the
    caller's schema exact; reading ``{state_dir}/kept`` directly also
    works (partition discovery adds an ``epoch`` column)."""
    paths = _epoch_dirs(spark, os.path.join(state_dir, "kept"))
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def _guard_fresh_checkpoint(spark, kept_path: str,
                            checkpoint_dir: str, what: str) -> None:
    """Refuse an EXISTING kept corpus with a FRESH checkpoint: epoch ids
    would restart at 0 and the overwrite-scoped sink would silently
    destroy prior admissions.  state_dir and checkpoint_dir are a unit."""
    if _epoch_dirs(spark, kept_path):
        jvm = spark._jvm
        off = jvm.org.apache.hadoop.fs.Path(
            os.path.join(checkpoint_dir, "offsets"))
        fs = off.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(off):
            raise ValueError(
                f"{what}: {kept_path} already holds admitted epochs but "
                f"checkpoint {checkpoint_dir} has no progress — a fresh "
                f"checkpoint would restart epoch ids at 0 and overwrite "
                f"prior admissions. Reuse the original checkpoint_dir, "
                f"or point state_dir at a new location.")


def _prior_epochs(spark, kept_path: str, schema, epoch_id: int) -> DataFrame:
    """Kept corpus = every epoch EXCEPT the in-flight one: on replay a
    partial prior write of THIS epoch would otherwise dedup the batch
    against itself and under-admit.  Exclusion matches on the path
    SUFFIX (_epoch_dirs returns fully-qualified file:/ URIs)."""
    prior = [p for p in _epoch_dirs(spark, kept_path)
             if not p.endswith(f"/epoch={epoch_id}")]
    if prior:
        return spark.read.schema(schema).parquet(*prior)
    return spark.createDataFrame([], schema)


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
    vs kept-corpus ``minhash_dedup_incremental`` → survivors written to
    ``{state_dir}/kept/epoch=<epoch_id>/`` (overwrite-scoped to that
    directory — the idempotent-replay contract in the module docstring).
    ``on_batch(epoch_id, batch_df, survivors_df)`` is a
    test/observability hook called after each write.

    Returns after the stream drains; use :func:`read_kept` for the
    admitted corpus.  ``dedup_kwargs`` pass through to
    :func:`llmxmapreduce_spark.operators.dedup.minhash_dedup_incremental`
    (threshold, verify mode, band layout …).
    """
    from llmxmapreduce_spark.operators.dedup import minhash_dedup_incremental

    kept_path = os.path.join(state_dir, "kept")
    spark = stream.sparkSession
    schema = stream.schema

    _guard_fresh_checkpoint(spark, kept_path, checkpoint_dir,
                            "run_incremental_neardup_ingest")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if pre_filter is not None:
            batch_df = pre_filter(batch_df)
        batch_df = batch_df.localCheckpoint(eager=True)  # used 3×: sig/bucket/verify
        own = os.path.join(kept_path, f"epoch={epoch_id}")
        corpus = _prior_epochs(spark, kept_path, schema, epoch_id)
        survivors = minhash_dedup_incremental(batch_df, corpus,
                                              **dedup_kwargs)
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(own)
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


def run_incremental_media_ingest(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    decoder,
    id_col: str = "asset_id",
    pre_filter: Callable[[DataFrame], DataFrame] | None = None,
    on_batch: Callable[[int, DataFrame, DataFrame], None] | None = None,
    admit_undecodable: bool = False,
    bands: int = 4,
    max_distance: int = 3,
    max_bucket: int | None = 100_000,
):
    """The media mirror of :func:`run_incremental_neardup_ingest`:
    per micro-batch, perceptually hash the incoming assets
    (``media_dedup.image_hashes`` with the injectable ``decoder``), drop
    anything within Hamming ``max_distance`` of the kept corpus or of a
    surviving shard-mate (``hamming_dedup_incremental``), and admit the
    rest.

    One deliberate improvement over the text path: survivors are written
    WITH their ``dhash`` column, so the hash is the PERSISTED admission
    state — each asset is decoded exactly once, ever, and later batches
    join against 8-byte hashes read straight from the kept corpus (the
    text path re-derives corpus signatures per batch and documents the
    tradeoff).  At 100 TB of media that difference is the whole decode
    bill.

    ``admit_undecodable=False`` (default) quarantines decode failures —
    they are dropped from admission.  ``on_batch(epoch_id, hashed_batch,
    survivors)`` receives the FULL hashed batch including failures
    (``decode_ok``/``dhash`` columns), so it is the dead-letter hook:
    quarantined rows are reported there, never silently discarded.
    With ``admit_undecodable=True`` failures are admitted with a null
    hash and never participate in dedup.

    Same exactly-once epoch-directory contract, pairing guard, and
    ``read_kept`` (pass the stream schema + ``dhash long``) as the text
    ingest.
    """
    from pyspark.sql import types as T

    from llmxmapreduce_spark.operators import media_dedup

    kept_path = os.path.join(state_dir, "kept")
    spark = stream.sparkSession
    # copy the field list: StructType.add mutates in place, and
    # DataFrame.schema is cached — .add on it would graft a phantom
    # dhash column onto the caller's stream
    out_schema = T.StructType(list(stream.schema.fields)).add("dhash", "long")

    _guard_fresh_checkpoint(spark, kept_path, checkpoint_dir,
                            "run_incremental_media_ingest")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if pre_filter is not None:
            batch_df = pre_filter(batch_df)
        # checkpoint before the double use (hash scan + join side) so the
        # source files are read once per batch, as in the text path
        batch_df = batch_df.localCheckpoint(eager=True)
        hashed = media_dedup.image_hashes(
            batch_df, decoder, id_col=id_col, with_ahash=False) \
            .select(F.col("asset_id").alias(id_col), "dhash", "decode_ok")
        full = batch_df.join(hashed, id_col)
        batch2 = full if admit_undecodable else \
            full.filter(F.col("decode_ok"))
        batch2 = batch2.drop("decode_ok").localCheckpoint(eager=True)
        own = os.path.join(kept_path, f"epoch={epoch_id}")
        corpus = _prior_epochs(spark, kept_path, out_schema, epoch_id)
        survivors = media_dedup.hamming_dedup_incremental(
            batch2, batch2.select(id_col, "dhash"),
            corpus.select(id_col, "dhash"), id_col=id_col,
            bands=bands, max_distance=max_distance, max_bucket=max_bucket)
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(own)
        if on_batch is not None:
            on_batch(epoch_id, full, survivors)

    q = (
        stream.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
