"""Training-shard sink: size-controlled parquet shards + manifest
(scale extension).

Trainers consume a corpus as a directory of similar-sized shards with a
manifest (sequence counts, token totals, checksums) for loader sharding
and resumability.  This sink turns the packed-sequence output of
``pack_sequences`` (or any DataFrame) into exactly that:

- ``repartitionByRange`` on the sort key → contiguous, similar-sized
  shards (range partitioning gives an approximately equal row split
  without a global sort);
- ``maxRecordsPerFile`` caps file size inside each task, so one skewed
  partition cannot produce an over-sized shard;
- the manifest is derived from the WRITTEN files, so it reflects what is
  actually on disk, not what the plan intended.

100 TB framing: the manifest pass is one PROJECTED read-back of the
written shards — row counts per file plus the token column only (a
single bigint column scan; skip it with ``token_col=None`` if even that
is too much, in which case counts come from footer metadata alone).
The manifest itself is written through the Hadoop FileSystem API, so
``hdfs://``/``s3a://`` destinations work the same as local paths.
Writing ``partition_cols`` (e.g. source/epoch) gives the loader
partition-pruned access to sub-corpora.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    sort_col: str = "seq_id",
    token_col: str | None = "total_tokens",
    partition_cols: list[str] | None = None,
    n_shards: int | None = None,
) -> dict:
    """Write ``df`` as size-controlled parquet shards under ``path`` and
    a ``_manifest.json`` beside them (the underscore keeps it invisible
    to Spark's parquet reader, like ``_SUCCESS``); returns the manifest dict.

    ``n_shards`` defaults from a count (rows / rows_per_shard); pass it
    to skip the count job when the caller already knows the size."""
    if n_shards is None:
        n_shards = max(1, -(-df.count() // rows_per_shard))
    writer = (
        df.repartitionByRange(n_shards, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    with_tokens = token_col is not None and token_col in written.columns
    per_file = (
        written.select(
            F.input_file_name().alias("file"),
            *([F.col(token_col)] if with_tokens else []))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             *([F.sum(token_col).alias("n_tokens")] if with_tokens else []))
        .orderBy("file")
        .collect()
    )
    files = []
    for r in per_file:
        entry = {"file": _rel_file(r["file"], path), "n_rows": r["n_rows"]}
        if with_tokens:
            entry["n_tokens"] = r["n_tokens"]
        files.append(entry)
    manifest = {
        "n_files": len(files),
        "n_rows": sum(f["n_rows"] for f in files),
        "rows_per_shard": rows_per_shard,
        "sort_col": sort_col,
        "files": files,
    }
    if with_tokens:
        manifest["n_tokens"] = sum(f.get("n_tokens", 0) for f in files)
    _write_text(spark, path.rstrip("/") + "/_manifest.json",
                json.dumps(manifest, indent=1))
    return manifest


def _rel_file(file_uri: str, base: str) -> str:
    """input_file_name() returns a percent-encoded URI; decode it and
    strip the base so manifest entries are clean relative paths on any
    filesystem scheme."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(file_uri).path)
    b = unquote(urlparse(base).path) or base
    return os.path.relpath(p, b)


def _write_text(spark, uri: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API —
    works for file://, hdfs://, s3a://, … (a local ``open()`` would fail
    on any remote destination AFTER the expensive data write)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
