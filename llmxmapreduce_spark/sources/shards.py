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
- the manifest is derived from the WRITTEN files (one cheap read-back of
  parquet footers — row counts come from metadata, not a data scan), so
  it reflects what is actually on disk, not what the plan intended.

100 TB framing: the write is the only full-data pass; the manifest pass
reads footers only.  Writing ``partition_cols`` (e.g. source/epoch)
gives the loader partition-pruned access to sub-corpora.
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
    per_file = (
        written.select(
            F.input_file_name().alias("file"),
            *( [F.col(token_col)] if token_col in written.columns else [] ))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             *( [F.sum(token_col).alias("n_tokens")]
                if token_col in written.columns else [] ))
        .orderBy("file")
        .collect()
    )
    files = []
    for r in per_file:
        entry = {"file": os.path.relpath(r["file"].replace("file://", ""),
                                         path),
                 "n_rows": r["n_rows"]}
        if "n_tokens" in r.asDict():
            entry["n_tokens"] = r["n_tokens"]
        files.append(entry)
    manifest = {
        "n_files": len(files),
        "n_rows": sum(f["n_rows"] for f in files),
        "rows_per_shard": rows_per_shard,
        "sort_col": sort_col,
        "files": files,
    }
    if token_col in written.columns:
        manifest["n_tokens"] = sum(f.get("n_tokens", 0) for f in files)
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest
