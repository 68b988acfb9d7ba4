"""Small-file compaction: the maintenance op every long-lived dataset
accretes toward.

Streaming ingest writes one directory per epoch
(``streaming/ingest.py``), partitioned sinks write one file per task
per partition value, and retries/speculation leave stragglers — after
months, a 100 TB dataset is millions of KB-sized files.  Small files
tax everything downstream: listing time, scheduler overhead (one task
minimum per file), parquet footer overhead per scan, and row-group
stats too fragmented to prune.  ``compact_parquet`` rewrites a dataset
into ~target-sized files, optionally range-sorted so row-group min/max
stats become tight again (the ``zorder_sort`` principle applied to
plain sort keys).

Safety contract: compaction NEVER rewrites in place — it writes to a
new directory and reports byte-identical row counts before/after, so
the caller swaps paths only after the report checks out (the
blue/green layout swap; an in-place rewrite that dies midway loses
data, which is why this module refuses ``out_path == in_path``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_file_stats(spark: SparkSession, path: str,
                       small_file_mb: float = 16.0) -> dict:
    """File-level layout stats via the Hadoop FileSystem API (no data
    read): n_files, total_bytes, avg/min/max file bytes, and how many
    files fall under the ``small_file_mb`` threshold."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = []
    if not fs.exists(p):
        return {"n_files": 0, "total_bytes": 0, "avg_bytes": 0,
                "min_bytes": 0, "max_bytes": 0, "n_small_files": 0}
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            sizes.append(st.getLen())
    small = int(small_file_mb * 1024 * 1024)
    return {
        "n_files": len(sizes),
        "total_bytes": int(sum(sizes)),
        "avg_bytes": int(sum(sizes) / len(sizes)) if sizes else 0,
        "min_bytes": int(min(sizes)) if sizes else 0,
        "max_bytes": int(max(sizes)) if sizes else 0,
        "n_small_files": sum(1 for s in sizes if s < small),
    }


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 256,
    sort_col: str | None = None,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``in_path`` parquet into ~``target_file_mb`` files at
    ``out_path``; returns {"before": stats, "after": stats,
    "rows": n} with a row-count equality check built in (raises on
    mismatch — a compaction that changes the row count is corruption,
    not compaction).

    ``sort_col`` switches from plain ``repartition`` (even sizes, no
    ordering guarantee) to ``repartitionByRange`` +
    ``sortWithinPartitions`` — contiguous key ranges per file, so
    row-group min/max prune again after the rewrite.  ``partition_cols``
    re-partitions the directory layout (e.g. collapse epoch=* ingest
    dirs into source=* consumption dirs).
    """
    if os.path.abspath(out_path) == os.path.abspath(in_path):
        raise ValueError(
            "compact_parquet refuses to rewrite in place — write to a "
            "new path and swap after the report checks out")
    before = dataset_file_stats(spark, in_path)
    if before["n_files"] == 0:
        raise ValueError(f"no parquet files under {in_path}")
    n_out = max(1, -(-before["total_bytes"]
                     // (target_file_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(in_path)
    n_rows = df.count()
    if sort_col is not None:
        out = df.repartitionByRange(n_out, F.col(sort_col)) \
            .sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_out)
    writer = out.write.mode("error")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)
    after = dataset_file_stats(spark, out_path)
    n_rows_after = spark.read.parquet(out_path).count()
    if n_rows_after != n_rows:
        raise RuntimeError(
            f"compaction row-count mismatch: {n_rows} in, "
            f"{n_rows_after} out — output at {out_path} is suspect")
    return {"before": before, "after": after, "rows": int(n_rows)}
