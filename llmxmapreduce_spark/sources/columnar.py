"""ORC source + sink — the second columnar interchange format next to
parquet (Spark bundles orc-core; no extra packages).

Why it exists: a 100 TB corpus rarely lives in one format — Hive/Trino
estates hand over ORC, and a migration engine that can only read parquet
forces a full pre-conversion pass.  Spark's ORC reader has the same
pushdown surface as parquet (predicate pushdown, column pruning,
row-group stats via ``orc.bloom.filter`` / min-max), so the scan-side
guarantees the rest of the repo leans on (PushedFilters / ReadSchema
plan pins) hold here too.

The writer mirrors ``sources/compaction.py``'s layout discipline:
optional ``sort_col`` routes through ``repartitionByRange`` +
``sortWithinPartitions`` so ORC stripe min/max statistics are tight and
prune (the same reasoning as parquet row groups); plain writes just
control file count.  zstd compression by default (the modern
size/speed point; ORC's own default is still zlib).

Avro is NOT provided: pyspark 4.1 ships avro-* dependency jars but not
the ``spark-avro`` DataSource module, so ``format("avro")`` would fail
at plan time in this container — a seam would be dishonest.  The
jsonl/WARC/WebDataset/parquet/ORC matrix covers the row-ish and
columnar interchange shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_orc", "read_orc"]


def write_orc(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    sort_col: str | None = None,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as ORC.  ``sort_col`` clusters rows so stripe
    min/max statistics prune on that column (compaction.py's rule);
    ``n_files`` bounds output file count (one task writes one file)."""
    out = df
    if sort_col is not None:
        out = (out.repartitionByRange(n_files or df.rdd.getNumPartitions(),
                                      sort_col)
               .sortWithinPartitions(sort_col))
    elif n_files is not None:
        out = out.repartition(n_files)
    out.write.mode("overwrite").option("compression", compression) \
        .orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Plain ORC scan — predicate pushdown and column pruning apply
    exactly as for parquet (plan-pinned in tests/test_columnar.py)."""
    return spark.read.orc(path)
