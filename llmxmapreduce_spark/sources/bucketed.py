"""Bucketed table layout: co-located joins and aggregations with NO
shuffle at read time.

The 100 TB lever this module packages: a fact table that is joined or
aggregated on the same key in every run (orders x lineitem on orderkey,
postings x queries on term, near-dup pairs on doc_id) should pay its
shuffle ONCE, at write time.  Spark's bucketing (Hive-compatible
``bucketBy`` + ``sortBy`` through ``saveAsTable``) records the hash
layout in the catalog; later reads expose ``outputPartitioning`` to the
planner, so a join of two tables bucketed by the same key into the same
bucket count runs WITHOUT an Exchange on either side — and with
``sortBy`` matching the join key, without a Sort either.  The
scan-to-join pipeline is then a pure merge of co-located files: the
plan the brief's "co-locate joins via bucketing" line asks for, pinned
by tests/test_bucketed.py.

Design notes for real clusters:

- Bucket counts must MATCH (or divide, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
  Exchange to disappear; pick a count sized to target-SF task sizes
  (``rows_per_bucket`` guidance in :func:`bucket_count_for`), not to
  today's executor count.
- One file per bucket per write task is the failure mode to avoid —
  repartition ON the bucket columns first (done by
  :func:`write_bucketed` unless ``repartition_first=False``) so each
  bucket is written by exactly one task and small files don't multiply.
- Bucket pruning: equality predicates on the bucket column skip whole
  buckets at scan time (``spark.sql.sources.bucketing.enabled``).

Used as the persisted-artifact layout for the build-once tables this
engine already produces (``bm25_postings``, IVF inverted lists,
MinHash signatures, the kept-corpus hash state of
``hamming_dedup_incremental`` / ``minhash_dedup_incremental``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def enable_full_bucketed_scan(spark: SparkSession) -> dict[str, str]:
    """Flip the two session confs that unlock the full co-located plan,
    returning the previous values for restore:

    - ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — let
      the planner USE the ``sortBy`` order (one file per bucket, which
      :func:`write_bucketed` guarantees), removing the per-partition
      Sort under a sort-merge join.  Off by default since Spark 3.0
      because listing files to prove one-file-per-bucket costs planning
      time on tables not written this way.
    - ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` —
      stop the planner from silently de-bucketing scans it thinks don't
      benefit; with it on, a filter-only query loses bucket PRUNING
      (measured: ``Bucketed: false (disabled by query planner)`` and a
      full 8/8-bucket read for an equality predicate).
    """
    prev = {}
    for k, v in (
        ("spark.sql.legacy.bucketedTableScan.outputOrdering", "true"),
        ("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"),
    ):
        prev[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    return prev


def bucket_count_for(est_rows: int, rows_per_bucket: int = 4_000_000,
                     min_buckets: int = 8, max_buckets: int = 65_536) -> int:
    """Bucket-count sizing rule: enough buckets that one bucket is one
    healthy task (~a few million narrow rows), clamped to a sane range,
    rounded UP to a power of two so differently-sized tables of the
    same key family can still coalesce-join (counts divide)."""
    if est_rows < 0:
        raise ValueError("est_rows must be non-negative")
    need = max(min_buckets, -(-est_rows // rows_per_bucket))
    n = min_buckets
    while n < need:
        n *= 2
    return min(n, max_buckets)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    repartition_first: bool = True,
) -> None:
    """Write ``df`` as a bucketed (+ sorted) catalog table.

    ``sort_cols`` defaults to ``bucket_cols`` — the layout that removes
    both the Exchange AND the Sort from a later sort-merge join on the
    bucket key.  ``path`` makes it an external table (data at ``path``,
    metadata in the session catalog); without it the warehouse dir is
    used.  ``repartition_first`` shuffles on the bucket columns before
    writing so each bucket is one task's output — without it, every
    write task emits a file per bucket it touches and a 1000-task write
    creates 1000 x num_buckets files (the classic bucketing foot-gun).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else \
        list(bucket_cols)
    if sort_cols is None:
        sort_cols = bucket_cols
    sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    out = df.repartition(num_buckets, *bucket_cols) if repartition_first \
        else df
    writer = out.write.format(fmt).mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer.bucketBy(num_buckets, *bucket_cols).sortBy(*sort_cols) \
        .saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read that preserves the bucket layout (a plain
    ``spark.read.parquet`` of the same files would NOT — the layout
    lives in the table metadata, so co-located plans require the
    catalog path)."""
    return spark.table(name)


def colocated_join(spark: SparkSession, left_name: str, right_name: str,
                   on: list[str] | str, how: str = "inner") -> DataFrame:
    """Join two same-key bucketed tables; with matching bucket counts
    (or divisible + coalesce enabled) the plan carries no Exchange and,
    when both are sorted on the key, no Sort — pinned in
    tests/test_bucketed.py."""
    return read_bucketed(spark, left_name).join(
        read_bucketed(spark, right_name), on, how)
