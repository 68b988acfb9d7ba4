"""Small-file compaction (sources/compaction.py): fragmented input →
few target-sized files with identical data, range-sorted variant makes
per-file key ranges disjoint (stats prune again), layout stats, and
the safety contract (no in-place rewrite, row-count gate)."""

import os

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.sources.compaction import (compact_parquet,
                                                    dataset_file_stats)


@pytest.fixture()
def fragmented(spark, tmp_path):
    path = str(tmp_path / "frag")
    # md5 column keeps parquet from compressing the set below ~5 MB, so
    # target_file_mb=1 genuinely forces a multi-file layout
    df = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"),
        F.md5(F.col("id").cast("string")).alias("pad"))
    df.repartition(40).write.parquet(path)
    return path, df


def test_stats_and_compaction_roundtrip(spark, fragmented, tmp_path):
    path, df = fragmented
    before = dataset_file_stats(spark, path)
    assert before["n_files"] == 40
    assert before["n_small_files"] == 40          # all tiny
    out = str(tmp_path / "compact")
    report = compact_parquet(spark, path, out, target_file_mb=256)
    assert report["rows"] == 200_000
    assert report["after"]["n_files"] == 1        # fits one target file
    assert report["after"]["total_bytes"] > 0
    back = spark.read.parquet(out)
    assert back.count() == 200_000
    assert back.agg(F.sum("k")).collect()[0][0] == \
        df.agg(F.sum("k")).collect()[0][0]


def test_sorted_compaction_disjoint_ranges(spark, fragmented, tmp_path):
    path, _ = fragmented
    out = str(tmp_path / "sorted")
    # force multiple output files by lying about the target size
    report = compact_parquet(spark, path, out, target_file_mb=1,
                             sort_col="k")
    files = [os.path.join(out, f) for f in os.listdir(out)
             if f.endswith(".parquet")]
    assert len(files) == report["after"]["n_files"] >= 2
    spans = []
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("k"), F.max("k")).collect()[0]
        spans.append((row[0], row[1]))
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2                           # disjoint → prunable


def test_safety_contract(spark, fragmented, tmp_path):
    path, _ = fragmented
    with pytest.raises(ValueError, match="in place"):
        compact_parquet(spark, path, path)
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(spark, str(tmp_path / "empty_nothing"),
                        str(tmp_path / "x"))
