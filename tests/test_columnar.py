"""ORC source/sink (sources/columnar.py): roundtrip fidelity, sorted
stripe layout, and the scan-side pushdown/pruning guarantees the repo
pins for parquet."""

import os

from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.sources.columnar import read_orc, write_orc

SF = "/root/testdata/sf0.001"


def test_roundtrip_exact(spark, tmp_path):
    docs = load_table(spark, SF, "documents") \
        .select("doc_id", "source", "lang", "n_chars", "text")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, n_files=3)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    files = [f for f in os.listdir(path) if f.endswith(".orc")]
    assert len(files) == 3


def test_sorted_write_disjoint_ranges(spark, tmp_path):
    """sort_col routes through repartitionByRange + sortWithinPartitions:
    per-file doc_id ranges are disjoint, so stripe min/max stats prune."""
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "sorted_orc")
    write_orc(docs, path, n_files=4, sort_col="doc_id")
    back = read_orc(spark, path).withColumn(
        "f", F.element_at(F.split(F.input_file_name(), "/"), -1))
    spans = back.groupBy("f").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")) \
        .orderBy("lo").collect()
    assert len(spans) >= 2
    for prev, cur in zip(spans, spans[1:]):
        assert prev.hi < cur.lo, spans


def test_pushdown_and_pruning(spark, tmp_path):
    """The plan-pin the module's docstring promises: a filtered
    2-column projection reaches the ORC scan as PushedFilters + a
    pruned ReadSchema."""
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "pd_orc")
    write_orc(docs.select("doc_id", "source", "lang", "n_chars", "text"),
              path)
    q = read_orc(spark, path).filter(F.col("n_chars") > 500) \
        .select("doc_id", "n_chars")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(n_chars" in plan
    assert "text" not in plan.split("ReadSchema:")[1].splitlines()[0]
