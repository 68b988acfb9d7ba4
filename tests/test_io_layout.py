"""IO layout helpers: partition pruning and LLM-stage repartitioning."""

import os
import tempfile

from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators import io_layout

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark):
    ev = io_layout.events_date_partitioned(load_table(spark, SF, "events"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_by_date")
        io_layout.write_partitioned(ev, path, ["event_date"])
        assert any(f.startswith("event_date=") for f in os.listdir(path))
        back = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-02")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the partition predicate must be a partition filter, not a data filter
        pf = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "event_date" in pf
        assert back.count() > 0


def test_repartition_for_llm_bounds_parallelism(spark, monkeypatch):
    from pyspark.sql import DataFrame

    # the sizing must never launch an eager count() job
    def _boom(self):
        raise AssertionError("repartition_for_llm ran an eager count()")

    monkeypatch.setattr(DataFrame, "count", _boom)

    df = spark.range(1000)
    # Range carries exact rowCount statistics -> plan-stats path
    out = io_layout.repartition_for_llm(df, rows_per_partition=100)
    assert out.rdd.getNumPartitions() == 10
    out2 = io_layout.repartition_for_llm(df, rows_per_partition=10000)
    assert out2.rdd.getNumPartitions() == 1


def test_repartition_for_llm_caller_estimate(spark):
    d = load_table(spark, SF, "documents")
    out = io_layout.repartition_for_llm(d, rows_per_partition=50,
                                        row_estimate=500)
    assert out.rdd.getNumPartitions() == 10
    # without stats or estimate, falls back to input partitioning (>=1)
    assert io_layout.repartition_for_llm(
        d.filter(F.length("text") >= 0), rows_per_partition=50
    ).rdd.getNumPartitions() >= 1
