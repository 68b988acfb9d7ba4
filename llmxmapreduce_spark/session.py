"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same configuration scales to a real
cluster — AQE handles skew/coalescing at runtime, Arrow accelerates every
pandas-UDF boundary (the batched-LLM operators), and shuffle partitions are
sized by environment rather than hardcoded for one machine.

Notable conf choices:

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver-generated
  ``events.parquet`` stores TIMESTAMP(NANOS), which Spark 4 rejects by
  default ([PARQUET_TYPE_ILLEGAL]).  With this flag the column arrives as a
  nanosecond BIGINT and ``load_tables`` converts it to a proper timestamp.
- AQE + skew-join so the same plans survive skewed keys at 100 TB.
- Arrow enabled for every pandas-UDF boundary (the batched LLM operators
  and the tree parsers are Arrow-batched, never row-at-a-time).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "llmxmapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(_DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Also set on an existing session (tests may reuse one created elsewhere).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sparkContext.setLogLevel("WARN")
    return spark
