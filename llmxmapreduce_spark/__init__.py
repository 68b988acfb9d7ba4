"""llmxmapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of thunlp/LLMxMapReduce.

The reference (see /root/repo/SURVEY.md) is an LLM-driven dataflow system for
long-text processing: divide -> map with an LLM -> hierarchically combine ->
reduce (V1 long-doc QA), plus a multi-stage survey-generation pipeline
(V2/V3).  This package re-expresses every operator Spark-first:

- typed DataFrame schemas for every table (``schemas``)
- pure-SQL/column text operators (``functions``)
- one generic batched-LLM ``mapInPandas`` operator with retry + dead-letter
  semantics (``operators.llm_op``)
- bounded driver loops for the iterative stages (collapse, convolution,
  self-refine, content assembly)
- deterministic seeding everywhere the reference shuffles
- scale extensions: dedup (exact/MinHash/SimHash/cosine/SemDeDup/span +
  connected components), similarity search (LSH + IVF), text analysis
  (quality rulesets, PII, repetition, normalization, decontamination),
  data mixing + sequence packing + shard sink, multimodal columns,
  streaming windows + streaming ingestion dedup, and the end-to-end
  corpus-prep pipeline (``pipelines.corpus_prep``)
"""

__version__ = "0.1.0"

from llmxmapreduce_spark.session import get_spark  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir, name):
    """Load one test table; normalizes the nanosecond ``events.ts`` column.

    ``events.parquet`` stores TIMESTAMP(NANOS).  Depending on the Spark
    build, the column arrives either as a BIGINT of nanoseconds (when
    ``spark.sql.legacy.parquet.nanosAsLong`` applies) or as TIMESTAMP_NTZ
    (Spark 4 native nanos read, truncated to micros).  Both are normalized
    to a session-tz TIMESTAMP so downstream ``unix_micros``/``window`` calls
    behave identically; the session timezone is pinned to UTC (session.py)
    so the NTZ→LTZ cast is epoch-preserving.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type in ("timestamp_ntz", "timestamp"):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            raise ValueError(
                f"unexpected dtype {ts_type!r} for events.ts — expected "
                "bigint (nanosAsLong), timestamp_ntz, or timestamp")
    return df


def load_tables(spark, sf_dir):
    """Load the standard test tables from ``sf_dir`` as a dict of DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark, sf_dir):
    """Register every table in ``sf_dir`` as a temp view; returns the dict."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
