"""BM25 ranked retrieval (Okapi BM25, Lucene-positive idf variant) as
pure DataFrame ops — the lexical-retrieval leg of the training-data
curation surface.

Why a data engine needs this: retrieval-based corpus work is standard in
LLM data pipelines — "find the training documents most similar to an
eval document" (decontamination by retrieval, the alternative GPT-3
appendix C considered to n-gram overlap), "select documents near a
trusted query set" (retrieval-flavoured data selection, cf. DSIR's
hashed-feature cousin in operators/dsir.py), and plain corpus search /
QA-pair mining.  The reference engine has no ranked-retrieval operator;
this extends it the same way dedup.py / decontamination.py do.

Scoring (per query q, document d)::

    score(q, d) = Σ_{t ∈ distinct(q)}  idf(t) · tf_td·(k1+1)
                                        / (tf_td + k1·(1 − b + b·dl_d/avgdl))
    idf(t)      = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))      # always ≥ 0

with N / avgdl computed over documents that have ≥ 1 token (empty docs
can never match and would only dilute avgdl).

Determinism contract (cross-engine, run-to-run): per-(query, doc, term)
contributions are quantized to 1e-6 micro-units (``floor(c·1e6)`` →
BIGINT) BEFORE the per-document sum, so the aggregation is an exact
integer sum — reduction-order independent, unlike a float sum whose
value depends on partitioning.  The reported ``score_micro`` is that
exact integer; ranking ties break by ascending doc id.  All float ops
feeding the quantization (division, multiplication, the dl/avgdl ratio)
are IEEE correctly-rounded and therefore identical in Spark, DuckDB and
numpy; only ``ln`` is libm-dependent (≤ 1 ulp), which moves a
contribution across a 1e-6 grid boundary with probability ~1e-9 per
matched pair — accepted.

Scale design (100 TB corpus):
- ``bm25_postings`` is ONE projected scan → explode → groupBy
  (doc_id, term): the shuffle carries (id, term, int) rows, never
  document text.  The postings table is a reusable artifact — build it
  once, write it partitioned/bucketed by term, and every query batch
  after that is join-only.
- ``bm25_topk`` broadcasts the query-term side (queries are small by
  definition of the use-cases above) so scoring is a map-side join over
  postings followed by one (query, doc) aggregation keyed by 16 bytes.
- Stopword skew is THE hot-key hazard: a term in half the corpus makes
  one join key carry half the postings.  ``max_df_ratio`` drops terms
  with df > ratio·N from scoring (their idf ≈ 0 contributes nothing to
  ranking anyway — this is what search engines' stop lists are for);
  at scale set it ≤ 0.1.
- Per-query top-k is a window over the (query, doc) score table —
  partitioned by query id, bounded by that query's matched docs.  For
  a huge matched set per query, lower ``max_df_ratio`` first; rare
  terms bound the fan-out naturally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.text_stats import lower_ws_tokens

__all__ = ["bm25_postings", "bm25_idf", "bm25_topk"]


def _nonempty_tokens(text_col: str) -> Column:
    return F.filter(lower_ws_tokens(F.col(text_col)), lambda w: w != "")


def bm25_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(doc_id, term, tf, dl)`` — one row per (document, distinct
    term); ``dl`` is the document token count (repeated per term so the
    scorer needs no second join back to a doc-length table).  One
    shuffle, keyed by (id, term); carries no text beyond the term."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        _nonempty_tokens(text_col).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    return (
        toks.select(
            "doc_id",
            F.size("__toks").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", "term", "tf", "dl")
    )


def bm25_idf(postings: DataFrame) -> DataFrame:
    """→ ``(term, df_t, idf)`` from a postings table.  |vocabulary|
    rows — small relative to the corpus; persist it next to the
    postings artifact."""
    n_docs = postings.select("doc_id").distinct().count()
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t")
    ).withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
        ),
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` BM25 matches per query → ``(query_id, doc_id, rank,
    score_micro)``; ``score_micro`` is the exact integer sum of
    1e-6-quantized per-term contributions (see module determinism
    contract).  Pass a prebuilt ``postings`` (from
    :func:`bm25_postings` over the same corpus) to skip the build —
    the 100 TB pattern is build-once, query-many.

    Self-matches are kept: when the query set IS a document slice
    (decontamination by retrieval), rank 1 being the document itself is
    the expected signal, and callers filter it trivially."""
    if postings is None:
        postings = bm25_postings(corpus, text_col, id_col)

    # N and avgdl over token-bearing docs.  Two scalar aggregates on the
    # (id, dl) cut of the postings — bounded collect (1 row).
    docs = postings.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("double").alias("tot"),
    ).collect()[0]
    n_docs = int(row["n"])
    if n_docs == 0:
        raise ValueError("bm25_topk: corpus has no token-bearing documents")
    avgdl = float(row["tot"]) / n_docs

    idf = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    if max_df_ratio < 1.0:
        # stopword cut: kills the hot join keys AND the near-zero-idf
        # busywork in one move (see module scale notes)
        idf = idf.filter(F.col("df_t") <= F.lit(float(max_df_ratio) * n_docs))
    idf = idf.withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
        ),
    )

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(_nonempty_tokens(query_text_col))).alias(
            "term"
        ),
    )

    # query side is the small one — broadcast both it and the |V|-sized
    # idf slice it touches; postings never move off their partitions
    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .select(
            "query_id",
            "doc_id",
            F.floor(
                F.col("idf")
                * (
                    F.col("tf")
                    * F.lit(float(k1) + 1.0)
                    / (
                        F.col("tf")
                        + F.lit(float(k1))
                        * (
                            F.lit(1.0 - float(b))
                            + F.lit(float(b)) * F.col("dl") / F.lit(avgdl)
                        )
                    )
                )
                * F.lit(1_000_000.0)
            ).cast("long").alias("c_micro"),
        )
    )
    scores = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_micro").alias("score_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_micro")
    )
