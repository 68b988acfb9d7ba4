"""Evaluation operators: A8 averaging, A9 claim metrics, V1 scorers
(SURVEY.md §2.5, §5).

Reference: judge.py:329-341 (nonzero averaging), judge.py:360-433 (claim /
citation / reference precision, coverage, density),
compute_scores.py:52-101 (normalized token-F1), judge.py:400-404
(sentence counting).

All metrics are plain aggregations over an exploded (claim × citation)
verdict table — no Python in the hot path; the scorer UDF is the only
pandas boundary (multiset F1 needs a Counter).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llmxmapreduce_spark.functions.text import normalize_answer_py


def avg_nonzero(col: Column) -> Column:
    """A8 (judge.py:329-341): mean with zeros dropped, exact via decimal."""
    nz = col != 0
    return (
        F.sum(F.when(nz, col.cast("decimal(20,6)"))).cast("double")
        / F.count(F.when(nz, F.lit(1)))
    )


def claim_metrics(
    claims: DataFrame,
    id_col: str = "survey_id",
    cited_col: str = "cited_indices",
    verdict_col: str = "nli_verdict",
    total_papers_col: str = "total_papers",
) -> DataFrame:
    """A9 (judge.py:360-433) per survey over EVAL_CLAIMS-shaped rows:

    - claim_precision     — claims with ≥1 supported citation / claims
    - citation_precision  — supported citations / all citations
    - reference_precision — distinct supported refs / total papers
    - reference_coverage  — distinct cited refs / total papers
    - avg_citation_per_claim
    """
    e = claims.select(
        id_col, F.col(total_papers_col),
        F.monotonically_increasing_id().alias("__claim"),
        F.arrays_zip(F.col(cited_col).alias("ref"),
                     F.col(verdict_col).alias("ok")).alias("z"),
    ).select(id_col, total_papers_col, "__claim", F.explode_outer("z").alias("p")) \
     .select(id_col, total_papers_col, "__claim",
             F.col("p.ref").alias("ref"), F.col("p.ok").alias("ok"))

    per_claim = e.groupBy(id_col, total_papers_col, "__claim").agg(
        F.max(F.when(F.col("ok"), 1).otherwise(0)).alias("any_ok"),
        F.count(F.col("ref")).alias("n_cit"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
    )
    supported_refs = (
        e.filter(F.col("ok")).select(id_col, "ref").distinct()
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_supported_refs"))
    )
    cited_refs = (
        e.filter(F.col("ref").isNotNull()).select(id_col, "ref").distinct()
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_cited_refs"))
    )
    agg = per_claim.groupBy(id_col, total_papers_col).agg(
        F.count(F.lit(1)).alias("n_claims"),
        F.sum("any_ok").alias("n_supported_claims"),
        F.sum("n_cit").alias("n_citations"),
        F.sum("n_ok").alias("n_supported_citations"),
    )
    return (
        agg.join(supported_refs, id_col, "left").join(cited_refs, id_col, "left")
        .select(
            id_col,
            (F.col("n_supported_claims") / F.col("n_claims")).alias("claim_precision"),
            (F.col("n_supported_citations") / F.col("n_citations")).alias("citation_precision"),
            (F.coalesce("n_supported_refs", F.lit(0)) / F.col(total_papers_col)).alias("reference_precision"),
            (F.coalesce("n_cited_refs", F.lit(0)) / F.col(total_papers_col)).alias("reference_coverage"),
            (F.col("n_citations") / F.col("n_claims")).alias("avg_citation_per_claim"),
            F.col("n_claims"),
        )
    )


def dedup_claims(claims: DataFrame, claim_col: str = "claim",
                 id_col: str = "claim_id", near_threshold: float = 0.7,
                 ) -> DataFrame:
    """A10 fact dedup, deterministic replacement for the reference's LLM
    dedup (atomic_facts.py:36-144): exact dedup on the normalized claim,
    then MinHash-LSH near-dup removal (greedy: within each detected pair the
    higher id drops — linear, no clustering pass).

    The reference's group-pairwise LLM comparison is O(n²) LLM calls; this
    is one hash shuffle + a bucketed join, the 100 TB-viable contract.
    """
    from llmxmapreduce_spark.operators import dedup as D

    t = F.col(claim_col)
    exact = D.exact_dedup(claims, text_col=claim_col, id_col=id_col)
    pairs = D.minhash_dedup_pairs(
        exact.select(F.col(id_col).alias("doc_id"), t.alias("text")),
        threshold=near_threshold,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact.join(losers, id_col, "left_anti")


def count_sentences(text: Column) -> Column:
    """judge.py:400-404: split on ``[.!?\\n]+(\\s|\\n|$)``, count non-empty."""
    return F.size(F.filter(
        F.split(F.trim(text), r"[.!?\n]+(\s|\n|$)"),
        lambda x: x != F.lit(""),
    )).cast("long")


def qa_f1_py(prediction: str, ground_truth: str) -> float:
    """compute_scores.py:52-101: normalized token multiset F1."""
    pred = normalize_answer_py(prediction).split()
    gt = normalize_answer_py(ground_truth).split()
    common = Counter(pred) & Counter(gt)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred)
    recall = num_same / len(gt)
    return 2 * precision * recall / (precision + recall)


def qa_f1(df: DataFrame, pred_col: str = "prediction",
          gt_col: str = "ground_truth", out_col: str = "f1") -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def f1_udf(pred: pd.Series, gt: pd.Series) -> pd.Series:
        return pd.Series([qa_f1_py(p or "", g or "") for p, g in zip(pred, gt)])

    return df.withColumn(out_col, f1_udf(F.col(pred_col), F.col(gt_col)))


def containment_score(pred: Column, ground_truth: Column) -> Column:
    """compute_scores.py:143-163 (kv/passkey/number tasks): 1.0 when the
    ground truth string appears in the prediction."""
    return F.when(pred.contains(ground_truth), 1.0).otherwise(0.0)


_CAPITAL_RE = r"[A-Z]"


def last_capital_score(pred: Column, ground_truth: Column) -> Column:
    """compute_scores.py:185-213 (code_debug): last capital letter of the
    prediction must equal the ground-truth option letter."""
    caps = F.regexp_extract_all(pred, F.lit(_CAPITAL_RE), 0)
    last_cap = F.when(F.size(caps) > 0, F.element_at(caps, -1))
    return F.when(last_cap == ground_truth, 1.0).otherwise(0.0)
