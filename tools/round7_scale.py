#!/usr/bin/env python
"""Round-7 scale measurements (run at scale_data/sf1 or sf5):

1. ivf_topk_join recall vs the exact scorer (the large-query IVF path's
   first measured recall record — its claims were design-only).
2. Sequence-packing padding waste: whitespace vs BPE-ish token budgets
   (the pluggable-tokenizer delta the packing change exists to expose).
3. decontaminate fast vs bloom wall time (the unified poly-hash probe).
4. write_training_shards manifest pass with and without the token column
   (the token_col=None read-back cost note).

Prints one JSON line per measurement; results are copied into
BASELINE.md by hand (they are records, not gates).

Usage: python tools/round7_scale.py <sf_dir> [step ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from llmxmapreduce_spark import load_table  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402


def t(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def ivf_join_recall(spark, sf):
    from llmxmapreduce_spark.operators import ivf, similarity

    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter("vec_id % 20 = 0")
    n_q = queries.count()

    exact, t_exact = t(lambda: {
        (r["qid"], r["vec_id"])
        for r in similarity.cosine_topk_np(emb, queries, k=5).collect()})
    out = {"measure": "ivf_topk_join_recall", "sf_dir": sf,
           "n_queries": n_q, "k": 5, "n_cells": 64,
           "wall_exact_s": t_exact, "sweep": {}}
    cents = ivf.fit_centroids(emb, n_cells=64)
    for nprobe in (4, 8, 16, 32):
        approx, t_ivf = t(lambda: {
            (r["qid"], r["vec_id"])
            for r in ivf.ivf_topk_join(emb, queries, centroids=cents, k=5,
                                       nprobe=nprobe).collect()})
        # denominator = exact result size (ties at k keep both at k)
        rec = {"recall_at_5": round(len(exact & approx)
                                    / max(len(exact), 1), 4),
               "wall_join_s": t_ivf}
        if nprobe == 8:   # path agreement at one setting is enough
            small, t_small = t(lambda: {
                (r["qid"], r["vec_id"])
                for r in ivf.ivf_topk(emb, queries, centroids=cents, k=5,
                                      nprobe=nprobe).collect()})
            rec["join_vs_small_path_agree"] = round(
                len(small & approx) / max(len(small), 1), 4)
            rec["wall_small_s"] = t_small
        out["sweep"][f"nprobe={nprobe}"] = rec
    return out


def packing_waste(spark, sf, max_tokens=2048):
    from llmxmapreduce_spark.functions.text import (token_count_bpe_ish,
                                                    token_count_estimate)
    from llmxmapreduce_spark.operators import packing

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    out = {"measure": "packing_waste", "sf_dir": sf,
           "max_tokens": max_tokens}
    for label, tok in (("ws", None), ("bpe_ish", token_count_bpe_ish),
                       ("estimate_len4", token_count_estimate)):
        def run():
            seqs = packing.pack_sequences(d, max_tokens, tokenizer=tok)
            return seqs.agg(
                F.count(F.lit(1)).alias("n_seqs"),
                F.sum(F.when(~F.col("truncated"), 1).otherwise(0))
                .alias("n_full"),
                F.sum(F.when(~F.col("truncated"), F.col("total_tokens")))
                .alias("tok_full"),
                F.sum(F.when(F.col("truncated"), 1).otherwise(0))
                .alias("n_trunc"),
            ).collect()[0]
        r, wall = t(run)
        waste = 1.0 - r["tok_full"] / (max_tokens * max(r["n_full"], 1))
        out[label] = {
            "n_seqs": r["n_seqs"], "n_truncated": r["n_trunc"],
            "padding_waste_pct": round(100 * waste, 3), "wall_s": wall,
        }
    return out


def bloom_vs_fast(spark, sf):
    from llmxmapreduce_spark.operators import decontamination as dc

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)

    def run_fast():
        return dc.contamination_flags_fast(
            corpus, bench, n=13, min_parallelism=64).count()

    def run_bloom():
        bloom = dc.build_gram_bloom(bench, n=13, bits_per_key=24)
        return dc.contamination_flags_bloom(
            corpus, bloom, n=13, min_parallelism=64).count(), len(bloom[0])

    n_fast, t_fast = t(run_fast)
    (n_bloom, bloom_bytes), t_bloom = t(run_bloom)
    return {
        "measure": "decontaminate_fast_vs_bloom", "sf_dir": sf,
        "flagged_fast": n_fast, "flagged_bloom": n_bloom,
        "bloom_no_false_negatives": n_bloom >= n_fast,
        "bloom_bits_bytes": bloom_bytes,
        "wall_fast_s": t_fast, "wall_bloom_s": t_bloom,
    }


def shards_manifest(spark, sf, tmp="/tmp/r7_shards"):
    from llmxmapreduce_spark.operators import packing
    from llmxmapreduce_spark.sources.shards import write_training_shards

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    seqs = packing.pack_sequences(d, 2048).localCheckpoint(eager=True)
    m_tok, t_tok = t(lambda: write_training_shards(
        seqs, tmp + "/with_tokens", rows_per_shard=2_000))
    m_none, t_none = t(lambda: write_training_shards(
        seqs, tmp + "/no_tokens", rows_per_shard=2_000, token_col=None))
    return {
        "measure": "shards_manifest_token_col", "sf_dir": sf,
        "n_files": m_tok["n_files"], "n_rows": m_tok["n_rows"],
        "wall_with_tokens_s": t_tok, "wall_token_col_none_s": t_none,
        "manifest_has_tokens": "n_tokens" in m_tok,
        "none_matches_rows": m_none["n_rows"] == m_tok["n_rows"],
    }


def data_selection(spark, sf):
    """Walls for the round-7 data-selection trio at this scale factor
    (single runs; trusted slice = doc_id % 19 == 0)."""
    import __spark_entry__ as e

    out = {"measure": "data_selection", "sf_dir": sf}
    for name in ("q_ccnet_perplexity", "q_dsir_weights",
                 "q_quality_classifier"):
        def run():
            df = getattr(e, name)(spark, sf)
            df.write.mode("overwrite").format("noop").save()
            return None
        _, wall = t(run)
        out[name[2:]] = wall
    return out


STEPS = {
    "ivf": ivf_join_recall,
    "packing": packing_waste,
    "bloom": bloom_vs_fast,
    "shards": shards_manifest,
    "selection": data_selection,
}


def main():
    sf = sys.argv[1]
    steps = sys.argv[2:] or list(STEPS)
    spark = get_spark("round7_scale")
    for s in steps:
        try:
            print(json.dumps(STEPS[s](spark, sf)), flush=True)
        except Exception as e:  # keep later steps running
            print(json.dumps({"measure": s, "error": str(e)[:400]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
