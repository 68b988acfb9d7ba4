#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1}

Each query executes to completion with a noop sink (no driver-side row
transfer), so the timing measures the engine, not collect().

Variance protocol (hardened r12 after the r11 false regression): every
query first runs ONE discarded warm-up pass (JIT, shuffle-file and page
cache, Python worker pool), then $SPARK_GRAFT_BENCH_RUNS timed runs
(default 3).  "queries"/"value" report per-query MEDIANS; per-query MINS
ship alongside ("mins", "suite19_min_sec") because the min is the
box-load-immune statistic — contention only ever ADDS time.  The 1- and
5-minute load averages are stamped into the record at start and end
("loadavg").

How to read a noisy round: if suite19_sec drifts up vs the prior round
but suite19_min_sec is flat AND loadavg is high (≳ the 32 cores the
bench assumes it owns), the drift is box contention, not a code
regression — r11's +31% headline was exactly this and cost an
independent re-measurement to adjudicate.  A real regression moves the
MIN.  The raw per-run timings and per-query spread (max−min) ship under
"runs" / "spread_sec" in BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402

# Headline set: relational core, windows/streaming twins, dedup/similarity
# scale extensions, both LLM pipelines (mock client) — including the V2 run
# at the reference's shipped knobs (conv 6 layers, kernel 3, refine 3×3).
HEADLINE = [
    "q1_pricing_summary",
    "j3_star_join_agg",
    "t1_topk_per_group",
    "p6_crawl_filter_backfill",
    "a8_nonzero_avg",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_windows",
    "exact_dedup",
    "simhash16",
    "minhash_lsh_neardup",
    "embedding_cosine_topk",
    "text_quality",
    "doc_fingerprint",
    "skeleton_roundtrip",
    "a3_digest_merge",
    "a9_claim_metrics",
    "v1_qa_secret_key",
    "v2_survey_pipeline",
    "v2_survey_refdefaults",
    "v2_survey_fullprompts",
    "neardup_dedup_e2e",
    "minhash_neardup_estimate",
    "repetition_stats",
    "repetition_stats_fast",
    "cosine_topk_np",
    "ivf_topk",
    "semantic_dedup",
    "quality_signals",
    "span_dedup",
    "substring_dedup",
    "substring_dedup_fast",
    "line_dedup",
    "split_scrub",
    "split_scrub_fast",
    "warc_roundtrip",
    "compression_ratio",
    "pii_redact",
    "source_mixture",
    "sequence_packing",
    "sequence_packing_bpe",
    "corpus_prep_e2e",
    "decontaminate",
    "decontaminate_fast",
    "decontaminate_bloom",
    "ivf_topk_join",
    "ccnet_perplexity",
    "dsir_weights",
    "quality_classifier",
    "quality_classifier_fit",
    "quality_classifier_score",
    "token_encode",
    "url_filters",
    "corpus_report",
    "corpus_shuffle",
    "curriculum_order",
    "interleave_sources",
    "bm25_topk",
    "kmeans_lloyd",
    "pagerank_bipartite",
    "stratified_sample_n",
    "pq_encode",
    "pq_adc_topk",
    "asof_join",
    "range_join_agg",
    "zorder_key",
    "heavy_hitters",
    "funnel_steps",
    "retention_cohorts",
    "resample_locf",
    "scd2_intervals",
    "json_extract_agg",
    "dq_report",
    "group_quantiles",
    "bigram_stats",
    "event_sessions",
    "rolling_value_stats",
    "cdc_snapshot",
    "bloom_semi_join",
    "value_histogram",
    "fuzzy_name_pairs",
    "value_moments",
    "user_event_crosstab",
    "image_neardup",
    "video_neardup",
    "set_jaccard_join",
    "set_containment_join",
    "connected_components",
    "media_prep_e2e",
    "v3_host_e2e",
    "hll_distinct",
    "interval_join",
    "cms_user_counts",
    "orc_roundtrip",
    "triangle_count",
    "langid_predict",
    "weighted_sample",
    "kway_split",
    "label_propagation",
    "salted_agg",
    "qdigest_values",
    "pattern_hits",
    "p17_html_extract",
    "html_extract_justext",
    "v2_digest_feedback_unfused",
    "v2_digest_feedback_fused",
    "langid_predict_fast",
    "qdigest_values_fast",
    # r14 additions (never remove/rename existing entries)
    "qdigest_values_catalyst",
]

# Oracle-twin lines: implementations that exist to mirror a DuckDB-
# expressible oracle while a FASTER production path covers the same
# semantics — their cost is a correctness-harness property, not a
# deployment property, so the record reports "production_sec" (the total
# a deployment would run) alongside the all-in total (round-7 review:
# the Catalyst `decontaminate` twin alone carried ~10% of the board).
ORACLE_TWIN = {
    "decontaminate",            # production: decontaminate_fast / _bloom
    "embedding_cosine_topk",    # production: cosine_topk_np / ivf_topk(_join)
    "minhash_lsh_neardup",      # production: minhash_neardup_estimate
    "substring_dedup",          # production: substring_dedup_fast
    "split_scrub",              # production: split_scrub_fast
    # comparison baseline, not a deployment path (r13 LLM-batch-
    # coalescing): production is v2_digest_feedback_fused
    "v2_digest_feedback_unfused",
}

# The original five-member twin set (pre-r13): "oracle_twin5_sec" in the
# output tracks THIS subset so the cross-round twin trend stays
# apples-to-apples after members were added in r13 (r13 verdict
# what's-wrong #6); "oracle_twin_sec" stays the all-member sum.
ORACLE_TWIN5 = [
    "decontaminate", "embedding_cosine_topk", "minhash_lsh_neardup",
    "substring_dedup", "split_scrub",
]

# The round-2..5 comparable set: "suite19_sec" in the output JSON is the
# sum over these, so cross-round regression tracking is immune to queries
# being ADDED to HEADLINE (round 5's 19-query total: 21.8 s; baseline
# 52.1 s).
SUITE19 = [
    "q1_pricing_summary", "j3_star_join_agg", "t1_topk_per_group",
    "p6_crawl_filter_backfill", "a8_nonzero_avg", "events_tumbling_window",
    "events_sliding_window", "events_session_windows", "exact_dedup",
    "simhash16", "minhash_lsh_neardup", "embedding_cosine_topk",
    "text_quality", "doc_fingerprint", "skeleton_roundtrip",
    "a3_digest_merge", "a9_claim_metrics", "v1_qa_secret_key",
    "v2_survey_pipeline",
]

# Bench-variant queries, resolved BEFORE the oracle board: where a name
# exists in both, the board runs an exact-value variant tuned for the
# correctness gate (decimal sums, exhaustive nprobe, portable md5
# hashing) while the entry below is the production-shaped workload whose
# r06/r07 medians the regression record tracks — bench must keep pricing
# the production shape (e.g. board ivf_topk_join probes ALL cells; the
# bench line prices nprobe=4/16).  Names not on the board at all are the
# golden-transcript-gated pipelines (tests/test_v2_refdefaults.py).
BENCH_ONLY = {
    "v2_survey_refdefaults": entrymod.q_v2_survey_refdefaults,
    "v2_survey_fullprompts": entrymod.q_v2_survey_fullprompts,
    "neardup_dedup_e2e": entrymod.q_neardup_dedup_e2e,
    "minhash_neardup_estimate": entrymod.q_minhash_neardup_estimate,
    "repetition_stats": entrymod.q_repetition_stats,
    "repetition_stats_fast": entrymod.q_repetition_stats_fast,
    "cosine_topk_np": entrymod.q_cosine_topk_np,
    "ivf_topk": entrymod.q_ivf_topk,
    "semantic_dedup": entrymod.q_semantic_dedup,
    "quality_signals": entrymod.q_quality_signals,
    "span_dedup": entrymod.q_span_dedup,
    "substring_dedup_fast": entrymod.q_substring_dedup_fast,
    "split_scrub_fast": entrymod.q_split_scrub_fast,
    "compression_ratio": entrymod.q_compression_ratio,
    "pii_redact": entrymod.q_pii_redact,
    "source_mixture": entrymod.q_source_mixture,
    "sequence_packing": entrymod.q_sequence_packing,
    "sequence_packing_bpe": entrymod.q_sequence_packing_bpe,
    "corpus_prep_e2e": entrymod.q_corpus_prep_e2e,
    "decontaminate": entrymod.q_decontaminate,
    "decontaminate_fast": entrymod.q_decontaminate_fast,
    "decontaminate_bloom": entrymod.q_decontaminate_bloom,
    "ivf_topk_join": entrymod.q_ivf_topk_join,
    "ccnet_perplexity": entrymod.q_ccnet_perplexity,
    "dsir_weights": entrymod.q_dsir_weights,
    "quality_classifier": entrymod.q_quality_classifier,
    "quality_classifier_fit": entrymod.q_quality_classifier_fit,
    "quality_classifier_score": entrymod.q_quality_classifier_score,
    "token_encode": entrymod.q_token_encode,
    "url_filters": entrymod.q_url_filters,
    "pq_adc_topk": entrymod.q_pq_adc_topk,
    # r10 (judge task #8): the two e2e pipelines that shipped test-gated
    # only — media curation (corpus_prep's binary mirror) and the V3
    # MCP-host loop (sf-independent control plane + distributed stages)
    "media_prep_e2e": entrymod.q_media_prep_e2e,
    "v3_host_e2e": entrymod.q_v3_host_transcript,
    # r11: the context-sensitive jusText extraction path vs the gate
    # (the p17 board entry prices the gate; this line prices what
    # extractor="justext" costs on the same synthetic HTML corpus)
    "html_extract_justext": entrymod.q_html_extract_justext,
    # r11: production langid scoring (no-shuffle mapInPandas integer
    # path; the board's langid_predict is its oracle-twin workload)
    "langid_predict_fast": entrymod.q_langid_predict_fast,
    # r13 LLM-batch-coalescing pair (SURVEY §4): staged in-cycle
    # digest->feedback chain vs the fused one-stage path; outputs equal
    # by tests/test_v2_fused.py, delta = pure engine overhead
    "v2_digest_feedback_unfused": entrymod.q_v2_digest_feedback_unfused,
    "v2_digest_feedback_fused": entrymod.q_v2_digest_feedback_fused,
    # r11: production q-digest build (single-pass local compression of
    # the universe-bounded leaf table; board entry = Catalyst twin)
    "qdigest_values_fast": entrymod.q_qdigest_values_fast,
    # r14: the pure-Catalyst k-level compression recursion the board
    # entry ran through r13 (the board now runs the pytest-pinned
    # bit-identical single-Arrow-pass build; this line keeps the old
    # shape priced so the swap stays a measured trade)
    "qdigest_values_catalyst": entrymod.q_qdigest_values_catalyst,
    # r10 scale extensions: mergeable HLL cardinality state + the
    # stream-stream interval join's batch twin
    "interval_join": entrymod.q_interval_join,
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("bench")

    try:
        # getattr: os.getloadavg does not exist on some platforms
        # (Windows) — AttributeError there, OSError elsewhere (r13
        # ADVICE); a missing load stamp must never crash the bench
        load_start = [round(x, 2)
                      for x in getattr(os, "getloadavg", lambda: ())()[:2]]
    except OSError:
        load_start = []

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        fn = (BENCH_ONLY.get(name) or queries.get(name)
              or entrymod.RETIRED_QUERIES.get(name))
        if fn is None:
            continue
        samples: list[float] = []
        # one discarded warm-up + n_runs timed: the warm-up absorbs JIT,
        # codegen, page-cache and Python-worker-pool cold starts that
        # otherwise land entirely on run 1 and skew a 3-run median
        for i in range(n_runs + 1):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                if i > 0:
                    samples.append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001 - bench must always report
                print(f"# bench error in {name}: {e}", file=sys.stderr)
                samples = []
                break
        if samples:
            timings[name] = round(statistics.median(samples), 3)
            mins[name] = min(samples)
            runs[name] = samples
            spread[name] = round(max(samples) - min(samples), 3)
        else:
            timings[name] = -1.0
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    suite19 = round(
        sum(v for k, v in timings.items() if k in SUITE19 and v >= 0), 3
    )
    suite19_min = round(
        sum(v for k, v in mins.items() if k in SUITE19 and v >= 0), 3
    )
    twin = round(sum(v for k, v in timings.items()
                     if k in ORACLE_TWIN and v >= 0), 3)
    try:
        load_end = [round(x, 2)
                    for x in getattr(os, "getloadavg", lambda: ())()[:2]]
    except OSError:
        load_end = []
    compact = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": {"runs_per_query": n_runs, "stat": "median",
                     "warmup_runs_discarded": 1},
        # box-load context: [1min, 5min] loadavg at bench start and end.
        # Read suite19 drift against suite19_min_sec + these — contention
        # only ever ADDS time, so a flat min under high load is NOT a
        # regression (see module docstring; r11 false +31%)
        "loadavg": {"start": load_start, "end": load_end},
        "suite19_sec": suite19,
        "suite19_min_sec": suite19_min,
        # the deployment-path total vs the correctness-harness overhead
        # (see ORACLE_TWIN) — regression-bar consumers should track
        # production_sec; "value" stays the all-in total for continuity
        "production_sec": round(total - twin, 3),
        "oracle_twin_sec": twin,
        "oracle_twin_queries": sorted(ORACLE_TWIN & set(timings)),
        # the stable five-member subset (see ORACLE_TWIN5) for
        # cross-round trending
        "oracle_twin5_sec": round(
            sum(v for k, v in timings.items()
                if k in ORACLE_TWIN5 and v >= 0), 3),
    }
    verbose = dict(compact, mins=mins, runs=runs, spread_sec=spread)
    # Raw per-run detail goes to stderr + a committed sidecar, NOT stdout:
    # rounds 5-6 proved the driver keeps only the TAIL of stdout, and the
    # verbose record pushed the parseable head off the buffer
    # ("parsed": null in BENCH_r0{5,6}.json).  Round 8 proved the cap is
    # tighter still: the all-82-query compact medians line (~3 KB)
    # ALSO outgrew the capture window ("parsed": null in BENCH_r08.json,
    # tail started mid-line).  So the single stdout line now carries only
    # the totals + the fixed 19-query regression suite (~1 KB); the full
    # per-query medians live in BENCH_LOCAL.json (committed) and stderr.
    print(json.dumps(verbose), file=sys.stderr)
    stdout_line = dict(compact)
    stdout_line["queries"] = {k: v for k, v in timings.items()
                              if k in SUITE19}
    stdout_line["n_queries_priced"] = len(timings)
    stdout_line["detail"] = "BENCH_LOCAL.json"
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
            json.dump(verbose, f, indent=1)
        with open(os.path.join(here, "BENCH_LOCAL.md"), "w") as f:
            f.write("# BENCH_LOCAL — latest local bench run\n\n"
                    f"sf={sf}, {n_runs} timed runs/query after 1 "
                    "discarded warm-up, per-query medians; "
                    f"total {total} s, suite19 {suite19} s "
                    f"(min-sum {suite19_min} s), loadavg "
                    f"{load_start}→{load_end}.\n\n"
                    "| query | median_s | min_s | spread_s | runs |\n"
                    "|---|---|---|---|---|\n")
            for name, med in timings.items():
                f.write(f"| {name} | {med} | {mins.get(name, '')} | "
                        f"{spread.get(name, '')} | "
                        f"{runs.get(name, [])} |\n")
    except OSError as e:    # read-only checkout must not kill the bench
        print(f"# bench sidecar write failed: {e}", file=sys.stderr)
    print(json.dumps(stdout_line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
