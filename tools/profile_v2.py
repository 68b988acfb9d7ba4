#!/usr/bin/env python
"""Per-stage profile of the v2 refdefaults bench query (r13 opt loop).

Replicates q_v2_survey_refdefaults but threads a StageMetrics through
run_v2_survey, counts Spark jobs over the run, and prints the stage
table — the measurement §"Not yet optimized" item 2 asks for before
touching the conv/refine ladder.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from llmxmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--fused", action="store_true", default=True)
    ap.add_argument("--staged", dest="fused", action="store_false")
    args = ap.parse_args()

    spark = get_spark("profile_v2")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from llmxmapreduce_spark.llm.survey_mock import MockSurveyClient
    from llmxmapreduce_spark.operators.stage_metrics import StageMetrics
    from llmxmapreduce_spark.pipelines import v2_survey as v2

    def build(sm):
        d = entrymod.load_table(spark, sf, "documents").filter("doc_id < 256")
        papers = d.select(
            F.concat(F.lit("survey"), (F.col("doc_id") % 8).cast("string")).alias("survey_id"),
            F.struct(
                F.concat(F.lit("paper_"), F.col("doc_id").cast("string")).alias("bibkey"),
                F.concat(F.lit("Paper "), F.col("doc_id").cast("string")).alias("title"),
                F.substring("text", 1, 200).alias("abstract"),
                F.col("text").alias("txt"),
                F.concat(F.lit("https://example.org/"), F.col("doc_id").cast("string")).alias("url"),
                F.lit(None).cast("long").alias("txt_token"),
            ).alias("p"),
        )
        surveys = papers.groupBy("survey_id").agg(
            F.concat(F.lit("Survey of "), F.col("survey_id")).alias("title"),
            F.array_sort(F.collect_list("p")).alias("papers"),
        )
        cfg = v2.V2Config(conv_layers=6, receptive_field=3, result_num=10,
                          top_k=6, refine_rounds=3, best_of=3, polish=False,
                          block_count=1, digest_batch=1, llm_threads=8,
                          shuffle_partitions=8,
                          fused_digest_feedback=args.fused,
                          fused_init_outlines=args.fused,
                          fused_conv_refine=args.fused)
        out = v2.run_v2_survey(surveys, MockSurveyClient, cfg,
                               stage_metrics=sm)
        return out.select(
            "survey_id", "n_sections", "n_papers", "cite_ratio",
            F.length("content_md").alias("content_len"),
            "block_cycle_count",
        )

    tracker = spark.sparkContext.statusTracker()

    for run in range(args.n):
        sm = StageMetrics(spark)
        jobs0 = set(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        out = build(sm)
        t_build = time.time() - t0
        out.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs1 = set(tracker.getJobIdsForGroup(None))
        print(f"\n=== run {run}: wall={wall:.2f}s (build+actions; "
              f"build returned at {t_build:.2f}s) jobs={len(jobs1 - jobs0)}")
        for row in sm.report():
            print("   ", {k: v for k, v in row.items() if v not in (None, 0)})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
