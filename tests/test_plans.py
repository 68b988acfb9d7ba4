"""Physical-plan assertions: the plans we'd want at 100 TB, not just plans
that pass.  Checks predicate pushdown, column pruning, broadcast joins, and
absence of cartesian products on the headline queries."""

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    fn = entrymod.queries().get(name) or entrymod.RETIRED_QUERIES[name]
    df = fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    # p1 filter on documents: doc_id % 7 <> 0 can't push, but the scan must
    # prune columns (only doc_id + text needed).
    df = entrymod.RETIRED_QUERIES["p7_bibkey_normalize"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    # column pruning: n_chars/source/lang must NOT be read
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_partition_filter_pushdown(spark):
    from pyspark.sql import functions as F

    from llmxmapreduce_spark import load_table

    li = load_table(spark, SF, "lineitem").filter(F.col("l_quantity") > 49) \
        .select("l_orderkey", "l_quantity")
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]" in plan


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "j3_star_join_agg")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_lsh_neardup_no_cartesian(spark):
    # inspect the lazy plan (the query itself materializes via checkpoint,
    # which would hide the join operators)
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from llmxmapreduce_spark.operators import dedup

    corpus = em._corpus_with_mutants(spark, SF)
    lazy = dedup.minhash_dedup_pairs(corpus, num_hashes=8, bands=4,
                                     threshold=0.5, materialize=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_cosine_topk_broadcasts_queries(spark):
    plan = plan_of(spark, "embedding_cosine_topk")
    # the small query side must broadcast; the corpus is scanned once
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_whole_stage_codegen_on_text_ops(spark):
    plan = plan_of(spark, "p14_normalize_answer")
    # '*(n)' marks whole-stage-codegen stages in the plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_uses_single_window_pass(spark):
    plan = plan_of(spark, "t1_topk_per_group")
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan


def test_t3_topn_is_take_ordered(spark):
    plan = plan_of(spark, "t3_topn")
    assert "TakeOrderedAndProject" in plan  # no full sort for global top-n
