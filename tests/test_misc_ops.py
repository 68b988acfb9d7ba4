"""Tests: figures (L16/J5), LLM metrics (D10/D12), skew helpers, A10 dedup."""

from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import figures, skew
from llmxmapreduce_spark.operators.eval_ops import dedup_claims
from llmxmapreduce_spark.operators.llm_op import LLMMetrics, llm_stage


def test_parse_figures():
    reply = ("Section Title: Methods\nPosition Sentence: We train a model.\n"
             "Figure Title: Training loop\n```mermaid\ngraph TD;\nX-->Y\n```\n"
             "Section Title: Results\nPosition Sentence: Scores improve.\n"
             "Figure Title: Score chart\n```markdown\n| a | b |\n```")
    got = figures.parse_figures(reply)["figures"]
    assert [g["section_title"] for g in got] == ["Methods", "Results"]
    assert got[0]["img_type"] == "mermaid" and "X-->Y" in got[0]["code"]


def test_anchor_figures_insertion(spark):
    sections = spark.createDataFrame(
        [("s1", 0, "Methods", "Intro words. We train a model. More."),
         ("s1", 1, "Results", "No anchor here."),
         ("s2", 0, "Methods", "We train a model. Elsewhere.")],
        ["survey_id", "pos", "title", "content"],
    )
    figs = spark.createDataFrame(
        [("s1", "Methods", "We train a model.", "Training", "mermaid", "graph TD;\nX-->Y")],
        ["survey_id", "section_title", "pos_sentence", "fig_title", "img_type", "code"],
    )
    out = {(r["survey_id"], r["pos"]): r["content"]
           for r in figures.anchor_figures(sections, figs).collect()}
    assert out[("s1", 0)].startswith("Intro words. \n<figure-link title='Training'")
    assert "graph TD;\\nA" not in out[("s1", 0)]  # newline escaped as two chars
    assert "content='graph TD;\\nX-->Y'" in out[("s1", 0)]
    assert out[("s1", 1)] == "No anchor here."       # untouched
    assert out[("s2", 0)] == "We train a model. Elsewhere."  # other survey


def test_llm_metrics_accumulators(spark):
    from llmxmapreduce_spark.llm.client import HashEchoClient

    metrics = LLMMetrics(spark)
    df = spark.createDataFrame([(i, f"prompt {i}") for i in range(10)], ["id", "p"])
    out = llm_stage(
        df, lambda r: r["p"], lambda s: {"reply": s}, HashEchoClient,
        [__import__("pyspark").sql.types.StructField(
            "reply", __import__("pyspark").sql.types.StringType(), True)],
        ["id"], metrics=metrics,
    )
    out.count()
    snap = metrics.snapshot()
    assert snap["calls"] == 10
    assert snap["failures"] == 0
    assert snap["prompt_chars"] >= 10 * len("prompt 0")
    assert snap["reply_chars"] > 0
    assert snap["est_prompt_tokens"] == snap["prompt_chars"] // 4


def test_salted_aggregate_matches_plain(spark):
    ev = spark.createDataFrame(
        [("hot" if i % 10 else "cold", float(i)) for i in range(1000)],
        ["k", "v"],
    )
    got = skew.salted_aggregate(ev, ["k"], {
        "n": (F.count(F.lit(1)), F.sum("n")),
        "total": (F.sum(F.col("v").cast("decimal(20,4)")),
                  F.sum("total").cast("double")),
    }, n_salt=8).collect()
    plain = ev.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(20,4)")).cast("double").alias("total"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, plain))


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(300)], ["k", "payload"])
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "label"])
    got = skew.salted_join(fact, dim, ["k"], n_salt=4).collect()
    plain = fact.join(dim, "k").collect()
    assert sorted((r["k"], r["payload"], r["label"]) for r in got) \
        == sorted((r["k"], r["payload"], r["label"]) for r in plain)


def test_dedup_claims_exact_and_near(spark):
    base = "the model improves accuracy on the benchmark by a wide margin " * 2
    rows = [
        (1, base),
        (2, base.upper()),                      # exact dup after normalize
        (3, base.replace("wide", "large")),     # near dup
        (4, "completely different claim about something else entirely "
            "unrelated to any other text " * 2),
    ]
    df = spark.createDataFrame(rows, ["claim_id", "claim"])
    kept = sorted(r["claim_id"] for r in
                  dedup_claims(df, near_threshold=0.5).collect())
    assert kept == [1, 4]


def test_v2_pipeline_with_figures(spark):
    from llmxmapreduce_spark.llm.survey_mock import MockSurveyClient
    from llmxmapreduce_spark.pipelines import v2_survey as v2
    from tests.test_v2_pipeline import make_surveys

    surveys = make_surveys(spark, n_surveys=1, n_papers=4)
    cfg = v2.V2Config(conv_layers=1, result_num=2, top_k=2, refine_rounds=1,
                      best_of=1, polish=False, figures=True)
    out = v2.run_v2_survey(surveys, MockSurveyClient, cfg).collect()
    assert len(out) == 1
    assert "<figure-link title='Overview of " in out[0]["content_md"]


def test_fingerprint_fast_and_portable_paths(spark):
    import pytest

    from llmxmapreduce_spark.operators import text_stats

    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy dog"),   # exact dup
         (2, "a completely different document about spark engines"),
         (3, "one two"),                                        # < n words
         (4, "")],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id",
        text_stats.fingerprint(F.col("text")).alias("fast"),
        text_stats.fingerprint(F.col("text"), algo="md5").alias("portable"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # fast path is a bigint, portable a hex string; both collide on dups
    assert isinstance(by_id[0]["fast"], int)
    assert by_id[0]["fast"] == by_id[1]["fast"]
    assert by_id[0]["portable"] == by_id[1]["portable"]
    assert by_id[0]["fast"] != by_id[2]["fast"]
    # short/empty texts still fingerprint (partial shingle)
    assert by_id[3]["fast"] is not None and by_id[4]["fast"] is not None
    with pytest.raises(ValueError):
        text_stats.fingerprint(F.col("text"), algo="sha1")


def test_llm_dedup_claims_matches_deterministic_on_planted_dups(spark):
    """A10 LLM mode (mock) vs deterministic MinHash mode on a
    planted-duplicate fixture: both must drop the exact duplicates; the
    LLM path additionally exercises the group-split + pairwise-merge rounds
    (group_size=4 forces cross-group merging)."""
    from llmxmapreduce_spark.llm.client import MockDedupClient
    from llmxmapreduce_spark.operators.eval_ops import llm_dedup_claims

    uniques = [f"unique finding number {i} about topic {i * 7}" for i in range(8)]
    rows = []
    cid = 0
    for s in ("s1", "s2"):
        for i, u in enumerate(uniques):
            rows.append((s, cid, u)); cid += 1
            if i % 2 == 0:          # plant a duplicate of every even claim
                rows.append((s, cid, u.upper())); cid += 1
    claims = spark.createDataFrame(rows, ["survey_id", "claim_id", "claim"])

    llm_kept = llm_dedup_claims(claims, MockDedupClient, group_size=4).collect()
    per_survey = {}
    for r in llm_kept:
        per_survey.setdefault(r["survey_id"], []).append(r)
    for s, kept in per_survey.items():
        texts = [" ".join(r["claim"].lower().split()) for r in kept]
        assert sorted(texts) == sorted(uniques), (s, texts)
        # first occurrence (lowest claim_id) survives
        assert all(
            r["claim_id"] == min(
                row[1] for row in rows
                if row[0] == s
                and " ".join(row[2].lower().split()) == " ".join(r["claim"].lower().split())
            ) for r in kept)

    # deterministic mode agrees on the count (per survey: 8 uniques)
    det = dedup_claims(
        claims.filter("survey_id = 's1'").select("claim_id", "claim"))
    assert det.count() == len(uniques)


def test_skew_report(spark):
    rows = [("hot", i) for i in range(900)] + \
        [(f"k{i % 50}", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "v"])
    rep = {r.k: (r.n_rows, r.share, r.x_over_even)
           for r in skew.skew_report(df, "k", top=5).collect()}
    assert len(rep) == 5
    n, share, x = rep["hot"]
    assert n == 900 and abs(share - 0.9) < 1e-12
    # 51 distinct keys, mean = 1000/51; hot is 900/(1000/51) = 45.9x
    assert abs(x - 900 / (1000 / 51)) < 1e-9
    # uniform keys sit near 1x
    assert all(v[2] < 2 for k, v in rep.items() if k != "hot")


def test_crosstab_counts(spark):
    import duckdb
    import pytest
    from llmxmapreduce_spark.operators.report import crosstab_counts

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, None),
            (3, None), (4, "zzz")]          # zzz outside the vocabulary
    df = spark.createDataFrame(rows, "k long, c string")
    got = {r.k: (r.n_a, r.n_b) for r in
           crosstab_counts(df, "k", "c", ["a", "b"]).collect()}
    assert got == {1: (2, 1), 2: (0, 1), 3: (0, 0), 4: (0, 0)}
    with pytest.raises(ValueError):
        crosstab_counts(df, "k", "c", [])
    # DuckDB twin on events
    EV = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(EV)
    types = ["click", "view", "purchase", "signup", "error"]
    got2 = sorted(tuple(r) for r in
                  crosstab_counts(ev, "user_id", "event_type",
                                  types).collect())
    cols = ", ".join(
        f"SUM(COALESCE(CAST(event_type = '{t}' AS BIGINT), 0)) AS n_{t}"
        for t in types)
    want = sorted(tuple(r) for r in duckdb.sql(
        f"SELECT user_id, {cols} FROM '{EV}' GROUP BY user_id"
    ).fetchall())
    assert got2 == want
