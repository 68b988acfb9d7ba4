"""Tests for topk / crawl_ops against direct Python ports of the reference."""

from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import crawl_ops, topk


def ref_filter_papers(papers, similarity_threshold, min_length, max_length, top_n):
    """Direct port of async_crawl.py:392-436 for expected values."""
    sorted_papers = sorted(papers, key=lambda x: (-x["similarity"], -len(x["txt"]), x["url"]))
    valid = [p for p in sorted_papers if min_length <= len(p["txt"]) <= max_length]
    passed = [p for p in valid if p["similarity"] >= similarity_threshold]
    if len(passed) < top_n:
        remaining = [p for p in valid if p not in passed]
        passed = passed + remaining[: top_n - len(passed)]
    return passed


def make_crawl_rows():
    rows = []
    for topic in ("t1", "t2"):
        for i in range(12):
            rows.append({
                "topic": topic,
                "url": f"u{i:02d}",
                "txt": "x" * (100 + 40 * i),     # lengths 100..540
                "similarity": (i * 17) % 101,
            })
    return rows


def test_filter_papers_matches_reference(spark):
    rows = make_crawl_rows()
    df = spark.createDataFrame(rows)
    out = crawl_ops.filter_papers(
        df, similarity_threshold=60, min_length=150, max_length=500, top_n=4
    )
    got = {(r["topic"], r["url"]) for r in out.collect()}
    expected = set()
    for topic in ("t1", "t2"):
        papers = [r for r in rows if r["topic"] == topic]
        for p in ref_filter_papers(papers, 60, 150, 500, 4):
            expected.add((topic, p["url"]))
    assert got == expected


def test_filter_papers_no_truncation_above_topn(spark):
    # Reference keeps ALL above-threshold rows even when > top_n.
    rows = [{"topic": "t", "url": f"u{i}", "txt": "y" * 300, "similarity": 90}
            for i in range(8)]
    df = spark.createDataFrame(rows)
    out = crawl_ops.filter_papers(df, similarity_threshold=80, min_length=1,
                                  max_length=1000, top_n=3)
    assert out.count() == 8


def test_prune_top_k_deterministic(spark):
    rows = [(g, i, float(s)) for g in ("a", "b") for i, s in
            enumerate([5, 9, 9, 9, 2, 7])]
    df = spark.createDataFrame(rows, ["g", "i", "score"])
    out1 = topk.prune_top_k(df, ["g"], "score", 3, seed=42).collect()
    out2 = topk.prune_top_k(df, ["g"], "score", 3, seed=42).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    for g in ("a", "b"):
        kept = [r for r in out1 if r["g"] == g]
        assert len(kept) == 3
        assert all(r["score"] >= 7 for r in kept)  # 9,9,9 or 9,9,7 per ties


def test_best_of(spark):
    df = spark.createDataFrame(
        [("s1", "o1", 3.0), ("s1", "o2", 9.0), ("s2", "o3", 1.0)],
        ["survey", "outline", "score"],
    )
    got = topk.best_of(df, ["survey"], "score", "outline").collect()
    assert {(r["survey"], r["outline"]) for r in got} == {("s1", "o2"), ("s2", "o3")}


def test_top_n_and_limit(spark):
    df = spark.createDataFrame([(i, float(100 - i)) for i in range(50)], ["k", "v"])
    got = topk.top_n(df, [F.col("v").desc()], 5).collect()
    assert [r["k"] for r in got] == [0, 1, 2, 3, 4]
    got = topk.limit_first_n(df, "k", 7).collect()
    assert sorted(r["k"] for r in got) == list(range(7))


def test_over_fetch():
    assert topk.over_fetch(10) == 12
    assert topk.over_fetch(5, 1.2) == 6
