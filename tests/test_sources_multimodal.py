"""Tests for sources (JSONL/search/crawl/state) and multimodal operators."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import html_clean, multimodal
from llmxmapreduce_spark.sources import crawl, jsonl


def test_survey_jsonl_roundtrip(spark):
    rows = [
        {"survey_id": "s1", "title": "T1",
         "papers": [{"bibkey": "a", "title": "A", "abstract": "aa",
                     "txt": "body", "url": None, "txt_token": 5}]},
        {"survey_id": "s2", "title": "T2", "papers": []},  # dropped by P2
    ]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        df = jsonl.load_surveys(spark, path)
        got = df.collect()
        assert [r["survey_id"] for r in got] == ["s1"]
        out = os.path.join(d, "out")
        jsonl.save_surveys(df, out, mode="overwrite")
        back = spark.read.json(out).collect()
        assert back[0]["survey_id"] == "s1"


def test_infinitebench_registry(spark):
    with pytest.raises(KeyError):
        jsonl.load_infinitebench_task(spark, "not_a_task", "/tmp")
    assert len(jsonl.INFINITEBENCH_TASKS) == 12


def test_export_markdown(spark):
    df = spark.createDataFrame(
        [("s1", "Topic", "## A\ntext", "## References\n[1] x")],
        ["survey_id", "survey_title", "content_md", "ref_str"],
    )
    got = jsonl.export_markdown(df).collect()[0]
    assert got["markdown"].startswith("# Topic\n\n## A")
    assert "## References" in got["markdown"]


def test_search_crawl_flow(spark):
    # defined inside the test so cloudpickle ships them by value (executor
    # workers can't import the pytest module by name)
    def fake_search(query):
        return [{"url": f"https://x.test/{query}/{i}", "title": f"t{i}",
                 "snippet": f"s{i} about {query}"} for i in range(3)]

    def fake_fetch(url):
        if url.endswith("/1"):
            raise RuntimeError("fetch failed")
        return f"# Page {url}\ncontent of {url} with the a of in words"

    queries = spark.createDataFrame(
        [("topic1", "qa"), ("topic1", "qb"), ("topic2", "qc")],
        ["topic", "query"],
    )
    hits = crawl.batch_web_search(queries, lambda: fake_search, top_n=5)
    got = hits.collect()
    # per-topic cap of over_fetch(5)=6: topic1 has qa+qb = 6 urls, topic2 has 3
    by_topic = {}
    for r in got:
        by_topic.setdefault(r["topic"], set()).add(r["url"])
    assert len(by_topic["topic1"]) == 6
    assert len(by_topic["topic2"]) == 3

    pages = crawl.crawl_urls(hits, lambda: fake_fetch)
    rows = pages.collect()
    errs = [r for r in rows if r["error"]]
    oks = [r for r in rows if not r["error"]]
    assert len(errs) == 3  # the /1 url of each of qa, qb, qc
    assert all(r["raw_content"] is None for r in errs)
    assert all(r["raw_content"].startswith("# Page") for r in oks)


def test_crawl_state_upsert(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state")
        first = spark.createDataFrame(
            [("u1", False), ("u2", True)], ["url", "error"])
        state = crawl.upsert_crawl_state(spark, path, first)
        assert state.count() == 2
        second = spark.createDataFrame(
            [("u1", True), ("u3", False)], ["url", "error"])
        state = crawl.upsert_crawl_state(spark, path, second)
        got = {r["url"]: r["error"] for r in state.collect()}
        assert got == {"u1": False, "u2": True, "u3": False}  # existing wins
        cands = spark.createDataFrame([("u1",), ("u2",), ("u4",)], ["url"])
        pend = {r["url"] for r in crawl.pending_urls(state, cands).collect()}
        assert pend == {"u2", "u4"}  # u1/u3 fetched ok; u2 errored -> retry


def make_assets(spark):
    rows = [
        ("img1", "image", bytes(range(100)), 10, 10, None),
        ("img2", "image", b"", 0, 0, None),
        ("vid1", "video", b"\x01\x02" * 50, 64, 48, 3500),
    ]
    return spark.createDataFrame(
        rows, ["asset_id", "media_type", "payload", "width", "height", "duration_ms"]
    )


def test_multimodal_features(spark):
    out = multimodal.extract_features(make_assets(spark)).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert all(not r["decode_ok"] for r in out)          # stubbed decode
    assert all("stub" in r["decode_error"] for r in out)
    assert by_id["img1"]["n_bytes"] == 100
    assert len(by_id["img1"]["feature"]) == 16
    assert abs(sum(by_id["img1"]["feature"]) - 1.0) < 1e-6
    assert by_id["img2"]["feature"] == [0.0] * 16


def test_multimodal_frame_plan_and_stats(spark):
    assets = make_assets(spark)
    plan = multimodal.frame_sample_plan(assets, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in sorted(plan, key=lambda r: r["frame_idx"])] \
        == [0, 1000, 2000]
    stats = {r["media_type"]: r for r in multimodal.media_stats(assets).collect()}
    assert stats["image"]["n_assets"] == 2
    assert stats["video"]["total_duration_ms"] == 3500
    ck = multimodal.checksum(assets).collect()
    assert all(len(r["payload_md5"]) == 32 for r in ck)


def test_multimodal_resize_plumbing(spark):
    out = multimodal.resize_images(make_assets(spark), 8, 4).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert set(by_id) == {"img1", "img2"}              # videos filtered out
    for r in out:
        assert not r["resize_ok"] and "stub" in r["resize_error"]
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["payload"]) == 32                 # 8×4 fake thumbnail
    # deterministic strided sample: first byte survives, output reproducible
    assert by_id["img1"]["payload"][0] == 0
    again = multimodal.resize_images(make_assets(spark), 8, 4).collect()
    assert {r["asset_id"]: bytes(r["payload"]) for r in again} \
        == {r["asset_id"]: bytes(r["payload"]) for r in out}
    # an injected real resizer's OUTPUT BYTES land in the payload column
    ok = multimodal.resize_images(
        make_assets(spark), 8, 4,
        resizer=lambda p, w, h: bytes([len(p) % 251]) * (w * h)).collect()
    assert all(r["resize_ok"] for r in ok)
    assert all(bytes(r["payload"]) == bytes([100 if r["asset_id"] == "img1"
                                             else 0]) * 32 for r in ok)


def test_html_extract_drops_boilerplate(spark):
    html = ("<html><script>var bad = 1;</script><body>"
            "<nav>home about contact</nav>"
            "<div>this is the main body of the page and it has many of the "
            "usual stopwords in it</div>"
            "<footer>c1 c2 c3</footer></body></html>")
    df = spark.createDataFrame([(html,)], ["html"])
    got = df.select(
        html_clean.extract_main_content(F.col("html")).alias("c"),
        html_clean.boilerplate_ratio(F.col("html")).alias("r"),
    ).collect()[0]
    assert got["c"].startswith("this is the main body")
    assert "nav" not in got["c"] and "bad" not in got["c"]
    assert 0.5 < got["r"] < 1.0


def test_save_eval_csv_appends_avg_row(spark, tmp_path):
    import csv
    import glob

    metrics = spark.createDataFrame(
        [("s1", 0.5, 10), ("s2", 0.7, 20)], ["survey_id", "score", "n"])
    path = str(tmp_path / "eval_csv")
    jsonl.save_eval_csv(metrics, path)
    (csv_file,) = glob.glob(path + "/part-*.csv")
    with open(csv_file) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    avg = next(r for r in rows if r["survey_id"] == "AVG")
    assert float(avg["score"]) == 0.6           # mean of the double column
    assert float(avg["n"]) == 15.0              # counts average too
    assert {r["survey_id"] for r in rows} == {"s1", "s2", "AVG"}


def test_trace_sink_lineage_rows(spark):
    df = spark.createDataFrame([(1, "in-a", "out-a"), (2, "in-b", "out-b")],
                               ["doc_id", "input", "output"])
    got = jsonl.trace_sink(df, "map_stage").collect()
    assert {(r["doc_id"], r["input"], r["output"], r["operator_type"])
            for r in got} == {(1, "in-a", "out-a", "map_stage"),
                              (2, "in-b", "out-b", "map_stage")}
    assert all(r["ts"] is not None for r in got)


def test_write_training_shards(spark, tmp_path):
    from llmxmapreduce_spark.sources.shards import write_training_shards

    df = spark.createDataFrame(
        [(i, 100 + i % 7, f"seq text {i}") for i in range(1000)],
        "seq_id bigint, total_tokens bigint, text string")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, rows_per_shard=150)
    assert manifest["n_rows"] == 1000
    assert manifest["n_tokens"] == sum(100 + i % 7 for i in range(1000))
    assert manifest["n_files"] >= 7                  # ceil(1000/150)
    assert all(f["n_rows"] <= 150 for f in manifest["files"])
    # manifest reflects what is on disk, and the data round-trips
    back = spark.read.parquet(path)
    assert back.count() == 1000
    import json, os
    disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert disk == manifest
    # range partitioning: each shard FILE holds a contiguous seq_id span
    from pyspark.sql import functions as SF
    spans = (back.groupBy(SF.input_file_name().alias("f"))
             .agg(SF.min("seq_id").alias("lo"), SF.max("seq_id").alias("hi"))
             .collect())
    spans = sorted([(r["lo"], r["hi"]) for r in spans])
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 < l2
