"""Named curation presets (pipelines/presets.py) run end-to-end through
prep_documents and honor their published recipe shapes."""

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.pipelines import presets
from llmxmapreduce_spark.pipelines.corpus_prep import prep_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # synthetic docs carry no terminal punctuation; C4's line rule keeps
    # only sentence-terminated lines, so make the fixture sentence-like
    return (load_table(spark, SF, "documents")
            .select("doc_id",
                    F.concat(F.trim("text"), F.lit(".")).alias("text"),
                    F.concat(F.lit("https://h"),
                             (F.col("doc_id") % 7).cast("string"),
                             F.lit(".example/"),
                             (F.col("doc_id") % 40).cast("string"))
                    .alias("url"),
                    (F.col("doc_id") % 3).cast("string").alias("source"))
            .limit(120))


def test_every_preset_constructs_and_validates():
    for name, fn in presets.PRESETS.items():
        if name == "gpt3":
            continue                       # needs a benchmark frame
        cfg = fn()
        # threshold names must be real quality_filter parameters — the
        # config would throw at run time otherwise (quality_filter
        # validates unknown/orphaned thresholds)
        assert isinstance(cfg.quality_thresholds, dict)


# The synthetic sf docs are 10-98 whitespace words with no terminal
# punctuation — real WEB-corpus thresholds (min 50 words, 3 sentences,
# stopword floors) legitimately reject them all.  The e2e runs therefore
# relax the thresholds (dataclasses.replace — the documented override
# path) and assert the preset's PIPELINE COMPOSITION; the published
# values themselves are pinned in test_published_defaults below.
_RELAXED_GOPHER = {"min_words": 5, "max_words": 100_000,
                   "min_mean_word_len": 1.0, "max_mean_word_len": 50.0,
                   "max_symbol_word_ratio": 1.0,
                   "max_bullet_line_ratio": 1.0,
                   "max_ellipsis_line_ratio": 1.0,
                   "min_alpha_word_ratio": 0.0,
                   "min_required_stopwords": 0}


def test_published_defaults():
    from dataclasses import replace  # noqa: F401

    c4 = presets.c4_preset()
    assert c4.quality_rules == ("c4",) and c4.neardup is False
    assert c4.quality_thresholds == {"min_sentences": 3,
                                     "min_line_words": 5}
    go = presets.gopher_preset()
    assert go.quality_rules == ("gopher",)
    assert go.quality_thresholds["min_words"] == 50
    assert go.quality_thresholds["max_words"] == 100_000
    assert go.quality_thresholds["min_mean_word_len"] == 3.0
    assert go.neardup_threshold == 0.8
    rw = presets.refinedweb_preset()
    assert rw.substring_n == 50 and rw.url_dedup
    assert rw.neardup_threshold == 0.7


def test_c4_preset_runs_and_is_pure_c4(spark, docs):
    from dataclasses import replace

    cfg = replace(presets.c4_preset(),
                  quality_thresholds={"min_sentences": 0,
                                      "min_line_words": 1})
    out = prep_documents(docs, cfg)
    assert out.count() > 0
    # canonical-URL dedup ran: at most one doc per canonical url
    urls = out.groupBy("url").count().agg(F.max("count")).collect()[0][0]
    assert urls == 1


def test_gopher_preset_word_floor_applies(spark, docs):
    from dataclasses import replace

    thr = dict(_RELAXED_GOPHER, min_words=30)
    cfg = replace(presets.gopher_preset(), quality_thresholds=thr)
    out = prep_documents(docs.drop("url"), cfg)
    n = out.count()
    assert 0 < n <= 120
    # the 30-word floor really applied
    short = out.filter(F.size(F.split(F.trim("text"), r"\s+")) < 30).count()
    assert short == 0


def test_refinedweb_preset_composition(spark, docs):
    from dataclasses import replace

    blocked = spark.createDataFrame([("h3.example",)], "domain string")
    cfg = replace(presets.refinedweb_preset(url_blocklist=blocked),
                  quality_thresholds=_RELAXED_GOPHER)
    out = prep_documents(docs, cfg)
    assert out.count() > 0
    assert out.filter(F.col("url").contains("h3.example")).count() == 0


def test_gpt3_preset_scrubs_benchmark_grams(spark, docs):
    bench = docs.limit(2).select("doc_id", "text")
    cfg = presets.gpt3_decontaminated_preset(benchmark=bench)
    assert cfg.decon_n == 13
    out = prep_documents(docs, cfg)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # the benchmark docs themselves are 100%-overlap and must be gone
    bench_ids = {r["doc_id"] for r in bench.collect()}
    assert not (kept & bench_ids)


def test_preset_knobs_are_overridable():
    from dataclasses import replace

    cfg = replace(presets.gopher_preset(), neardup_threshold=0.9)
    assert cfg.neardup_threshold == 0.9
    assert cfg.quality_thresholds["max_words"] == 100_000
