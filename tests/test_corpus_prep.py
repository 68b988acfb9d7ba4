"""End-to-end corpus preparation (pipelines/corpus_prep.py): the glue test
— stage ordering + count monotonicity via StageMetrics, planted junk/PII/
dup removal visible in the packed output, packing invariants."""

import numpy as np
import pytest

from llmxmapreduce_spark.operators.stage_metrics import StageMetrics
from llmxmapreduce_spark.pipelines.corpus_prep import (CorpusPrepConfig,
                                                       run_corpus_prep)

# vocabulary rich in Gopher's required stopwords so generated prose passes
VOCAB = ("the of and that have with rain cloud river stone tree light "
         "morning water animal forest shadow bird evening".split())


def _sentence(rng, n=8):
    return " ".join(rng.choice(VOCAB) for _ in range(n)) + "."


def _doc(rng, n_sent=10):
    return "\n".join(_sentence(rng) for _ in range(n_sent))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(30):
        rows.append((i, _doc(rng), "web"))
    base0 = rows[0][1]
    # planted artifacts
    rows.append((100, "lorem ipsum dolor sit amet. " + _doc(rng), "web"))
    rows.append((101, "tiny junk", "web"))                       # fails quality
    rows.append((102, _doc(rng) + "\nWrite to leak@example.com and the ssn "
                 "123-45-6789 should not appear in the corpus today.", "web"))
    rows.append((103, base0, "web"))                             # exact dup of 0
    # near dup of doc 1: one word changed in every 3rd sentence, so NO
    # 3-sentence span matches doc 1 (span dedup can't touch it) but the
    # word-shingle Jaccard stays ≈0.75 — strictly the near-dup stage's job
    near_sents = rows[1][1].split("\n")
    for j in range(0, len(near_sents), 3):
        near_sents[j] = "thy" + str(j) + near_sents[j][near_sents[j].find(" "):]
    near = "\n".join(near_sents) + "\nUniqueMarkerNearDup " \
        "sentence with the word of and that have with more words."
    rows.append((104, near, "web"))                              # near dup of 1
    # shared 3-sentence span: doc 105 embeds doc 2's first three sentences
    span_src = rows[2][1].split("\n")[:3]
    rows.append((105, _doc(rng) + "\n" + "\n".join(span_src) + "\n"
                 + _sentence(rng), "web"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_corpus_prep_end_to_end(spark, corpus):
    sm = StageMetrics(spark)
    cfg = CorpusPrepConfig(max_tokens=256, neardup_threshold=0.6)
    packed = run_corpus_prep(corpus, cfg, stage_metrics=sm)
    seqs = packed.collect()

    rep = {r["stage"]: r for r in sm.report()}
    order = [r["stage"] for r in sm.report()]
    assert order == ["quality_redact", "exact_dedup", "span_dedup",
                     "near_dedup", "packing"]
    # stage counts through the dedup chain
    assert rep["quality_redact"]["rows_out"] < corpus.count()   # junk dropped
    assert rep["exact_dedup"]["rows_out"] < rep["quality_redact"]["rows_out"]
    # span dedup rewrites text, it only drops rows emptied entirely
    assert rep["span_dedup"]["rows_out"] <= rep["exact_dedup"]["rows_out"]
    assert rep["near_dedup"]["rows_out"] < rep["span_dedup"]["rows_out"]
    for s in order[:-1]:
        assert rep[s]["wall_s"] is not None and rep[s]["wall_s"] >= 0

    all_text = "\n".join(r["text"] for r in seqs)
    assert "lorem ipsum" not in all_text                 # C4 page drop
    assert "tiny junk" not in all_text                   # quality drop
    assert "123-45-6789" not in all_text                 # PII redacted…
    assert "<ssn>" in all_text and "<email>" in all_text  # …to typed tokens
    assert "UniqueMarkerNearDup" not in all_text         # near-dup loser gone
    # the shared 3-sentence span survives exactly once (doc 2 owns it;
    # doc 105's copy was cut out of its rewritten text)
    span_first = corpus.collect()
    src_line = next(r["text"] for r in span_first if r["doc_id"] == 2
                    ).split("\n")[0]
    assert all_text.count(src_line) == 1
    # packing invariants
    assert sum(r["n_docs"] for r in seqs) == rep["near_dedup"]["rows_out"]
    for r in seqs:
        if not r["truncated"]:
            assert r["total_tokens"] <= 256


def test_corpus_prep_with_mixing(spark, corpus):
    cfg = CorpusPrepConfig(max_tokens=256, neardup_threshold=0.6,
                           mix_weights={"web": 1.0}, mix_target=10)
    packed = run_corpus_prep(corpus, cfg)
    n_docs = sum(r["n_docs"] for r in packed.collect())
    assert 0 < n_docs <= 20                   # sampled well below survivors


def test_corpus_prep_default_mix_target_no_extra_job(spark, corpus):
    """mix_target=None is now derived inside mix_sources from the stratum-
    count aggregate it already runs: the e2e pipeline fires the SAME
    number of Spark jobs as with an explicit target (the old default paid
    a full-scan d.count() job mid-pipeline), and still samples to ~half
    the surviving rows."""
    base = dict(max_tokens=256, neardup_threshold=0.6,
                mix_weights={"web": 1.0})

    def n_jobs(cfg_kw):
        # count by MAX job id, not len(): the status tracker evicts old
        # ids past spark.ui.retainedJobs, so len() under-reports once a
        # long suite has run >1000 jobs in the shared session (observed
        # as an order-dependent failure at suite sizes >525 tests)
        st = spark.sparkContext.statusTracker()
        before = max(st.getJobIdsForGroup(), default=-1)
        run_corpus_prep(corpus, CorpusPrepConfig(**cfg_kw)) \
            .write.mode("overwrite").format("noop").save()
        return max(st.getJobIdsForGroup(), default=-1) - before

    explicit = n_jobs(dict(base, mix_target=10))
    default = n_jobs(dict(base, mix_target=None))
    assert default == explicit
    out = run_corpus_prep(corpus, CorpusPrepConfig(**dict(base,
                                                          mix_target=None)))
    n_docs = sum(r["n_docs"] for r in out.collect())
    assert 0 < n_docs <= 20          # ~half of the ~26 dedup survivors


def test_corpus_prep_splits_oversized_docs(spark):
    """split_oversized: a 600-word doc at max_tokens=128 becomes several
    packable parts — zero truncated sequences, no words lost."""
    rng = np.random.default_rng(3)
    vocab = "the of and have with river stone light".split()
    big = " ".join(rng.choice(vocab) for _ in range(600))
    small = " ".join(rng.choice(vocab) for _ in range(50))
    df = spark.createDataFrame(
        [(0, big, "web"), (1, small, "web")],
        "doc_id bigint, text string, source string")
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           neardup_threshold=1.01, max_tokens=128)
    rows = run_corpus_prep(df, cfg).collect()
    assert not any(r["truncated"] for r in rows)
    assert all(r["total_tokens"] <= 128 for r in rows)
    assert sum(r["total_tokens"] for r in rows) == 650   # nothing lost
    # with splitting off, the big doc lands in one flagged oversized bin
    cfg_off = CorpusPrepConfig(quality=False, redact=False, span=0,
                               neardup_threshold=1.01, max_tokens=128,
                               split_oversized=False)
    rows_off = run_corpus_prep(df, cfg_off).collect()
    assert sum(r["truncated"] for r in rows_off) == 1


def test_split_oversized_newline_separated_words(spark):
    """Regression (review repro): an oversized doc whose words are
    NEWLINE-separated must still split losslessly — the space-separated
    chunker previously dropped the whole doc."""
    rng = np.random.default_rng(9)
    vocab = "the of and have with river stone light".split()
    big_nl = "\n".join(rng.choice(vocab) for _ in range(600))
    df = spark.createDataFrame([(0, big_nl, "web")],
                               "doc_id bigint, text string, source string")
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           neardup_threshold=1.01, max_tokens=128)
    rows = run_corpus_prep(df, cfg).collect()
    assert sum(r["total_tokens"] for r in rows) == 600   # nothing lost
    assert not any(r["truncated"] for r in rows)


def test_corpus_prep_perplexity_gate(spark, corpus):
    """Optional CCNet LM stage: an LM trained on the corpus's own prose
    drops a planted out-of-vocabulary doc that the rule filters alone
    cannot catch (long enough, stopworded enough)."""
    from llmxmapreduce_spark.operators.lm_filter import (doc_perplexity,
                                                         train_bigram_lm)

    rng = np.random.default_rng(13)
    ood = " ".join("the of and".split()[i % 3] + f" xq{rng.integers(1e6)}"
                   for i in range(120)) + "."
    df = corpus.union(spark.createDataFrame(
        [(999, ood, "web")], corpus.schema))
    lm = train_bigram_lm(corpus.select("doc_id", "text"))
    # threshold between the natural corpus ppl band and the OOD doc
    ppl = {r["doc_id"]: r["perplexity"] for r in
           doc_perplexity(df, lm).collect()}
    cutoff = (max(p for i, p in ppl.items() if i != 999 and p) + 1)
    assert ppl[999] > cutoff
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           neardup_threshold=1.01, max_tokens=512,
                           lm=lm, max_perplexity=cutoff)
    out = run_corpus_prep(df, cfg)
    all_text = "\n".join(r["text"] for r in out.collect())
    assert "xq" not in all_text            # OOD doc gated by the LM
    assert "rain" in all_text or "cloud" in all_text


def test_corpus_prep_decontamination_stage(spark, corpus):
    """cfg.benchmark plants an eval doc whose 13-gram window one corpus
    doc quotes verbatim — the decon stage drops exactly that doc and the
    stage shows up in the telemetry."""
    rows = corpus.collect()
    window = " ".join(rows[4]["text"].split()[:15])
    bench = spark.createDataFrame([(0, window)], "doc_id bigint, text string")
    victim = rows[4]["doc_id"]
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           neardup_threshold=1.01, max_tokens=512,
                           benchmark=bench)
    sm = StageMetrics(spark)
    out = run_corpus_prep(corpus, cfg, stage_metrics=sm)
    all_text = "\n".join(r["text"] for r in out.collect())
    assert window not in all_text
    rep = {r["stage"]: r for r in sm.report()}
    assert "decontaminate" in rep
    assert rep["decontaminate"]["rows_out"] \
        == rep["near_dedup"]["rows_out"] - 1
    # the victim's unique later sentences are gone with it
    marker = rows[4]["text"].split("\n")[-1]
    assert victim is not None and marker not in all_text


def test_corpus_prep_substring_stage(spark, corpus):
    """cfg.substring_n masks a repeated >=n-word passage (boilerplate
    both docs quote) AFTER near-dedup: one copy survives, the other
    doc keeps its surrounding text, and the stage reports telemetry."""
    rng = np.random.default_rng(77)
    boiler = " ".join(rng.choice(VOCAB) for _ in range(12))
    extra = spark.createDataFrame(
        [(996, _doc(rng) + "\n" + boiler + ".", "web"),
         (997, boiler + ". " + _doc(rng), "web")],
        "doc_id bigint, text string, source string")
    df = corpus.union(extra)
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           neardup_threshold=1.01, max_tokens=512,
                           substring_n=10)
    sm = StageMetrics(spark)
    out = run_corpus_prep(df, cfg, stage_metrics=sm)
    all_text = "\n".join(r["text"] for r in out.collect())
    # exactly one surviving occurrence of the repeated passage
    assert all_text.count(boiler) == 1
    rep = {r["stage"]: r for r in sm.report()}
    assert "substring_dedup" in rep
    # passage masking keeps the documents (only doc 103, the exact dup,
    # is gone by this point)
    assert rep["substring_dedup"]["rows_out"] == rep["near_dedup"]["rows_out"]


def test_corpus_prep_badwords_gate(spark, corpus):
    """cfg.badwords drops the page containing a listed token; everything
    else flows through the normal stages."""
    rows = corpus.collect()
    poisoned = rows[3]["text"] + "\nand then a zorch appeared."
    df = corpus.union(spark.createDataFrame(
        [(998, poisoned, "web")], corpus.schema))
    bad = spark.createDataFrame([("zorch",)], "word string")
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           neardup_threshold=1.01, max_tokens=512,
                           badwords=bad)
    out = run_corpus_prep(df, cfg)
    all_text = "\n".join(r["text"] for r in out.collect())
    assert "zorch" not in all_text
    assert rows[0]["text"].split("\n")[0] in all_text


def test_corpus_prep_half_configured_lm_raises(spark, corpus):
    """lm without max_perplexity (or vice versa) must fail fast, not
    silently skip the gate (the quality_filter orphaned-threshold
    contract)."""
    from llmxmapreduce_spark.operators.lm_filter import train_bigram_lm

    lm = train_bigram_lm(corpus.select("doc_id", "text"))
    with pytest.raises(TypeError, match="must be set together"):
        run_corpus_prep(corpus, CorpusPrepConfig(lm=lm))
    with pytest.raises(TypeError, match="must be set together"):
        run_corpus_prep(corpus, CorpusPrepConfig(max_perplexity=100.0))


def test_corpus_prep_stages_can_disable(spark, corpus):
    cfg = CorpusPrepConfig(quality=False, redact=False, span=0,
                           max_tokens=512)
    sm = StageMetrics(spark)
    packed = run_corpus_prep(corpus, cfg, stage_metrics=sm)
    packed.write.mode("overwrite").format("noop").save()
    order = [r["stage"] for r in sm.report()]
    assert order == ["quality_redact", "exact_dedup", "near_dedup", "packing"]
    assert "span_dedup" not in order
    # with quality off, the junk/lorem docs survive to the dedup stages
    rep = {r["stage"]: r for r in sm.report()}
    assert rep["quality_redact"]["rows_out"] == corpus.count()


def test_corpus_prep_url_curation_stage(spark, corpus):
    """RefinedWeb §3.1 stage order: URL blocklist + canonical-URL dedup
    run FIRST (before any text-level stage), with their own
    StageMetrics row."""
    from pyspark.sql import functions as F

    docs = corpus.withColumn(
        "url",
        F.when(F.col("doc_id") == 5, F.lit("https://ads.spam.org/x"))
        .when(F.col("doc_id") == 6, F.lit("https://sub.spam.org/y"))
        .when(F.col("doc_id") == 7,
              F.lit("https://ok.org/page?utm_source=a"))
        .when(F.col("doc_id") == 8, F.lit("https://ok.org/page"))
        .otherwise(F.concat(F.lit("https://fine.net/"),
                            F.col("doc_id").cast("string"))))
    blocked = spark.createDataFrame([("spam.org",)], "domain string")
    sm = StageMetrics(spark)
    cfg = CorpusPrepConfig(url_blocklist=blocked, url_dedup=True,
                           max_tokens=256, neardup_threshold=0.6)
    run_corpus_prep(docs, cfg, stage_metrics=sm) \
        .write.mode("overwrite").format("noop").save()
    order = [r["stage"] for r in sm.report()]
    assert order[0] == "url_curation"
    rep = {r["stage"]: r for r in sm.report()}
    # 2 blocked-domain docs (exact + subdomain) + 1 canonical-URL dup
    # (utm-stripped 7 vs 8 → min id 7 wins)
    assert rep["url_curation"]["rows_out"] == corpus.count() - 3


def test_corpus_prep_url_curation_requires_column(spark, corpus):
    blocked = spark.createDataFrame([("spam.org",)], "domain string")
    with pytest.raises(TypeError, match="url"):
        run_corpus_prep(corpus, CorpusPrepConfig(url_blocklist=blocked))


def test_corpus_prep_shuffle_output(spark, corpus):
    """shuffle_output assigns a deterministic 0..n-1 train_pos over the
    packed sequences (the trainer's epoch order), reported as an
    'ordering' stage."""
    from llmxmapreduce_spark.operators.stage_metrics import StageMetrics

    sm = StageMetrics(spark)
    cfg = CorpusPrepConfig(max_tokens=256, neardup_threshold=0.6,
                           shuffle_output=True, seed=5)
    a = run_corpus_prep(corpus, cfg, stage_metrics=sm).collect()
    pos = sorted(r["train_pos"] for r in a)
    assert pos == list(range(len(a)))               # a permutation
    assert [r["stage"] for r in sm.report()][-1] == "ordering"
    # reproducible: same seed → identical positions per seq_id
    b = {r["seq_id"]: r["train_pos"]
         for r in run_corpus_prep(corpus, cfg).collect()}
    assert all(b[r["seq_id"]] == r["train_pos"] for r in a)


def test_stage_checkpoints_released(spark, corpus):
    """r12 audit: the stage cutter must release superseded stage frames
    (and stage-internal checkpoints) once the next cut materializes —
    a full prep+pack call may pin only the shield cut, the final
    inter-cut window, and the pack checkpoint, not one corpus frame
    per stage."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = run_corpus_prep(corpus, CorpusPrepConfig(max_tokens=256,
                                                   neardup_threshold=0.6))
    out.count()
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    leaked = after - before
    assert len(leaked) <= 5, (
        f"{len(leaked)} RDDs left pinned by run_corpus_prep; the stage "
        "cutter's supersede-release is not sweeping old stage frames")
