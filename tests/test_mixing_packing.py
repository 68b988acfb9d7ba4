"""Data mixing (operators/mixing.py) + sequence packing
(operators/packing.py): composition math, determinism, packing
invariants and efficiency."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators import mixing, packing

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# mixing
# ---------------------------------------------------------------------------

def test_mixture_plan_math():
    counts = {"web": 1000, "code": 100, "books": 50}
    plan = mixing.mixture_plan(counts, {"web": 0.5, "code": 0.25,
                                        "books": 0.25}, target_rows=200)
    assert plan["web"] == pytest.approx(0.1)
    assert plan["code"] == pytest.approx(0.5)
    assert plan["books"] == pytest.approx(1.0)          # capped, 200*0.25/50=1.0
    up = mixing.mixture_plan(counts, {"books": 1.0}, 150,
                             allow_upsample=True)
    assert up["books"] == pytest.approx(3.0)            # 3 epochs
    # weights renormalize over strata present in the data
    part = mixing.mixture_plan(counts, {"web": 1, "absent": 9}, 100)
    assert part == {"web": pytest.approx(0.1)}
    with pytest.raises(ValueError, match="no overlap"):
        mixing.mixture_plan(counts, {"absent": 1.0}, 10)


def test_temperature_weights():
    counts = {"web": 1000, "code": 100, "books": 0, "none": None}
    w1 = mixing.temperature_weights(counts, alpha=1.0)
    assert w1 == {"web": pytest.approx(1000 / 1100),
                  "code": pytest.approx(100 / 1100)}   # empty sources drop
    w0 = mixing.temperature_weights(counts, alpha=0.0)
    assert w0 == {"web": pytest.approx(0.5), "code": pytest.approx(0.5)}
    w = mixing.temperature_weights(counts, alpha=0.7)
    assert w["web"] / w["code"] == pytest.approx(10 ** 0.7)
    assert sum(w.values()) == pytest.approx(1.0)
    # the recipe composes with mixture_plan
    plan = mixing.mixture_plan({"web": 1000, "code": 100},
                               mixing.temperature_weights(
                                   {"web": 1000, "code": 100}, 0.0),
                               target_rows=200)
    assert plan == {"web": pytest.approx(0.1), "code": pytest.approx(1.0)}
    with pytest.raises(ValueError, match="alpha"):
        mixing.temperature_weights(counts, alpha=1.5)
    with pytest.raises(ValueError, match="no non-empty"):
        mixing.temperature_weights({"a": 0})


def test_stratified_sample_composition_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    sources = [r[0] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    a, b = sorted(sources)[:2]
    s1 = mixing.stratified_sample(docs, "source", {a: 0.5, b: 0.1}, seed=7)
    s2 = mixing.stratified_sample(docs, "source", {a: 0.5, b: 0.1}, seed=7)
    ids1 = sorted(r[0] for r in s1.select("doc_id").collect())
    assert ids1 == sorted(r[0] for r in s2.select("doc_id").collect())
    got = {r[0]: r[1] for r in s1.groupBy("source").count().collect()}
    n = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    assert set(got) <= {a, b}                         # others dropped
    assert got[a] / n[a] == pytest.approx(0.5, abs=0.15)
    with pytest.raises(ValueError, match="outside"):
        mixing.stratified_sample(docs, "source", {a: 1.5})


def test_mix_sources_hits_target_composition(spark):
    docs = load_table(spark, SF, "documents")
    n = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    two = sorted(n)[:2]
    target = sum(n[s] for s in two) // 2
    out = mixing.mix_sources(docs, {two[0]: 0.5, two[1]: 0.5}, target)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    for s in two:
        expect = min(target * 0.5, n[s])
        assert got.get(s, 0) == pytest.approx(expect, rel=0.25)
    assert "epoch" in out.columns


def test_mix_sources_capped_stratum_keeps_everything(spark):
    """Regression: a stratum whose rate caps at 1.0 (target demands more
    than it has, upsampling off) must contribute ALL its rows — the old
    fractional-part sampling silently emptied it."""
    docs = load_table(spark, SF, "documents")
    n = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    two = sorted(n)[:2]
    # ask for 5× what the two strata hold → both cap at 1.0
    out = mixing.mix_sources(docs, {s: 0.5 for s in two},
                             5 * sum(n[s] for s in two))
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert got == {s: n[s] for s in two}


def test_mix_sources_upsample_epochs(spark):
    docs = load_table(spark, SF, "documents")
    n = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    s0 = sorted(n)[0]
    # ask for 2.5 epochs of one source
    out = mixing.mix_sources(docs, {s0: 1.0}, int(n[s0] * 2.5),
                             allow_upsample=True)
    got = out.groupBy("epoch").count().orderBy("epoch").collect()
    epochs = {r["epoch"]: r["count"] for r in got}
    assert epochs[1] == n[s0] and epochs[2] == n[s0]   # whole copies
    assert epochs.get(0, 0) == pytest.approx(n[s0] * 0.5, rel=0.2)
    # total ≈ 2.5 epochs
    total = sum(epochs.values())
    assert total == pytest.approx(2.5 * n[s0], rel=0.1)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _len_df(spark, lengths):
    return spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(lengths)],
        "doc_id bigint, n_tokens bigint")


def test_packing_invariants(spark):
    rng = np.random.default_rng(11)
    lengths = list(rng.integers(10, 900, size=400)) + [3000, 2500]
    df = _len_df(spark, lengths)
    asg = packing.pack_assignments(df, max_tokens=2048).collect()
    # every doc exactly once
    assert sorted(r["doc_id"] for r in asg) == list(range(len(lengths)))
    by_seq = {}
    for r in asg:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq, rows in by_seq.items():
        if any(r["truncated"] for r in rows):
            assert len(rows) == 1 and rows[0]["n_tokens"] > 2048
        else:
            assert sum(r["n_tokens"] for r in rows) <= 2048
    # oversized docs flagged
    trunc = [r for r in asg if r["truncated"]]
    assert sorted(r["n_tokens"] for r in trunc) == [2500, 3000]


def test_packing_deterministic_and_efficient(spark):
    rng = np.random.default_rng(23)
    lengths = list(rng.integers(50, 1500, size=2000))
    df = _len_df(spark, lengths)
    a1 = packing.pack_assignments(df.repartition(8), 2048).collect()
    a2 = packing.pack_assignments(df.repartition(3), 2048).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    n_seqs = len({r["seq_id"] for r in a1})
    ideal = -(-sum(lengths) // 2048)      # ceil: perfect packing lower bound
    assert n_seqs <= 1.15 * ideal, (n_seqs, ideal)


def test_pack_sequences_materializes_text(spark):
    docs = [(i, " ".join(["w"] * (10 + 7 * (i % 13)))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = packing.pack_sequences(df, max_tokens=128).collect()
    assert sum(r["n_docs"] for r in out) == 60
    for r in out:
        if not r["truncated"]:
            assert r["total_tokens"] <= 128
            # concatenated text word count matches the token ledger
            assert len(r["text"].split()) == r["total_tokens"]
    assert not any(r["truncated"] for r in out)


def test_auto_bucket_sizing(spark):
    # tiny corpus → ONE bucket (near-sequential FFD); explicit n_buckets
    # still honored and remains deterministic
    rng = np.random.default_rng(5)
    lengths = list(rng.integers(100, 900, size=60))
    df = _len_df(spark, lengths)
    auto = packing.pack_assignments(df, 2048)
    assert auto.select((F.col("seq_id") / (1 << 40)).cast("int")
                       .alias("b")).distinct().count() == 1
    ideal = -(-sum(lengths) // 2048)
    n_auto = auto.select("seq_id").distinct().count()
    assert n_auto <= 1.15 * ideal
    spread = packing.pack_assignments(df, 2048, n_buckets=16)
    assert spread.select("doc_id").distinct().count() == 60


def test_pack_sequences_pluggable_tokenizer(spark):
    """pack_sequences(tokenizer=...) re-budgets on the given counter:
    a JVM Column-fn (BPE-ish regex) and a Python str→int callable both
    produce ledgers in THEIR unit, with budgets still respected."""
    from llmxmapreduce_spark.functions.text import token_count_bpe_ish

    docs = [(i, "word-" + " x.y ".join(["tok"] * (5 + 3 * (i % 7))))
            for i in range(40)] + [(99, None)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    # Column-fn path (stays JVM-side): totals equal the regexp counts
    out = packing.pack_sequences(df, max_tokens=64,
                                 tokenizer=token_count_bpe_ish).collect()
    want = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", F.coalesce(token_count_bpe_ish(F.col("text")),
                             F.lit(0)).alias("n")).collect()}
    assert sum(r["total_tokens"] for r in out) == sum(want.values())
    assert sum(r["n_docs"] for r in out) == 41
    for r in out:
        if not r["truncated"]:
            assert r["total_tokens"] <= 64
    # BPE-ish counts exceed whitespace counts on punctuated text — the
    # delta is exactly why the tokenizer must be pluggable
    ws_out = packing.pack_sequences(df, max_tokens=64).collect()
    assert sum(r["total_tokens"] for r in out) > \
        sum(r["total_tokens"] for r in ws_out)

    # Python-callable path (pandas UDF; null text → 0) — a LOCAL def, so
    # cloudpickle ships it by value (a test-module-level fn would pickle
    # by reference to a module the workers can't import)
    def four_chars_per_token(t: str) -> int:
        return (len(t) + 3) // 4

    out_py = packing.pack_sequences(df, max_tokens=64,
                                    tokenizer=four_chars_per_token).collect()
    want_py = {i: 0 if t is None else four_chars_per_token(t)
               for i, t in docs}
    assert sum(r["total_tokens"] for r in out_py) == sum(want_py.values())


def test_pack_sequences_tokenizer_spec_gated(spark):
    """String specs resolve lazily per executor; an uninstalled library
    surfaces as an ImportError at first batch, and an unknown scheme is
    rejected with the spec in the message."""
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id bigint, text string")
    with pytest.raises(Exception, match="tiktoken"):
        packing.pack_sequences(df, 64,
                               tokenizer="tiktoken:cl100k_base").collect()
    with pytest.raises(Exception, match="unknown tokenizer spec"):
        packing.pack_sequences(df, 64, tokenizer="nope:thing").collect()


def test_pack_rejects_bad_budget(spark):
    df = _len_df(spark, [10])
    with pytest.raises(ValueError, match="positive"):
        packing.pack_assignments(df, 0)


def test_pack_rejects_duplicate_ids(spark):
    """Regression: duplicate doc ids (what epoch upsampling emits) would
    cross-product in pack_sequences' text join and overfill bins — the
    per-bucket guard is complete because dup ids share a bucket."""
    df = spark.createDataFrame([(1, 10), (1, 10), (2, 5)],
                               "doc_id bigint, n_tokens bigint")
    with pytest.raises(Exception, match="duplicate"):
        packing.pack_assignments(df, 100).collect()


def test_corpus_prep_packs_upsampled_mix(spark):
    """mix(epochs>1) → pack composition: every (doc, epoch) copy packs
    exactly once via the composite uid, no sequence over budget."""
    from llmxmapreduce_spark.pipelines.corpus_prep import (CorpusPrepConfig,
                                                           run_corpus_prep)

    docs = load_table(spark, SF, "documents").limit(100) \
        .localCheckpoint(eager=True)
    src0 = docs.select("source").first()[0]
    n0 = docs.filter(F.col("source") == src0).count()
    out = run_corpus_prep(
        docs,
        CorpusPrepConfig(quality=False, span=0, max_tokens=2048,
                         neardup_threshold=1.01,   # keep every copy
                         mix_weights={src0: 1.0}, mix_target=3 * n0,
                         mix_upsample=True))
    rows = out.collect()
    # ~3 epochs of the stratum packed (exact count shifts slightly with
    # upstream dedup + the fractional draw)
    assert sum(r["n_docs"] for r in rows) >= 2.5 * n0
    assert all(r["total_tokens"] <= 2048 for r in rows
               if not r["truncated"])


def test_pack_sequences_null_text_counts_zero(spark):
    """Regression: null text must become 0 tokens, not -1 (which would
    INCREASE a bin's remaining capacity and overfill the budget)."""
    df = spark.createDataFrame(
        [(1, "five words right here now"), (2, None), (3, "tiny text")],
        "doc_id bigint, text string")
    rows = packing.pack_sequences(df, max_tokens=8).collect()
    assert sum(r["n_docs"] for r in rows) == 3
    assert all(r["total_tokens"] <= 8 and r["total_tokens"] >= 0
               for r in rows)
    with pytest.raises(Exception, match="negative"):
        packing.ffd_pack([(1, -1)], 10)


def test_mix_by_budget_hits_token_composition(spark):
    """Token-budget mixing: strata with very different doc lengths must
    land the TOKEN shares, which by-rows mixing would miss.  'a' docs are
    10× longer than 'b' docs; equal token weights → ~10× fewer 'a' ROWS
    than 'b' rows."""
    rows = ([(i, "a", 1000) for i in range(2000)]
            + [(i + 10_000, "b", 100) for i in range(2000)])
    d = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    out = mixing.mix_sources_by_budget(
        d, {"a": 0.5, "b": 0.5}, target_budget=360_000,
        budget_col="n_tok", seed=3)
    got = {r[0]: r[1] for r in
           out.groupBy("source").agg(F.sum("n_tok")).collect()}
    budget_each = 180_000                         # 360k split 50/50
    assert got["a"] == pytest.approx(budget_each, rel=0.15)
    assert got["b"] == pytest.approx(budget_each, rel=0.15)
    # and the row counts are wildly asymmetric — the point of the op
    nrows = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert nrows["b"] > 5 * nrows["a"]


def test_mix_by_budget_default_target_and_upsample(spark):
    rows = ([(i, "a", 10) for i in range(500)]
            + [(i + 10_000, "b", 10) for i in range(50)])
    d = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    # None → half the corpus budget (5500/2); b at weight .5 wants 1375
    # tokens but only has 500 → rate 2.75, so epochs repeat it
    out = mixing.mix_sources_by_budget(
        d, {"a": 0.5, "b": 0.5}, None, budget_col="n_tok",
        allow_upsample=True, seed=1)
    got = {r[0]: r[1] for r in
           out.groupBy("source").agg(F.sum("n_tok")).collect()}
    assert got["b"] == pytest.approx(1375, rel=0.25)
    assert out.filter("source = 'b' and epoch >= 1").count() >= 50


class TestSampleNPerStratum:
    def _df(self, spark):
        rows = [(i, f"s{i % 4}") for i in range(200)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_exact_counts_and_subset(self, spark):
        from llmxmapreduce_spark.operators.mixing import sample_n_per_stratum

        df = self._df(spark)
        out = sample_n_per_stratum(df, "source", n=7)
        by = {r["source"]: 0 for r in out.collect()}
        for r in out.collect():
            by[r["source"]] += 1
        assert by == {f"s{i}": 7 for i in range(4)}
        # small stratum: capped at its size
        small = sample_n_per_stratum(df.filter("doc_id < 6"), "source", n=7)
        assert small.count() == 6

    def test_pure_function_of_id_and_seed(self, spark):
        from llmxmapreduce_spark.operators.mixing import sample_n_per_stratum

        df = self._df(spark)
        a = sorted(map(tuple, sample_n_per_stratum(df, "source", 5).collect()))
        b = sorted(map(tuple, sample_n_per_stratum(
            df.repartition(11), "source", 5).collect()))
        assert a == b  # partitioning-independent, unlike sampleBy
        c = sorted(map(tuple, sample_n_per_stratum(
            df, "source", 5, seed=7).collect()))
        assert a != c  # seed actually steers the draw

    def test_n_validation(self, spark):
        import pytest as _pytest

        from llmxmapreduce_spark.operators.mixing import sample_n_per_stratum

        with _pytest.raises(ValueError, match="positive"):
            sample_n_per_stratum(self._df(spark), "source", 0)


def test_weighted_sample_exact_n_and_steering(spark):
    """A-ES weighted sampling (mixing.weighted_sample_n): exact sizes,
    weight steering (10x-weighted rows overrepresented ~proportionally),
    determinism under repartition, non-positive weights excluded."""
    from llmxmapreduce_spark.operators.mixing import weighted_sample_n

    df = spark.range(4_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).alias("heavy"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"),
        F.lit("s").alias("src"))
    got = weighted_sample_n(df, 400, "w", by="src")
    rows = got.collect()
    assert len(rows) == 400
    n_heavy = sum(1 for r in rows if r.heavy)
    # E[heavy] = 400 * 10/(10+1) ≈ 364; allow generous noise
    assert 320 <= n_heavy <= 395, n_heavy
    # determinism + partition invariance
    got2 = {r.doc_id for r in
            weighted_sample_n(df.repartition(13), 400, "w",
                              by="src").collect()}
    assert got2 == {r.doc_id for r in rows}
    # zero/negative/null weights never qualify
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)],
        "doc_id long, w double").withColumn("src", F.lit("s"))
    kept = {r.doc_id for r in
            weighted_sample_n(df2, 10, "w", by="src").collect()}
    assert kept == {4}


def test_weighted_sample_matches_duckdb_twin(spark):
    import duckdb

    from llmxmapreduce_spark import load_table
    from llmxmapreduce_spark.operators.mixing import (weighted_sample_n,
                                                      weighted_sample_sql)

    sfd = "/root/testdata/sf0.001"
    d = load_table(spark, sfd, "documents") \
        .select("doc_id", "lang", "n_chars")
    got = {(r.lang, r.doc_id) for r in
           weighted_sample_n(d, 20, "n_chars", by="lang")
           .select("lang", "doc_id").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sfd}/documents.parquet'")
    want = set(con.execute(weighted_sample_sql(
        "documents", 20, "n_chars", by="lang",
        cols="lang, doc_id")).fetchall())
    assert got == want and len(got) > 50
