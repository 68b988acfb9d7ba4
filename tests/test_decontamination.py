"""Benchmark decontamination (operators/decontamination.py): planted
overlap fixtures, the short-text partial-gram edge, an exact DuckDB twin
(gram-text keyed — same classes as the hash), and the broadcast plan pin."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators import decontamination as dc

N = 6  # test-sized n-gram (production default 13)

BENCH = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "pack my box with five dozen liquor jugs right now"),
    (2, "tiny example"),                       # < N words: partial gram
]


def _bench(spark):
    return spark.createDataFrame(BENCH, "doc_id bigint, text string")


def test_contamination_flags_planted(spark):
    corpus = spark.createDataFrame([
        # embeds a 7-word run from bench 0 → two 6-gram hits
        (10, "intro words then the quick brown fox jumps over the ending"),
        (11, "completely unrelated text about rivers and mountains in spring"
             " sunshine weather"),
        # shares only 5 consecutive words with bench 1 → NO 6-gram hit
        (12, "she did pack my box with five items yesterday evening"),
        (13, "tiny example"),                  # exact short match via partial
        (14, "the quick brown fox jumps over the lazy dog tonight and "
             "pack my box with five dozen liquor jugs right now"),  # hits both
        # a LONG doc embedding the SHORT (2-word) bench example — the
        # min(n, example length) rule must catch it via 2-grams
        (15, "a long document which quotes the tiny example answer deep "
             "inside its running text somewhere"),
    ], "doc_id bigint, text string")
    flags = {r["doc_id"]: r for r in
             dc.contamination_flags(corpus, _bench(spark), n=N).collect()}
    assert set(flags) == {10, 13, 14, 15}
    assert flags[15]["bench_ids"] == [2]
    assert flags[10]["n_matched_grams"] == 2       # two overlapping 6-grams
    assert flags[10]["bench_ids"] == [0]
    assert flags[13]["bench_ids"] == [2]
    assert flags[14]["n_bench_examples"] == 2
    assert sorted(flags[14]["bench_ids"]) == [0, 1]

    survivors = dc.decontaminate(corpus, _bench(spark), n=N)
    assert sorted(r["doc_id"] for r in survivors.collect()) == [11, 12]
    assert survivors.columns == corpus.columns
    # a stricter threshold lets single-gram hits through
    loose = dc.decontaminate(corpus, _bench(spark), n=N,
                             min_matched_grams=3)
    assert sorted(r["doc_id"] for r in loose.collect()) == [10, 11, 12, 13, 15]


_TWIN = """
WITH cg AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) >= {n}
         THEN [array_to_string(ws[i:i+{n_m1}], ' ')
               for i in range(1, len(ws) - {n} + 2)]
         ELSE [array_to_string(ws, ' ')] END)) AS g
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        FROM corpus_pdf)),
bg AS (
  SELECT DISTINCT bench_id, g FROM (
    SELECT doc_id AS bench_id, unnest(list_distinct(
      CASE WHEN len(ws) >= {n}
           THEN [array_to_string(ws[i:i+{n_m1}], ' ')
                 for i in range(1, len(ws) - {n} + 2)]
           ELSE [array_to_string(ws, ' ')] END)) AS g
    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
          FROM bench_pdf)))
SELECT doc_id, count(DISTINCT g) AS n_matched_grams,
       count(DISTINCT bench_id) AS n_bench_examples
FROM cg JOIN bg USING (g) GROUP BY doc_id ORDER BY doc_id
"""


def test_duckdb_twin_on_planted_corpus(spark):
    rng = np.random.default_rng(29)
    vocab = "sun rain tree rock bird fish wind snow leaf star".split()

    def doc(k=20):
        return " ".join(rng.choice(vocab) for _ in range(k))

    bench_rows = [(i, doc(15)) for i in range(5)]
    corpus_rows = [(i, doc(25)) for i in range(40)]
    # plant: copy an N+2-word window from each bench doc into 10 corpus docs
    for j in range(10):
        src = bench_rows[j % 5][1].split()
        window = " ".join(src[2:2 + N + 2])
        corpus_rows.append((100 + j, doc(8) + " " + window + " " + doc(8)))

    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string")
    got = sorted(
        dc.contamination_flags(corpus, bench, n=N).collect(),
        key=lambda r: r["doc_id"])

    corpus_pdf = pd.DataFrame(corpus_rows, columns=["doc_id", "text"])  # noqa: F841
    bench_pdf = pd.DataFrame(bench_rows, columns=["doc_id", "text"])    # noqa: F841
    duck = duckdb.sql(_TWIN.format(n=N, n_m1=N - 1)).fetchall()
    assert [(r["doc_id"], r["n_matched_grams"], r["n_bench_examples"])
            for r in got] == duck
    assert len(got) >= 10                       # every planted doc flagged


def test_mask_contamination(spark):
    corpus = spark.createDataFrame([
        (10, "intro words here then the quick brown fox jumps over the "
             "ending part stays"),
        (11, "totally clean text with  odd   spacing preserved as tokens"),
        (13, "tiny example"),                  # fully covered by partial gram
    ], "doc_id bigint, text string")
    corpus = corpus.union(spark.createDataFrame(
        [(15, "quoting the tiny example here verbatim works")],
        corpus.schema))
    out = {r["doc_id"]: r for r in
           dc.mask_contamination(corpus, _bench(spark), n=N).collect()}
    # doc 10: grams at word-positions 4 and 5 match bench 0 → words 4..10
    # masked, prefix (0..3) and suffix (11..) survive
    assert out[10]["clean_text"] == "intro words here then ending part stays"
    assert out[10]["n_masked_words"] == 7
    # clean doc: untouched content, whitespace normalized to single spaces
    assert out[11]["n_masked_words"] == 0
    assert out[11]["clean_text"] == \
        "totally clean text with odd spacing preserved as tokens"
    # short doc fully covered by its partial gram
    assert out[13]["clean_text"] == "" and out[13]["n_masked_words"] == 2
    # the short bench example quoted INSIDE a long doc masks exactly its
    # 2-word window (min(n, example length) rule)
    assert out[15]["clean_text"] == "quoting the here verbatim works"
    assert out[15]["n_masked_words"] == 2
    # every input row returns
    assert set(out) == {10, 11, 13, 15}


def test_bloom_path_no_false_negatives(spark):
    """Bloom flags ⊇ exact flags (the no-false-negative guarantee), and on
    a clean corpus the over-flag rate stays near the filter's fpp."""
    rng = np.random.default_rng(37)
    vocab = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn".split()

    def doc(k=30):
        return " ".join(rng.choice(vocab) for _ in range(k))

    bench_rows = [(i, doc(20)) for i in range(8)] + [(98, None)]
    corpus_rows = [(i, doc()) for i in range(120)] + [(99, None)]
    for j in range(15):   # plant overlaps
        src = bench_rows[j % 8][1].split()
        corpus_rows.append((200 + j,
                            doc(6) + " " + " ".join(src[3:3 + N + 3])
                            + " " + doc(6)))
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string")

    exact = {r["doc_id"]: r["n_matched_grams"] for r in
             dc.contamination_flags(corpus, bench, n=N).collect()}
    bloom = dc.build_gram_bloom(bench, n=N, bits_per_key=12)
    flagged = {r["doc_id"]: r["n_flagged_grams"] for r in
               dc.contamination_flags_bloom(corpus, bloom, n=N).collect()}
    # every exact hit flagged, with at least as many grams
    for d, cnt in exact.items():
        assert flagged.get(d, 0) >= cnt, d
    # the random corpus shares vocab → exact hits happen; bloom extras
    # must stay a small minority (fpp ~1% per gram, docs have ~25 grams)
    extras = set(flagged) - set(exact)
    assert len(extras) <= 0.2 * len(corpus_rows), extras
    # null rows never crash or flag (ADVICE repro: np.array(None) killed
    # the old build/probe)
    assert 99 not in flagged
    # deterministic build
    assert dc.build_gram_bloom(bench, n=N, bits_per_key=12)[0] == bloom[0]


def test_bloom_distinct_cap_sizing(spark):
    """Review repro: a benchmark with heavy cross-doc duplication inflated
    m by the duplication factor (m sized from summed word counts).  With
    the distinct-cap active, m must shrink toward the true distinct-gram
    count — while keeping the no-false-negative guarantee bit-for-bit."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # 200 copies of the same 10-word doc: word-count bound = 2000 keys,
    # true distinct grams = 5 (10-word doc, N=6 → 5 six-grams)
    bench_rows = [(i, base) for i in range(200)]
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string")
    capped = dc.build_gram_bloom(bench, n=N, bits_per_key=24,
                                 distinct_cap_threshold=100)
    uncapped = dc.build_gram_bloom(bench, n=N, bits_per_key=24,
                                   distinct_cap_threshold=10**9)
    assert uncapped[1] >= 2000 * 24 - 8          # the inflated bound
    assert capped[1] <= 24 * 5 * 2               # ~distinct·bits, not bound
    # correctness unchanged: a corpus doc containing a benchmark gram is
    # flagged by BOTH filters
    corpus = spark.createDataFrame(
        [(1, "xx yy " + base + " zz"), (2, "totally unrelated words here"
          " none of which overlap at all truly")],
        "doc_id bigint, text string")
    for bloom in (capped, uncapped):
        flagged = {r["doc_id"] for r in
                   dc.contamination_flags_bloom(corpus, bloom, n=N)
                   .collect()}
        assert 1 in flagged


def test_bloom_matches_fast_hash_family(spark):
    """Build and probe now share the fast twin's polynomial hash family:
    at generous bits_per_key the Bloom flags equal the fast twin's
    EXACTLY (ids and per-doc gram counts) — deterministic, so a false
    positive would be a permanent, visible failure, not flake."""
    rng = np.random.default_rng(53)
    vocab = "red blue green gold pink teal grey cyan plum sage".split()

    def doc(k=28):
        return " ".join(rng.choice(vocab) for _ in range(k))

    bench_rows = [(i, doc(18)) for i in range(6)] + [(9, "zz short answer")]
    corpus_rows = [(i, doc()) for i in range(80)]
    for j in range(10):
        src = bench_rows[j % 6][1].split()
        corpus_rows.append((300 + j, doc(5) + " "
                            + " ".join(src[2:2 + N + 2]) + " " + doc(5)))
    corpus_rows.append((400, doc(9) + " zz short answer " + doc(9)))
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string")

    fast = {r["doc_id"]: r["n_matched_grams"] for r in
            dc.contamination_flags_fast(corpus, bench, n=N).collect()}
    bloom = dc.build_gram_bloom(bench, n=N, bits_per_key=32)
    flagged = {r["doc_id"]: r["n_flagged_grams"] for r in
               dc.contamination_flags_bloom(corpus, bloom, n=N).collect()}
    assert flagged == fast
    assert 400 in flagged                # short-rule hit via the Bloom path
    # min_parallelism repartitioned probe is identical
    wide = {r["doc_id"]: r["n_flagged_grams"] for r in
            dc.contamination_flags_bloom(corpus, bloom, n=N,
                                         min_parallelism=8).collect()}
    assert wide == fast


def test_mask_contamination_null_text(spark):
    """Null-text corpus rows report 0 words / 0 masked / empty clean_text
    (ADVICE repro: size(split(null)) = -1 leaked through as n_words)."""
    corpus = spark.createDataFrame(
        [(1, None), (2, "tiny example")], "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           dc.mask_contamination(corpus, _bench(spark), n=N).collect()}
    assert out[1]["n_words"] == 0
    assert out[1]["n_masked_words"] == 0
    assert out[1]["clean_text"] == ""
    assert out[2]["n_masked_words"] == 2   # fused single-scan path intact


def test_mask_contamination_single_scan(spark):
    """The fused gram-struct formulation reads the corpus ONCE even when
    short benchmark lengths add extra gram lengths — no per-length Union
    of corpus scans in the plan."""
    corpus = spark.createDataFrame([(1, "a b c d e f g h")],
                                   "doc_id bigint, text string")
    plan = dc.mask_contamination(corpus, _bench(spark), n=N) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_fast_twin_matches_exact(spark):
    """contamination_flags_fast must flag the same docs with the same
    distinct-gram counts as the exact Catalyst path (different hash
    family, same matching semantics — incl. the short-example rule)."""
    rng = np.random.default_rng(43)
    vocab = "qq ww ee rr tt yy uu oo pp aa".split()

    def doc(k=25):
        return " ".join(rng.choice(vocab) for _ in range(k))

    bench_rows = [(i, doc(15)) for i in range(4)] + [(9, "ss short answer")]
    corpus_rows = [(i, doc()) for i in range(60)]
    for j in range(8):
        src = bench_rows[j % 4][1].split()
        corpus_rows.append((100 + j, doc(5) + " "
                            + " ".join(src[1:1 + N + 2]) + " " + doc(5)))
    corpus_rows.append((200, doc(10) + " ss short answer " + doc(10)))
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string")

    exact = {r["doc_id"]: r["n_matched_grams"] for r in
             dc.contamination_flags(corpus, bench, n=N).collect()}
    fast = {r["doc_id"]: r["n_matched_grams"] for r in
            dc.contamination_flags_fast(corpus, bench, n=N).collect()}
    assert fast == exact
    assert 200 in fast                      # short-rule hit via fast path
    # repartitioned scan (min_parallelism) returns identical results
    wide = {r["doc_id"]: r["n_matched_grams"] for r in
            dc.contamination_flags_fast(corpus, bench, n=N,
                                        min_parallelism=8).collect()}
    assert wide == exact


def test_fast_twin_unicode_whitespace_parity(spark):
    """Regression (review repro): Java \\s is ASCII-only, Python
    str.split() is Unicode — an NBSP inside web text must tokenize the
    same on both paths or the twin contract breaks."""
    nbsp_text = "alpha beta gamma delta"     # NBSP joins alpha+beta
    bench = spark.createDataFrame([(0, nbsp_text)],
                                  "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "prefix words " + nbsp_text + " suffix words"),
         (2, "alpha beta gamma delta plain spaces here")],
        "doc_id bigint, text string")
    exact = {r["doc_id"]: r["n_matched_grams"] for r in
             dc.contamination_flags(corpus, bench, n=3).collect()}
    fast = {r["doc_id"]: r["n_matched_grams"] for r in
            dc.contamination_flags_fast(corpus, bench, n=3).collect()}
    assert fast == exact


def test_plan_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f g")],
                                   "doc_id bigint, text string")
    plan = dc.contamination_flags(corpus, _bench(spark), n=N) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_null_texts_ignored_like_exact_path(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight"),
         (1, None)], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(10, "x the quick brown fox jumps over the lazy dog tonight y"),
         (11, None),
         (12, "clean words only in here today with nothing shared at all")],
        "doc_id bigint, text string")
    exact = {r["doc_id"]: r["n_matched_grams"] for r in
             dc.contamination_flags(corpus, bench, n=N).collect()}
    fast = {r["doc_id"]: r["n_matched_grams"] for r in
            dc.contamination_flags_fast(corpus, bench, n=N).collect()}
    assert fast == exact
    assert 11 not in fast                  # null corpus text never flagged


def test_nonbroadcast_flags_equal_and_shuffle_join(spark):
    """broadcast_bench=False (the train-vs-holdout scrub shape, where the
    reference side scale-grows with the corpus) must return the same
    flags as the broadcast default — and must actually take the shuffle
    join when Spark's auto-broadcast is off (the hint, by contrast,
    forces a broadcast regardless of the threshold)."""
    corpus = spark.createDataFrame([
        (10, "intro words then the quick brown fox jumps over the ending"),
        (13, "tiny example"),
        (12, "she did pack my box with five items yesterday evening"),
    ], "doc_id bigint, text string")
    want = sorted(
        (r["doc_id"], r["n_matched_grams"], r["n_bench_examples"]) for r in
        dc.contamination_flags(corpus, _bench(spark), n=N).collect())
    got_df = dc.contamination_flags(corpus, _bench(spark), n=N,
                                    broadcast_bench=False)
    got = sorted((r["doc_id"], r["n_matched_grams"], r["n_bench_examples"])
                 for r in got_df.collect())
    assert got == want and len(got) == 2

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = dc.contamination_flags(
            corpus, _bench(spark), n=N, broadcast_bench=False) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        hinted = dc.contamination_flags(corpus, _bench(spark), n=N) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hinted or "BroadcastExchange" in hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_shuffled_fast_path_matches_exact_flags(spark):
    """contamination_flags_shuffled (vectorized poly-hash grams + shuffle
    join — the train-vs-heldout scrub's production path) must agree with
    the exact Catalyst path on flags, counts, and offending ids,
    including the short-example rule and null texts on both sides."""
    corpus = spark.createDataFrame([
        (10, "intro words then the quick brown fox jumps over the ending"),
        (11, "completely unrelated text about rivers and mountains in "
             "spring sunshine weather"),
        (13, "tiny example"),
        (14, "the quick brown fox jumps over the lazy dog tonight and "
             "pack my box with five dozen liquor jugs right now"),
        (15, "a long document which quotes the tiny example answer deep "
             "inside its running text somewhere"),
        (16, None),
    ], "doc_id bigint, text string")
    bench = spark.createDataFrame(
        BENCH + [(3, None)], "doc_id bigint, text string")

    def norm(df):
        return sorted(
            (r["doc_id"], r["n_matched_grams"], r["n_bench_examples"],
             tuple(r["bench_ids"])) for r in df.collect())

    exact = norm(dc.contamination_flags(corpus, bench, n=N))
    fast = norm(dc.contamination_flags_shuffled(corpus, bench, n=N))
    assert fast == exact
    assert {r[0] for r in fast} == {10, 13, 14, 15}
