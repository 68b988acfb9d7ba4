"""Gopher + C4 quality filter rulesets (operators/quality_filters.py).

Gates: hand fixtures triggering each rule in isolation; a full DuckDB twin
over the real documents parquet (the same cross-engine pattern as
repetition_stats — every signal is int or int/int double, so values must
match EXACTLY); and a physical-plan pin that the whole stack stays
shuffle-free (no Exchange: it's one projected scan).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark import load_table
from llmxmapreduce_spark.operators import quality_filters as qf

SF = "/root/testdata/sf0.001"

GOOD = (
    "The quick brown fox jumps over the lazy dog near the river bank. "
    "It would often be seen there with a group of other animals that "
    "came to drink from the cool water every single morning. "
    "They would have gathered there for years, and the fox knew all of "
    "them by sight and smell. One day the fox decided to explore the far "
    "side of the river, and what it found there surprised everyone."
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_gopher_rules_fire_individually(spark):
    docs = {
        "good": GOOD,
        "too_short": "The cat sat on the mat.",
        "symbols": GOOD + " " + "# " * 60,
        "bullets": "\n".join(f"- {w}" for w in GOOD.split(". ")),
        "ellipsis": "\n".join(s + "..." for s in GOOD.split(". ")),
        "no_alpha": GOOD + " " + " ".join(["12345"] * 400),
        "no_stopwords": " ".join(["lorem"] * 80),
        "long_words": " ".join(["pneumonoultramicroscopic"] * 80),
    }
    names = list(docs)
    out = qf.gopher_signals(_df(spark, docs.values()))
    rows = {names[r["doc_id"]]: r for r in out.collect()}
    assert rows["good"]["gopher_pass"]
    assert not rows["too_short"]["gopher_pass"]
    assert rows["symbols"]["symbol_word_ratio"] > 0.1
    assert not rows["symbols"]["gopher_pass"]
    assert rows["bullets"]["bullet_line_ratio"] >= 0.9
    assert not rows["bullets"]["gopher_pass"]
    assert rows["ellipsis"]["ellipsis_line_ratio"] > 0.3
    assert not rows["ellipsis"]["gopher_pass"]
    assert rows["no_alpha"]["alpha_word_ratio"] < 0.8
    assert not rows["no_alpha"]["gopher_pass"]
    assert rows["no_stopwords"]["n_required_stopwords"] < 2
    assert not rows["no_stopwords"]["gopher_pass"]
    assert rows["long_words"]["mean_word_len"] > 10
    assert not rows["long_words"]["gopher_pass"]


def test_c4_rules_fire_individually(spark):
    docs = {
        "good": GOOD.replace(". ", ".\n"),
        "lorem": GOOD.replace(". ", ".\n") + "\nlorem ipsum dolor sit amet.",
        "brace": GOOD.replace(". ", ".\n") + "\nfunction f() { return 1; }",
        "no_terminal": "a line with no ending\nanother dangling line",
        "few_sentences": "One short sentence here today.",
        "js": "Please enable javascript to view this page correctly okay.\n"
              + GOOD.replace(". ", ".\n"),
    }
    names = list(docs)
    out = qf.c4_signals(_df(spark, docs.values()))
    rows = {names[r["doc_id"]]: r for r in out.collect()}
    assert rows["good"]["c4_pass"]
    assert rows["lorem"]["has_lorem"] and not rows["lorem"]["c4_pass"]
    assert rows["brace"]["has_brace"] and not rows["brace"]["c4_pass"]
    assert rows["no_terminal"]["n_kept_lines"] == 0
    assert not rows["no_terminal"]["c4_pass"]
    assert not rows["few_sentences"]["c4_pass"]
    # the javascript LINE is dropped from clean text but the page survives
    assert "javascript" not in rows["js"]["c4_clean_text"]
    assert rows["js"]["c4_pass"]
    # clean text keeps only terminal-punct lines with >= 5 words
    for ln in rows["good"]["c4_clean_text"].split("\n"):
        assert ln.rstrip()[-1] in '.!?"' and len(ln.split()) >= 5


_DUCK_TWIN = r"""
WITH base AS (
    SELECT doc_id, text,
           regexp_split_to_array(trim(text), '\s+') AS ws,
           string_split(text, chr(10)) AS lns
    FROM read_parquet('{sf}/documents.parquet')
)
SELECT doc_id,
    len(ws) AS n_words,
    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
        / len(ws) AS mean_word_len,
    CAST(len(regexp_extract_all(text, '#'))
         + len(regexp_extract_all(text, '(\.\.\.|…)')) AS DOUBLE)
        / len(ws) AS symbol_word_ratio,
    CAST(len(list_filter(lns, l -> regexp_matches(l, '^\s*[-*•]')))
         AS DOUBLE) / len(lns) AS bullet_line_ratio,
    CAST(len(list_filter(lns, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
         AS DOUBLE) / len(lns) AS ellipsis_line_ratio,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
         AS DOUBLE) / len(ws) AS alpha_word_ratio,
    ({stopword_sum}) AS n_required_stopwords,
    len(list_filter(lns, l -> regexp_matches(l, '[.!?"]\s*$')
        AND len(regexp_split_to_array(trim(l), '\s+')) >= 5
        AND NOT contains(lower(l), 'javascript'))) AS n_kept_lines,
    len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
    contains(lower(text), 'lorem ipsum') AS has_lorem,
    contains(text, '{{') AS has_brace
FROM base ORDER BY doc_id
"""


def test_duckdb_twin_on_documents(spark):
    docs = load_table(spark, SF, "documents")
    out = (
        qf.c4_signals(qf.gopher_signals(docs))
        .select("doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
                "bullet_line_ratio", "ellipsis_line_ratio",
                "alpha_word_ratio", "n_required_stopwords", "n_kept_lines",
                "n_sentences", "has_lorem", "has_brace")
        .orderBy("doc_id").collect()
    )
    sw_sum = " + ".join(
        f"CAST(list_contains(list_transform(ws, w -> lower(w)), '{s}') AS INT)"
        for s in qf.REQUIRED_STOPWORDS)
    duck = duckdb.sql(
        _DUCK_TWIN.format(sf=SF, stopword_sum=sw_sum)).fetchall()
    assert len(out) == len(duck) == 500
    for srow, drow in zip(out, duck):
        for i, col in enumerate(out[0].asDict()):
            assert srow[col] == pytest.approx(drow[i], abs=0, rel=0), \
                f"doc {srow['doc_id']} col {col}: {srow[col]} != {drow[i]}"


def test_quality_filter_composition_and_plan(spark):
    docs = load_table(spark, SF, "documents")
    # the synthetic corpus is punctuation-free word bags — exactly what
    # these filters exist to drop; all 500 must fail both rulesets
    assert qf.quality_filter(docs).count() == 0
    # …and real prose mixed in survives both
    mixed = docs.select("doc_id", "text").union(
        _df(spark, [GOOD.replace(". ", ".\n")]).select(
            F.col("doc_id") + 10_000, "text"))
    both = qf.quality_filter(mixed)
    assert [r["doc_id"] for r in both.collect()] == [10_000]
    assert both.columns == mixed.columns
    # custom thresholds reach the right ruleset; unknown ones raise
    loose = qf.quality_filter(docs, min_required_stopwords=0,
                              rules=("gopher",))
    assert loose.count() > 0
    with pytest.raises(TypeError, match="unknown"):
        qf.quality_filter(docs, bogus_threshold=1)
    # a threshold aimed at a ruleset that is NOT running must raise, not
    # silently no-op (review finding)
    with pytest.raises(TypeError, match="target a ruleset"):
        qf.quality_filter(docs, min_sentences=0, rules=("gopher",))
    # one projected scan, zero exchanges — this must fuse into ingest
    plan = qf.quality_filter(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_filter_keep_clean_text(spark):
    """keep_clean_text feeds C4's LINE REMOVAL forward (ADVICE repro: a
    surviving page previously kept its 'javascript' / short / no-period
    lines because only the page gate applied)."""
    page = (GOOD.replace(". ", ".\n")
            + "\nenable javascript to view this page."
            + "\nshort line no period")
    out = qf.quality_filter(_df(spark, [page]), keep_clean_text=True) \
        .collect()
    assert len(out) == 1
    cleaned = out[0]["text"]
    assert "javascript" not in cleaned
    assert "short line no period" not in cleaned
    assert cleaned.startswith(GOOD.split(". ")[0])
    # schema unchanged; flag without the c4 ruleset is an error, not a
    # silent no-op
    with pytest.raises(TypeError, match="keep_clean_text"):
        qf.quality_filter(_df(spark, [page]), rules=("gopher",),
                          keep_clean_text=True)
