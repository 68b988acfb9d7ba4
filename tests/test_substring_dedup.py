"""Lee et al. ExactSubstr dedup (operators/substring_dedup.py): semantic
fixtures (maximal-span extension, cross-doc, within-doc, full-dup,
short-doc, case-sensitivity), an exact DuckDB twin on a randomized
planted corpus, and plan sanity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from llmxmapreduce_spark.operators.substring_dedup import (
    duplicate_window_mask, substring_dedup)


def _run(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    return {r["doc_id"]: r for r in substring_dedup(df, n=n).collect()}


def test_semantics_fixtures(spark):
    rows = _run(spark, [
        "a b c d e f",          # 0: owner of everything it shares
        "x y a b c d q",        # 1: embeds a 4-word run from 0 (n=3 →
                                #    two consecutive dup windows → the
                                #    UNION removes the whole 4-word span)
        "a b c d e f",          # 2: full duplicate of 0
        "a b",                  # 3: shorter than n — never triggers
        "p q r z p q r",        # 4: within-doc repeat, owner pos 0
        "A B C D E F",          # 5: case differs from 0 — no match
        None,                   # 6: null text
    ], n=3)
    assert rows[0]["clean_text"] == "a b c d e f"
    assert rows[0]["n_removed_words"] == 0
    # maximal-span behaviour: consecutive dup windows merge — all 4
    # shared words go, not just one window
    assert rows[1]["clean_text"] == "x y q"
    assert rows[1]["n_removed_words"] == 4
    assert rows[2]["clean_text"] == "" and rows[2]["n_removed_words"] == 6
    assert rows[3]["clean_text"] == "a b" and rows[3]["n_removed_words"] == 0
    assert rows[4]["clean_text"] == "p q r z"
    assert rows[4]["n_removed_words"] == 3
    assert rows[5]["clean_text"] == "A B C D E F"
    assert rows[6]["clean_text"] == "" and rows[6]["n_words"] == 0
    assert rows[6]["n_removed_words"] == 0


def test_owner_is_deterministic_min(spark):
    """The kept occurrence is the lexicographically smallest (doc_id,
    pos), independent of input order."""
    texts = ["z z z w1 w2 w3", "w1 w2 w3 k k k"]
    rows = _run(spark, texts, n=3)
    assert rows[0]["clean_text"] == "z z z w1 w2 w3"   # doc 0 owns
    assert rows[1]["clean_text"] == "k k k"
    rev = _run(spark, texts[::-1], n=3)                # same content swapped
    assert rev[0]["clean_text"] == "w1 w2 w3 k k k"    # now doc 0 owns
    assert rev[1]["clean_text"] == "z z z"


def test_mask_audit_matches_dedup(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "q a b c d")], "doc_id bigint, text string")
    mask = duplicate_window_mask(df, n=4).collect()
    assert [(r["doc_id"], r["pos"]) for r in mask] == [(1, 1)]
    out = {r["doc_id"]: r for r in substring_dedup(df, n=4).collect()}
    assert out[1]["clean_text"] == "q" and out[1]["n_removed_words"] == 4


_TWIN = """
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
                t -> t <> '') AS ws
  FROM pdf),
words AS (
  SELECT doc_id, unnest([{{'pos': i-1, 'word': ws[i]}}
                         for i in range(1, len(ws)+1)], recursive:=true)
  FROM w),
wins AS (
  SELECT doc_id,
         unnest([{{'pos': i-1, 'g': array_to_string(ws[i:i+{nm1}], ' ')}}
                 for i in range(1, greatest(len(ws)-{n}+1, 0)+1)],
                recursive:=true)
  FROM w),
owners AS (SELECT g, count(*) AS c, min(doc_id*1000000+pos) AS owner
           FROM wins GROUP BY g),
removed AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos+{n})) AS pos
  FROM wins s JOIN owners o USING (g)
  WHERE o.c > 1 AND s.doc_id*1000000 + s.pos <> o.owner),
kept AS (
  SELECT wd.* FROM words wd ANTI JOIN removed r
    ON wd.doc_id = r.doc_id AND wd.pos = r.pos),
rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT w.doc_id, coalesce(r.clean_text, '') AS clean_text,
       len(w.ws) AS n_words,
       len(w.ws) - coalesce(r.n_kept, 0) AS n_removed_words
FROM w LEFT JOIN rebuilt r USING (doc_id) ORDER BY doc_id
"""


def test_duckdb_twin_on_planted_corpus(spark):
    """Random corpus with planted shared runs: Spark (hash-keyed windows)
    must equal the DuckDB twin (window-text-keyed) row for row."""
    rng = np.random.default_rng(29)
    vocab = "cat dog sun moon tree rock fish bird rain snow".split()
    n = 5

    def rand_words(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    docs = [rand_words(int(rng.integers(3, 30))) for _ in range(40)]
    docs[0] = rand_words(15)   # ≥ n words: the verbatim copy below must fire
    # plant: docs 40..49 embed a 7-word run copied from doc d%5 (two
    # overlapping dup windows at n=5 → maximal-span union), doc 50 is a
    # verbatim copy of doc 0
    for d in range(10):
        src = docs[d % 5].split()
        run = " ".join((src * 3)[:7])
        docs.append(rand_words(4) + " " + run + " " + rand_words(4))
    docs.append(docs[0])

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})  # noqa: F841
    duck = duckdb.sql(_TWIN.format(n=n, nm1=n - 1)).df()
    got = sorted(_run(spark, docs, n).values(), key=lambda r: r["doc_id"])
    assert len(got) == len(duck)
    total_removed = 0
    for srow in got:
        i = srow["doc_id"]
        assert srow["clean_text"] == duck["clean_text"][i], i
        assert srow["n_words"] == duck["n_words"][i], i
        assert srow["n_removed_words"] == duck["n_removed_words"][i], i
        total_removed += srow["n_removed_words"]
    assert total_removed > 0, "planted runs must actually collapse"
    assert got[50]["clean_text"] == ""


def test_fast_mode_equals_catalyst(spark):
    """The Arrow rolling-hash occurrence scan (mode='fast') must produce
    the identical result as the Catalyst window-string path — different
    hash family, same equivalence classes."""
    rng = np.random.default_rng(31)
    vocab = "aa Bb cc DD ee ff g hh".split()
    docs = [" ".join(rng.choice(vocab) for _ in range(int(rng.integers(2, 25))))
            for _ in range(60)]
    docs += [docs[3], docs[7] + " " + docs[3]]          # planted dups
    # NBSP is NOT whitespace to Java \\s: "ee\xa0ff" must stay ONE word
    # in BOTH paths (the fast tokenizer is pinned ASCII-only)
    docs += ["aa Bb ee\u00a0ff cc DD g", "aa Bb ee\u00a0ff cc DD hh"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)] + [(len(docs), None)],
        "doc_id bigint, text string")
    a = {r["doc_id"]: r for r in substring_dedup(df, n=4).collect()}
    b = {r["doc_id"]: r
         for r in substring_dedup(df, n=4, mode="fast").collect()}
    assert set(a) == set(b)
    removed = 0
    for k in a:
        assert a[k]["clean_text"] == b[k]["clean_text"], k
        assert a[k]["n_removed_words"] == b[k]["n_removed_words"], k
        removed += a[k]["n_removed_words"]
    assert removed > 0


def test_mode_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        substring_dedup(df, n=2, mode="nope")


def test_plan_has_no_cartesian(spark):
    from llmxmapreduce_spark import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = substring_dedup(docs, n=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
