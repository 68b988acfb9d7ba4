"""C4 three-sentence span dedup (operators/span_dedup.py): semantic
fixtures (cross-doc, within-doc, full-dup, short-doc cases) + an exact
DuckDB twin on a randomized planted corpus + plan sanity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from llmxmapreduce_spark.operators.span_dedup import span_dedup

A = "Aa one. Bb two! Cc three? Dd four. Ee five."


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    return {r["doc_id"]: r for r in span_dedup(df).collect()}


def test_semantics_fixtures(spark):
    rows = _run(spark, [
        A,                                            # 0: owner of all spans
        "Xx. Bb two! Cc three? Dd four. Zz end.",     # 1: shares A's s1..s3
        A,                                            # 2: full duplicate of 0
        "Too short. Only two.",                       # 3: < span sentences
        "Pp p. Qq q! Rr r? Ss s. Pp p. Qq q! Rr r? Tt t.",  # 4: within-doc
    ])
    assert rows[0]["clean_text"] == A and rows[0]["n_removed"] == 0
    assert rows[1]["clean_text"] == "Xx. Zz end." and rows[1]["n_removed"] == 3
    assert rows[2]["clean_text"] == "" and rows[2]["n_removed"] == 5
    assert rows[3]["clean_text"] == "Too short. Only two."
    assert rows[3]["n_sentences"] == 2 and rows[3]["n_removed"] == 0
    # within-doc repeat: the second occurrence of (Pp,Qq,Rr) is removed;
    # pos-4..6 are covered by dup spans at 4 (and 3: Ss,Pp,Qq? unique) —
    # exactly the 3 repeated sentences go
    assert rows[4]["n_removed"] == 3
    assert rows[4]["clean_text"] == "Pp p. Qq q! Rr r? Ss s. Tt t."


def test_every_input_row_returns(spark):
    rows = _run(spark, [A, A, A, "One sentence only."])
    assert set(rows) == {0, 1, 2, 3}
    assert rows[1]["clean_text"] == "" and rows[2]["clean_text"] == ""


_TWIN = """
WITH sents AS (
  SELECT doc_id,
    list_filter(list_transform(
      string_split(regexp_replace(text, '([。！？；.?!;])', '\\1' || chr(1), 'g'),
                   chr(1)),
      s -> regexp_replace(s, '^\\s+|\\s+$', '', 'g')), s -> s <> '') AS sents
  FROM pdf),
sentences AS (
  SELECT doc_id, unnest([{{'pos': i-1, 'sentence': sents[i]}}
                         for i in range(1, len(sents)+1)], recursive:=true)
  FROM sents),
spans AS (
  SELECT doc_id,
         unnest([{{'pos': i-1,
                   'sp': array_to_string(sents[i:i+{span_m1}], chr(1))}}
                 for i in range(1, greatest(len(sents)-{span}+1,0)+1)],
                recursive:=true)
  FROM sents),
owners AS (SELECT sp, min(doc_id*100000 + pos) AS owner FROM spans GROUP BY sp),
removed AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos+{span})) AS pos
  FROM spans s JOIN owners o USING (sp)
  WHERE s.doc_id*100000 + s.pos <> o.owner),
kept AS (
  SELECT st.* FROM sentences st ANTI JOIN removed r
    ON st.doc_id=r.doc_id AND st.pos=r.pos),
rebuilt AS (
  SELECT doc_id, string_agg(sentence, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT s.doc_id, coalesce(r.clean_text,'') AS clean_text,
       len(s.sents) AS n_sentences,
       len(s.sents)-coalesce(r.n_kept,0) AS n_removed
FROM sents s LEFT JOIN rebuilt r USING (doc_id) ORDER BY doc_id
"""


def test_duckdb_twin_on_planted_corpus(spark):
    """Random corpus with planted shared spans: Spark (hash-keyed owners)
    must equal the DuckDB twin (span-text-keyed owners) row for row."""
    rng = np.random.default_rng(17)
    vocab = "cat dog sun moon tree rock fish bird rain snow".split()

    def sent():
        return " ".join(rng.choice(vocab)
                        for _ in range(int(rng.integers(3, 7)))) + "."

    docs = []
    for d in range(40):
        docs.append(" ".join(sent() for _ in range(int(rng.integers(2, 9)))))
    # plant: doc 40..49 each embeds a 3-sentence run copied from doc d%5
    for d in range(10):
        src_sents = docs[d % 5].split(". ")
        if len(src_sents) >= 3:
            run = ". ".join(src_sents[:3])
            if not run.endswith("."):
                run += "."
            docs.append(sent() + " " + run + " " + sent())
        else:
            docs.append(docs[d % 5])

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})  # noqa: F841
    duck = duckdb.sql(_TWIN.format(span=3, span_m1=2)).df()
    got = sorted(_run(spark, docs).values(), key=lambda r: r["doc_id"])
    assert len(got) == len(duck)
    total_removed = 0
    for srow in got:
        i = srow["doc_id"]
        assert srow["clean_text"] == duck["clean_text"][i], i
        assert srow["n_sentences"] == duck["n_sentences"][i], i
        assert srow["n_removed"] == duck["n_removed"][i], i
        total_removed += srow["n_removed"]
    assert total_removed > 0, "planted spans must actually collapse"


def test_multiline_span_copies_collapse(spark):
    """Regression: a span copied across documents must dedup even when one
    copy sits after a newline (F.trim keeps '\\n'; the operator must
    whitespace-trim sentences before hashing)."""
    src = "Aa one.\nBb two!\nCc three?\nDd four.\nEe five."
    embed = "Xx start.\n" + "\n".join(src.split("\n")[:3]) + "\nYy end."
    rows = _run(spark, [src, embed])
    assert rows[1]["n_removed"] == 3
    assert rows[1]["clean_text"] == "Xx start. Yy end."


def test_plan_has_no_cartesian(spark):
    from llmxmapreduce_spark import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = span_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
