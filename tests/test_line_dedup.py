"""CCNet per-line dedup (operators/line_dedup.py): boilerplate removal
semantics in both modes, blank-line handling, an exact DuckDB twin on a
planted corpus, and plan sanity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from llmxmapreduce_spark.operators.line_dedup import line_dedup

NAV = "Home | About | Contact"


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    return {r["doc_id"]: r for r in line_dedup(df, **kw).collect()}


def test_drop_all_removes_every_copy(spark):
    rows = _run(spark, [
        NAV + "\nunique alpha text.\n" + NAV,     # 0: nav twice
        "  " + NAV + "  \nunique beta text.",     # 1: indented copy
        "unique gamma text.",                     # 2: clean
        None,                                     # 3: null
        "\n\n",                                   # 4: blank lines only
    ])
    assert rows[0]["clean_text"] == "unique alpha text."
    assert rows[0]["n_lines"] == 3 and rows[0]["n_removed_lines"] == 2
    # trimmed-key match: the indented copy goes too
    assert rows[1]["clean_text"] == "unique beta text."
    assert rows[2]["clean_text"] == "unique gamma text."
    assert rows[2]["n_removed_lines"] == 0
    assert rows[3]["clean_text"] == "" and rows[3]["n_lines"] == 0
    assert rows[4]["clean_text"] == "" and rows[4]["n_lines"] == 0
    assert rows[4]["n_removed_lines"] == 0


def test_keep_owner_keeps_min_occurrence(spark):
    rows = _run(spark, [
        "top quote line\nfiller one.",
        "filler two.\ntop quote line",
    ], mode="keep_owner")
    assert rows[0]["clean_text"] == "top quote line\nfiller one."
    assert rows[1]["clean_text"] == "filler two."
    assert rows[1]["n_removed_lines"] == 1


def test_min_count_threshold(spark):
    texts = [NAV + "\na.", NAV + "\nb.", NAV + "\nc."]
    # appears 3 times: survives min_count=4, dies at min_count=3
    rows4 = _run(spark, texts, min_count=4)
    assert rows4[0]["n_removed_lines"] == 0
    rows3 = _run(spark, texts, min_count=3)
    assert all(rows3[i]["clean_text"] == t for i, t in
               zip(range(3), ["a.", "b.", "c."]))


def test_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        line_dedup(df, min_count=1)
    with pytest.raises(ValueError):
        line_dedup(df, mode="nope")


_TWIN = """
WITH l AS (
  SELECT doc_id,
    list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                               (x, i) -> {{'pos': i-1, 'line': trim(x)}}),
                s -> s.line <> '') AS ls
  FROM pdf),
occ AS (
  SELECT doc_id, unnest(ls, recursive:=true) FROM l),
dup AS (
  SELECT line FROM occ GROUP BY line HAVING count(*) >= {min_count}),
kept AS (
  SELECT o.* FROM occ o ANTI JOIN dup d ON o.line = d.line),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT l.doc_id, coalesce(r.clean_text, '') AS clean_text,
       len(l.ls) AS n_lines,
       len(l.ls) - coalesce(r.n_kept, 0) AS n_removed_lines
FROM l LEFT JOIN rebuilt r USING (doc_id) ORDER BY doc_id
"""


def test_duckdb_twin_on_planted_corpus(spark):
    rng = np.random.default_rng(43)
    vocab = "sun tree bird rock rain mist leaf moss".split()

    def line():
        return " ".join(rng.choice(vocab)
                        for _ in range(int(rng.integers(2, 6)))) + "."

    docs = ["\n".join(line() for _ in range(int(rng.integers(1, 8))))
            for _ in range(50)]
    # plant boilerplate into 12 docs, sometimes indented / double
    for d in range(12):
        parts = docs[d].split("\n")
        parts.insert(int(rng.integers(0, len(parts))),
                     ("   " + NAV) if d % 3 else NAV)
        docs[d] = "\n".join(parts)
    docs.append(NAV)                      # a doc that is ONLY boilerplate

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})  # noqa: F841
    duck = duckdb.sql(_TWIN.format(min_count=2)).df()
    got = sorted(_run(spark, docs).values(), key=lambda r: r["doc_id"])
    assert len(got) == len(duck)
    removed = 0
    for srow in got:
        i = srow["doc_id"]
        assert srow["clean_text"] == duck["clean_text"][i], i
        assert srow["n_lines"] == duck["n_lines"][i], i
        assert srow["n_removed_lines"] == duck["n_removed_lines"][i], i
        removed += srow["n_removed_lines"]
    assert removed >= 13
    assert got[-1]["clean_text"] == ""


def test_plan_has_no_cartesian(spark):
    from llmxmapreduce_spark import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
