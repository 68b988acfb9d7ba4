"""Unit tests for functions/text.py against reference semantics.

Expected values are hand-derived from the reference implementations
(process_str.py, compute_scores.py, process_answer.py, digest.py) —
see each function's docstring for the file:line pointers.
"""

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions import text as X


def col_eval(spark, col, rows=None):
    """Evaluate a Column over one-row (or given) input."""
    df = spark.createDataFrame([(r,) for r in (rows or [None])], ["s"])
    return [r[0] for r in df.select(col.alias("out")).collect()]


def apply_str(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(fn(F.col("s")).alias("out")).collect()]


# -- P7 normalize_bibkey (proc_title_to_str, process_str.py:131-137) --------

@pytest.mark.parametrize("title,expected", [
    ("Foo's Bar", "foos_bar"),                # punctuation deleted, no separator
    ("Deep-Learning Survey", "deep_learning_survey"),  # '-' -> '_'
    ("  A  B ", "a__b".replace("__", "_")),   # collapse
    ("Attention Is All You Need!", "attention_is_all_you_need"),
    ("a--b  c", "a_b_c"),
])
def test_normalize_bibkey(spark, title, expected):
    assert X.normalize_bibkey_py(title) == expected
    assert apply_str(spark, X.normalize_bibkey, [title]) == [expected]


def test_normalize_bibkey_spark_matches_py(spark):
    cases = ["Foo: a (study) of B-C", "x__y", "UPPER lower", "Q&A; time", "tab\there"]
    got = apply_str(spark, X.normalize_bibkey, cases)
    assert got == [X.normalize_bibkey_py(c) for c in cases]


# -- P9 extract_md_block (parse_md_content, process_str.py:8-20) ------------

def test_extract_md_block_basic(spark):
    raw = "noise\n```markdown\n# Title\nbody\n```\ntrailer"
    df = spark.createDataFrame([(raw,)], ["s"])
    row = df.select(X.extract_md_block(F.col("s")).alias("r")).collect()[0]["r"]
    assert row["ok"] is True and row["value"] == "# Title\nbody"


def test_extract_md_block_duplicated_fence(spark):
    # Reference collapses ```markdown```markdown to one opener.
    raw = "```markdown```markdown\npayload\n```"
    df = spark.createDataFrame([(raw,)], ["s"])
    row = df.select(X.extract_md_block(F.col("s")).alias("r")).collect()[0]["r"]
    assert row["ok"] is True and row["value"] == "payload"


def test_extract_md_block_missing_and_nested(spark):
    rows = ["no fences here", "```markdown\nx ``` y\nz\n```"]
    df = spark.createDataFrame([(r,) for r in rows], ["s"])
    got = [r["r"] for r in df.select(X.extract_md_block(F.col("s")).alias("r")).collect()]
    assert got[0]["ok"] is False and "no fenced" in got[0]["err"]
    # payload still containing ``` (nested fence) -> rejected, as in the
    # reference's `if "```" in md_content: raise` (process_str.py:18-19)
    assert got[1]["ok"] is False


# -- P10 heading parse (get_section_title, process_str.py:22-29) ------------

@pytest.mark.parametrize("line,depth,title", [
    ("## 1.2 Background", 2, "Background"),
    ("# Introduction", 1, "Introduction"),
    ("### 3 Methods [cite_a]", 3, "Methods "),
    ("not a heading", 0, ""),
    ("##nospace", 0, ""),
])
def test_heading_parse(spark, line, depth, title):
    df = spark.createDataFrame([(line,)], ["s"])
    got = df.select(
        X.heading_depth(F.col("s")).alias("d"), X.heading_title(F.col("s")).alias("t")
    ).collect()[0]
    assert (got["d"], got["t"]) == (depth, title)


# -- P11 str2list / list2str (process_str.py:31-42) --------------------------

def test_str2list(spark):
    df = spark.createDataFrame([("['a', \"b\"] , c,, d ",)], ["s"])
    got = df.select(X.str2list(F.col("s")).alias("l")).collect()[0]["l"]
    assert got == ["a", "b", "c", "d"]


def test_list2str(spark):
    df = spark.createDataFrame([(["a", "b"],), ([],)], ["l"])
    got = [r[0] for r in df.select(X.list2str(F.col("l")).alias("s")).collect()]
    assert got == ["['a', 'b']", ""]


# -- P13 extract_answer (task_special_process, process_answer.py:27-57) ------

@pytest.mark.parametrize("reply,expected", [
    ("Rationale: x\nAnswer: 42 Confidence Score: 5", "42 "),
    ("Answer: first\nAnswer: second", "second"),
    ("no prefix at all", "no prefix at all"),
    ("ends with Answer:", "ends with Answer:"),  # nothing after -> unchanged
    ("Answer: keep Confidence Score: 3 tail Confidence Score: 5", "keep Confidence Score: 3 tail "),
])
def test_extract_answer(spark, reply, expected):
    assert apply_str(spark, X.extract_answer, [reply]) == [expected]


# -- P14 normalize_answer (compute_scores.py:16-32) --------------------------

@pytest.mark.parametrize("s,expected", [
    ("Don't Panic!", "dont panic"),
    ("U.S. and the_end", "us and theend"),  # '_' is punctuation too
    ("A man, a plan", "man plan"),
    ("  the  answer  is   42 ", "answer is 42"),
])
def test_normalize_answer(spark, s, expected):
    assert X.normalize_answer_py(s) == expected
    assert apply_str(spark, X.normalize_answer, [s]) == [expected]


# -- P15 sentence split (Generator.py:134-148) -------------------------------

def test_sentence_split(spark):
    df = spark.createDataFrame([("One. Two! Three? Four",)], ["s"])
    got = df.select(X.sentence_split(F.col("s")).alias("l")).collect()[0]["l"]
    assert got == ["One.", " Two!", " Three?", " Four"]


# -- P16 token counting ------------------------------------------------------

def test_token_count_ws_empty(spark):
    got = apply_str(spark, X.token_count_ws, ["", "   ", "a b  c"])
    assert got == [0, 0, 3]


def test_token_count_bpe_ish(spark):
    got = apply_str(spark, X.token_count_bpe_ish, ["ab12,cd", ""])
    assert got == [4, 0]  # 'ab','12',',','cd'


# -- P3 strip_citations (digest.py:183-196) ----------------------------------

def test_strip_citations_section_scoped(spark):
    paper = "# Intro\nbody [x]\n# REFERENCES\n[1] a\n[2] b\n# Appendix\nkeep me"
    got = apply_str(spark, X.strip_citations, [paper])[0]
    assert "keep me" in got and "[1]" not in got and "[x]" not in got
    assert "# Appendix" in got


def test_strip_citations_case_and_bibliography(spark):
    for head in ("# References", "# REFERENCES", "# Bibliography"):
        paper = f"text\n{head}\ntail"
        got = apply_str(spark, X.strip_citations, [paper])[0]
        assert "tail" not in got and "text" in got
    # '## References' subsection is NOT removed (line-anchored top-level only)
    got = apply_str(spark, X.strip_citations, ["text\n## References\ntail"])[0]
    assert "tail" in got


# -- P1 keep_informative ------------------------------------------------------

def test_keep_informative(spark):
    df = spark.createDataFrame(
        [("useful",), ("has [NO INFORMATION] inside",), ("has [no information]",)], ["s"]
    )
    kept = [r[0] for r in df.filter(X.keep_informative(F.col("s"))).collect()]
    assert kept == ["useful"]


# -- P8 scrub_illegal_citations_py (remove_illegal_bibkeys) -------------------

def test_scrub_exact_and_fuzzy():
    legal = ["deep_learning", "graph_nets"]
    out = X.scrub_illegal_citations_py(
        "See [deep_learning] and [deep_lerning] and [bogus_key_xyz].", legal
    )
    # exact kept (canonicalized to quoted form), fuzzy mapped, unknown dropped
    assert "['deep_learning']" in out
    assert "bogus_key_xyz" not in out
    assert out.count("deep_learning") == 2


def test_scrub_protects_math():
    legal = ["k1"]
    src = "inline $[not, a, cite]$ and block $$[x, y]$$ and [k1]."
    out = X.scrub_illegal_citations_py(src, legal)
    assert "$[not, a, cite]$" in out and "$$[x, y]$$" in out
    assert "['k1']" in out


def test_scrub_dash_normalization():
    out = X.scrub_illegal_citations_py("[deep-learning]", ["deep_learning"])
    assert "['deep_learning']" in out


# -- P4/P5 truncation + abstract fallback -------------------------------------

def test_truncate_and_fallback(spark):
    df = spark.createDataFrame([("long text here", 10, None), ("short", 1, "abs")],
                               ["txt", "tok", "abstract"])
    got = df.select(
        X.truncate_tokens(F.col("txt"), F.col("tok"), max_token=2).alias("t"),
        X.abstract_fallback(F.col("abstract"), F.col("txt"), n=4).alias("a"),
    ).collect()
    assert got[0]["t"] == "long te"[: int(2 * X.CHARS_PER_TOKEN)]
    assert got[0]["a"] == "long"
    assert got[1]["t"] == "short" and got[1]["a"] == "abs"
