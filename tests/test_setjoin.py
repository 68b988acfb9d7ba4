"""Exact set-similarity join (operators/setjoin.py): completeness of
the prefix filter vs a brute-force all-pairs reference (the theorem the
module proves must hold in code), threshold-boundary exactness, input
hygiene (duplicate tokens, nulls, empties), a DuckDB naive twin on real
document text, and partitioning invariance."""

import random
from itertools import combinations

import duckdb
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.setjoin import (jaccard_join,
                                                   jaccard_text_join)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _brute(sets, t):
    out = {}
    for (ia, sa), (ib, sb) in combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and inter / union >= t:
            out[(ia, ib)] = (inter, len(sa), len(sb))
    return out


def _rand_sets(n_docs=80, vocab=120, seed=3):
    rng = random.Random(seed)
    toks = [f"w{i:03d}" for i in range(vocab)]
    # Zipf-ish: low-index tokens far more common (stress the df-order)
    sets = {}
    for d in range(n_docs):
        k = rng.randrange(3, 14)
        s = {toks[min(int(rng.expovariate(1 / 20)), vocab - 1)]
             for _ in range(k)}
        if d % 5 == 0 and d:
            # planted near-copy of an earlier doc with 0-2 swaps
            s = set(sets[d - 1])
            for _ in range(rng.randrange(3)):
                if s:
                    s.discard(rng.choice(sorted(s)))
                s.add(toks[rng.randrange(vocab)])
        sets[d] = s
    return sets


@pytest.mark.parametrize("t", [0.5, 0.7, 0.9])
def test_matches_bruteforce_all_thresholds(spark, t):
    sets = _rand_sets()
    rows = [(d, sorted(s)) for d, s in sets.items()]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {(r.id_a, r.id_b): (r.inter, r.n_a, r.n_b)
           for r in jaccard_join(df, threshold=t).collect()}
    want = _brute(sets, t)
    assert got == want
    if t == 0.5:
        assert want            # the fixture must actually have pairs


def test_threshold_boundary_and_duplicates(spark):
    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "x", "x"]),   # dup token: set size 4
        (3, ["p", "q"]),
        (4, None),
        (5, []),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    # J(1,2) on sets = 3/5 = 0.6: included at exactly t=0.6, not at 0.61
    at = {(r.id_a, r.id_b)
          for r in jaccard_join(df, threshold=0.6).collect()}
    assert at == {(1, 2)}
    assert jaccard_join(df, threshold=0.61).count() == 0
    with pytest.raises(ValueError):
        jaccard_join(df, threshold=0.0)


def test_jaccard_value_and_partition_invariance(spark):
    sets = _rand_sets(n_docs=40, seed=9)
    rows = [(d, sorted(s)) for d, s in sets.items()]
    want = None
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "doc_id long, tokens array<string>").repartition(parts)
        out = jaccard_join(df, threshold=0.5)
        got = sorted((r.id_a, r.id_b, r.inter, round(r.jaccard, 9))
                     for r in out.collect())
        if want is None:
            want = got
        assert got == want, f"parts={parts}"
    assert all(j >= 0.5 for _, _, _, j in want)


def _brute_containment(inner_sets, outer_sets, t, same=False):
    out = {}
    for ia, sa in inner_sets.items():
        for ib, sb in outer_sets.items():
            if (same and ia == ib) or not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / len(sa) >= t:
                out[(ia, ib)] = (inter, len(sa), len(sb))
    return out


def test_containment_matches_bruteforce(spark):
    from llmxmapreduce_spark.operators.setjoin import containment_join
    sets = _rand_sets(n_docs=50, seed=21)
    # plant a small quote inside a big doc: Jaccard tiny, containment 1
    sets[100] = set(list(sorted(sets[7]))[:3]) if len(sets[7]) >= 3 else \
        {"q1", "q2"}
    sets[101] = sets[100] | {f"big{i}" for i in range(40)}
    rows = [(d, sorted(s)) for d, s in sets.items()]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    for t in (0.8, 1.0):
        got = {(r.id_inner, r.id_outer): (r.inter, r.n_inner, r.n_outer)
               for r in containment_join(df, threshold=t).collect()}
        want = _brute_containment(sets, sets, t, same=True)
        assert got == want, f"t={t}"
    # the planted quote is found at containment 1.0 where Jaccard ≈ 0.07
    assert (100, 101) in _brute_containment(sets, sets, 1.0, same=True)


def test_containment_two_table_mode(spark):
    from llmxmapreduce_spark.operators.setjoin import containment_join
    bench = {0: {"a", "b", "c"}, 1: {"x", "y", "z", "w"}}
    corpus = {10: {"a", "b", "c", "d", "e", "f"},      # contains bench 0
              11: {"x", "y", "q", "r"},                # 2/4 of bench 1
              12: {"m", "n"}}
    bdf = spark.createDataFrame([(d, sorted(s)) for d, s in bench.items()],
                                "doc_id long, tokens array<string>")
    cdf = spark.createDataFrame([(d, sorted(s)) for d, s in corpus.items()],
                                "doc_id long, tokens array<string>")
    got = {(r.id_inner, r.id_outer): round(r.containment, 6)
           for r in containment_join(bdf, outer_df=cdf,
                                     threshold=0.75).collect()}
    assert got == {(0, 10): 1.0}
    got_low = {(r.id_inner, r.id_outer)
               for r in containment_join(bdf, outer_df=cdf,
                                         threshold=0.5).collect()}
    assert got_low == {(0, 10), (1, 11)}


def test_text_join_matches_duckdb_naive_twin(spark):
    df = spark.read.parquet(DOCS).limit(120).select("doc_id", "text")
    got = sorted((r.id_a, r.id_b, r.inter, r.n_a, r.n_b)
                 for r in jaccard_text_join(df, threshold=0.5).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT doc_id, text FROM '{DOCS}' "
            f"WHERE doc_id IN (SELECT doc_id FROM '{DOCS}' LIMIT 120)")
    want = sorted(tuple(r) for r in con.sql(r"""
        WITH tok AS (
            SELECT DISTINCT doc_id, t.w AS tok
            FROM d, UNNEST(string_split_regex(trim(lower(text)), '\s+'))
                 AS t(w)
            WHERE t.w <> ''),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        ov AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS inter
            FROM tok a JOIN tok b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT ov.id_a, ov.id_b, CAST(inter AS INT),
               CAST(sa.n AS INT) AS n_a, CAST(sb.n AS INT) AS n_b
        FROM ov JOIN sz sa ON sa.doc_id = ov.id_a
                JOIN sz sb ON sb.doc_id = ov.id_b
        WHERE 2 * inter >= sa.n + sb.n - inter
    """).fetchall())
    # the spark limit(120) and duckdb LIMIT may pick different rows if
    # parquet order differed — both read the same single file in order
    assert got == want
    assert len(got) >= 0


def test_nondyadic_boundary_no_false_negative(spark):
    """Round-9 ADVICE regression: with float threshold arithmetic,
    0.7 * 10 = 7.000000000000001 so ceil() returned 8 and the prefix of
    a 10-token doc shrank from 4 tokens to 3 — silently dropping the
    boundary pair below.  The rational cross-multiplied bound keeps it.

    Construction: x = 3 rare tokens (df 1, order FIRST) + 7 common
    tokens; y = exactly those 7 commons.  J = 7/10 = 0.7 — qualifying
    at the boundary.  The smallest-ordered common token sits at x's
    prefix position 4: present under the correct bound, absent under
    the buggy one."""
    rare = [f"rare{i}" for i in range(3)]
    common = [f"com{i}" for i in range(7)]
    df = spark.createDataFrame(
        [(0, rare + common), (1, common)],
        "doc_id long, tokens array<string>")
    got = {(r.id_a, r.id_b): (r.inter, r.n_a, r.n_b)
           for r in jaccard_join(df, threshold=0.7).collect()}
    assert got == {(0, 1): (7, 10, 7)}


def test_threshold_ratio_parsing():
    """Floats read as decimal literals; Fractions/tuples pass through;
    huge denominators and out-of-range values rejected."""
    from fractions import Fraction

    from llmxmapreduce_spark.operators.setjoin import _threshold_ratio

    assert _threshold_ratio(0.8) == (4, 5)
    assert _threshold_ratio(0.5) == (1, 2)
    assert _threshold_ratio(1.0) == (1, 1)
    assert _threshold_ratio(Fraction(2, 3)) == (2, 3)
    assert _threshold_ratio((7, 10)) == (7, 10)
    with pytest.raises(ValueError):
        _threshold_ratio(0.0)
    with pytest.raises(ValueError):
        _threshold_ratio(1.2)
    with pytest.raises(ValueError):
        _threshold_ratio(Fraction(1, 10_000_019))
