"""ROUGE-Lsum port (operators/rouge.py) vs hand-computed values."""

import math

from llmxmapreduce_spark.operators.rouge import (
    _lcs_ref_indices,
    rouge_lsum_py,
    rouge_tokenize,
)


def test_tokenize():
    assert rouge_tokenize("The CAT, sat-on 2 mats!") == \
        ["the", "cat", "sat", "on", "2", "mats"]
    assert rouge_tokenize("") == []
    assert rouge_tokenize("!!!") == []


def test_lcs_indices():
    a = "the cat was sat on the mat".split()
    b = "the cat sat on a mat".split()
    idx = _lcs_ref_indices(a, b)
    # LCS = the cat sat on mat (length 5)
    assert len(idx) == 5


def test_single_sentence_identity_and_disjoint():
    assert rouge_lsum_py("alpha beta gamma", "alpha beta gamma") == 1.0
    assert rouge_lsum_py("xxx yyy", "alpha beta gamma") == 0.0
    assert rouge_lsum_py("", "alpha") == 0.0
    assert rouge_lsum_py("alpha", "") == 0.0


def test_partial_overlap_hand_computed():
    # LCS('the cat sat', 'the cat was sat') = 3; P=3/3, R=3/4
    p, r = 1.0, 0.75
    expected = 2 * p * r / (p + r)
    assert math.isclose(rouge_lsum_py("the cat sat", "the cat was sat"), expected)


def test_summary_level_union_across_sentences():
    # prediction sentences each cover part of one reference sentence;
    # union-LCS counts both parts once
    label = "the quick brown fox jumps"
    pred = "the quick brown\nfox jumps high"
    # union over ref indices: all 5 ref tokens hit; n = 6 pred tokens
    p, r = 5 / 6, 5 / 5
    expected = 2 * p * r / (p + r)
    assert math.isclose(rouge_lsum_py(pred, label), expected)


def test_clipping_prevents_double_count():
    # the same pred token cannot satisfy two ref occurrences beyond its count
    label = "alpha alpha"
    pred = "alpha"
    # hits clipped to 1: P = 1/1, R = 1/2
    expected = 2 * 1.0 * 0.5 / 1.5
    assert math.isclose(rouge_lsum_py(pred, label), expected)
