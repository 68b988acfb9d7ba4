"""Chunker (C1-C3) tests: budget respect, tail rebalance, packing."""

import pytest

from llmxmapreduce_spark.operators import chunker


def wlen(s):
    return chunker.ws_len(s)


def test_split_sentences_keeps_punct():
    got = chunker.split_sentences("One. Two! Three? Tail")
    assert got == ["One.", " Two!", " Three?", " Tail"]


def test_split_sentences_space_mode():
    got = chunker.split_sentences("a b  c", " ")
    assert got == ["a ", "b ", "c"]


def test_split_into_chunks_budget_respected():
    text = ". ".join(f"sentence number {i} with some words" for i in range(40)) + "."
    chunks = chunker.split_into_chunks(text, 30, wlen)
    assert len(chunks) > 1
    assert all(wlen(c) <= 30 for c in chunks)
    # nothing lost: every sentence index appears exactly once
    joined = "".join(chunks)
    for i in range(40):
        assert f"number {i} " in joined or joined.endswith(f"number {i} with some words.")


def test_split_into_chunks_tail_rebalanced():
    # 9 equal sentences, budget 4 sentences' worth -> naive packing leaves a
    # 1-sentence tail; the reference rebalances the last two chunks.
    text = " ".join("w%d a b c." % i for i in range(9))
    chunks = chunker.split_into_chunks(text, 16, wlen)
    assert all(wlen(c) <= 16 for c in chunks)
    assert wlen(chunks[-1]) >= 16 // 2 or len(chunks) == 1


def test_chunk_docs_separator_packing():
    doc = "\n".join("line %d has five words" % i for i in range(20))
    chunks = chunker.chunk_docs(doc, 25, wlen)
    assert all(wlen(c) <= 25 for c in chunks)
    text = "\n".join(chunks)
    for i in range(20):
        assert f"line {i} " in text


def test_chunk_docs_oversize_single_split():
    # One separator-free split far over budget -> sentence/space re-split.
    doc = " ".join("tok%d" % i for i in range(100))
    chunks = chunker.chunk_docs(doc, 10, wlen)
    assert len(chunks) >= 10
    assert all(wlen(c) <= 10 for c in chunks)


def test_split_list_of_docs_greedy():
    docs = ["a b", "c d", "e f", "g h", "i j"]
    groups = chunker.split_list_of_docs(docs, lambda g: sum(wlen(d) for d in g), 4)
    assert groups == [["a b", "c d"], ["e f", "g h"], ["i j"]]


def test_split_list_of_docs_single_overflow_raises():
    with pytest.raises(ValueError):
        chunker.split_list_of_docs(["one two three four five"],
                                   lambda g: sum(wlen(d) for d in g), 3)


def test_chunk_documents_spark(spark):
    df = spark.createDataFrame(
        [(i, "\n".join("line %d of doc %d pad pad" % (j, i) for j in range(12)), 20)
         for i in range(4)],
        ["doc_id", "context", "budget"],
    )
    out = chunker.chunk_documents(df, length_fn=chunker.ws_len).collect()
    assert len(out) > 4
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["text"]))
    for i in range(4):
        ids = sorted(c for c, _ in by_doc[i])
        assert ids == list(range(len(ids)))  # dense, ordered chunk ids
