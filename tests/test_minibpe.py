"""Vendored mini-BPE (functions/minibpe.py) + the real-tokenizer spec
path of packing.resolve_token_counter: hand-computed merges, the
per-executor spec-encoder plumbing under Spark, and a packing ledger
matched against driver-side encoder counts."""

import os

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions.minibpe import MiniBPE, load_merges
from llmxmapreduce_spark.operators import packing

MERGES_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                           "mini_merges.txt")
SPEC = f"minibpe:{MERGES_PATH}"

# fixture ranks: 0:(t,h) 1:(th,e) 2:(i,n) 3:(in,g) 4:(a,n) 5:(an,d)
# 6:(e,r) 7:(r,e); vocab: <unk>=0, a..t=1..9, th=10 the=11 in=12 ing=13
# an=14 and=15 er=16 re=17


def test_minibpe_hand_computed():
    bpe = MiniBPE(load_merges(MERGES_PATH))
    assert bpe.encode("the") == [11]
    assert bpe.encode("thin") == [10, 12]          # th + in
    assert bpe.encode("and") == [15]
    # merge ORDER matters: (i,n) rank 2 beats (r,e) rank 7, then ing,
    # and only then re — r e a d i n g → re a d ing
    assert bpe.encode("reading") == [17, 1, 2, 13]
    assert bpe.decode_symbols(bpe.encode("reading")) \
        == ["re", "a", "d", "ing"]
    # unknown characters → <unk>, whitespace splits words
    assert bpe.encode("xyz") == [0, 0, 0]
    assert bpe.encode("the thin and reading") \
        == [11, 10, 12, 15, 17, 1, 2, 13]
    assert bpe.encode("") == []
    # deterministic across instances (fresh memo)
    assert MiniBPE(load_merges(MERGES_PATH)).encode("reading") \
        == bpe.encode("reading")


def test_load_merges_validates():
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("# comment\na b\n\nc d\n")
        p = f.name
    assert load_merges(p) == [("a", "b"), ("c", "d")]
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("a b c\n")
        p = f.name
    with pytest.raises(ValueError):
        load_merges(p)


def test_spec_path_under_spark(spark):
    """The 'minibpe:<path>' spec runs the SAME plumbing as tiktoken:/hf:
    — string spec → pandas UDF → per-executor _ENCODER_CACHE build — so
    the previously import-gated branch is exercised end-to-end."""
    counter = packing.resolve_token_counter(SPEC)
    df = spark.createDataFrame(
        [(1, "the thin and reading"), (2, "xyz"), (3, None), (4, "")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", counter(F.col("text")).alias("n"))
           .collect()}
    assert got == {1: 8, 2: 3, 3: 0, 4: 0}


def test_packing_ledger_matches_hand_counts(spark):
    """pack_sequences budgeted on the vendored BPE: every ledger length
    must equal the driver-side encoder's count, and bins respect
    max_tokens (the pluggable-counter contract: the counter IS the
    budget — packing.py module docstring)."""
    bpe = MiniBPE(load_merges(MERGES_PATH))
    texts = {
        1: "the thin and reading",             # 8 tokens
        2: "reading reading reading",          # 12
        3: "and and and and",                  # 4
        4: "thin hat",                         # 2 + 3 = 5
        5: "xyz",                              # 3
    }
    for i, t in texts.items():
        assert len(bpe.encode(t)) > 0
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id bigint, text string")
    counter = packing.resolve_token_counter(SPEC)
    src = df.withColumn("n_tokens", counter(F.col("text")))
    rows = packing.pack_assignments(src, max_tokens=16).collect()
    got = {r["doc_id"]: r["n_tokens"] for r in rows}
    assert got == {i: len(bpe.encode(t)) for i, t in texts.items()}
    bins: dict = {}
    for r in rows:
        assert not r["truncated"]
        bins[r["seq_id"]] = bins.get(r["seq_id"], 0) + r["n_tokens"]
    assert all(v <= 16 for v in bins.values())
    # the materialized path under the same spec agrees on the ledger
    seqs = packing.pack_sequences(df, max_tokens=16, tokenizer=SPEC)
    assert (sum(r["total_tokens"] for r in seqs.collect())
            == sum(len(bpe.encode(t)) for t in texts.values()))


# ---------------------------------------------------------------------------
# BPE TRAINING (learn_merges / vocab.train_bpe)
# ---------------------------------------------------------------------------

def test_learn_merges_hand_computed():
    """Sennrich's worked inventory: low*5 lower*2 newest*6 widest*3.
    Weighted pair counts give (e,s)=9 tie (s,t)=9 -> lexicographic
    smallest first; then (es,t)=9; then (l,o)=7 tie (o,w) -> (l,o);
    then (lo,w)=7."""
    from llmxmapreduce_spark.functions.minibpe import learn_merges

    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(wc, 4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    # the learned table drives the encoder directly
    bpe = MiniBPE(merges)
    assert bpe.decode_symbols(bpe.encode("lowest")) == ["low", "est"]


def test_learn_merges_stops_on_singletons():
    from llmxmapreduce_spark.functions.minibpe import learn_merges

    # every pair occurs once -- memorizing single words is refused
    assert learn_merges([("abc", 1), ("xyz", 1)], 10) == []
    # and an empty inventory is fine
    assert learn_merges([], 5) == []


def test_train_bpe_spark_matches_pure(spark):
    """The distributed word-count + driver merge loop must equal
    learn_merges on the same hand-built inventory, independent of row
    order/partitioning."""
    from llmxmapreduce_spark.functions.minibpe import learn_merges
    from llmxmapreduce_spark.operators.vocab import train_bpe

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    rows = [(i, " ".join(words[i::3])) for i in range(3)]  # shuffled split
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = train_bpe(df, n_merges=4, min_count=1)
    want = learn_merges(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 4)
    assert got == want
    assert train_bpe(df.repartition(7), n_merges=4, min_count=1) == got


def test_train_encode_pack_loop(spark, tmp_path):
    """The full in-container tokenizer loop: train on the corpus, save
    the merges, pack with the 'minibpe:' spec, and the ledger's token
    counts equal driver-side encoding with the same learned table."""
    from llmxmapreduce_spark.functions.minibpe import save_merges
    from llmxmapreduce_spark.operators.vocab import train_bpe

    texts = ["the thin cat and the thin dog", "reading and rereading",
             "the cat reading", "and the dog thin"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    merges = train_bpe(df, n_merges=6, min_count=1)
    assert merges, "planted corpus must produce merges"
    path = str(tmp_path / "learned_merges.txt")
    save_merges(merges, path)
    bpe = MiniBPE(load_merges(path))

    counter = packing.resolve_token_counter(f"minibpe:{path}")
    src = df.withColumn("n_tokens", counter(F.col("text")))
    packed = packing.pack_sequences(src, max_tokens=16,
                                    len_col="n_tokens")
    got = {r["seq_id"]: r for r in packed.collect()}
    total = sum(r["total_tokens"] for r in got.values())
    assert total == sum(len(bpe.encode(t)) for t in texts)
