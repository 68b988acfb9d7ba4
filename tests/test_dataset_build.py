"""Dataset release builder (pipelines/dataset_build.py): leakage-safe
ordering (corpus-wide dedup before the split), key cohesion across
sides, packed-text disjointness, manifest/datasheet consistency,
determinism, and the config guards."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.pipelines.corpus_prep import CorpusPrepConfig
from llmxmapreduce_spark.pipelines.dataset_build import (
    DatasetBuildConfig, build_dataset)


def _corpus(spark, n=40, hosts=8):
    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(words, size=60)) + f" tail{i}"
        rows.append((i, text, f"host{i % hosts}", "en"))
    # exact duplicate pair STRADDLING likely split sides (same text,
    # different hosts) — corpus-wide dedup must kill one before the split
    rows.append((500, rows[3][1], "host0", "en"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, lang string")


def _cfg(heldout_frac=0.3, **kw):
    prep = CorpusPrepConfig(max_tokens=128, quality=False, redact=False,
                            span=0, neardup_threshold=0.6)
    return DatasetBuildConfig(prep=prep, heldout_frac=heldout_frac,
                              split_key="source", rows_per_shard=50, **kw)


def test_build_dataset_e2e(spark, tmp_path):
    out = str(tmp_path / "release")
    summary = build_dataset(_corpus(spark), out, _cfg())

    # both sides written, with manifests, and rows add up
    train = spark.read.parquet(f"{out}/train")
    held = spark.read.parquet(f"{out}/heldout")
    assert train.count() == summary["sides"]["train"]["n_rows"] > 0
    assert held.count() == summary["sides"]["heldout"]["n_rows"] > 0
    for side in ("train", "heldout"):
        m = json.loads((tmp_path / "release" / side /
                        "_manifest.json").read_text())
        assert m["n_rows"] == summary["sides"][side]["n_rows"]

    # leakage-safe: no host's text appears on both sides
    def hosts(df):
        got = set()
        for r in df.collect():
            for w in r["text"].split():
                if w.startswith("tail"):
                    got.add(int(w[4:]) % 8)
        return got
    assert not (hosts(train) & hosts(held))

    # train side carries the deterministic order; heldout doesn't
    pos = sorted(r["train_pos"] for r in train.collect())
    assert pos == list(range(len(pos)))
    assert "train_pos" not in held.columns

    # the straddling exact dup was removed corpus-wide: its text occurs
    # exactly once across BOTH sides
    marker = "tail3"
    total = sum(r["text"].split().count(marker)
                for r in train.collect() + held.collect())
    assert total == 1

    # datasheet: grand total equals the curated doc count (41 in, 1 dup
    # dropped), hierarchy rows present for both strata
    sheet = json.loads((tmp_path / "release" /
                        "datasheet.json").read_text())
    gt = [r for r in sheet["datasheet"] if r["level"] == 3]
    assert len(gt) == 1 and gt[0]["n_docs"] == 40
    assert sheet["datasheet_strata"] == ["source", "lang"]


def test_build_dataset_deterministic(spark, tmp_path):
    a = build_dataset(_corpus(spark), str(tmp_path / "a"), _cfg())
    b = build_dataset(_corpus(spark), str(tmp_path / "b"), _cfg())
    assert a == b


def test_build_dataset_guards(spark, tmp_path):
    with pytest.raises(ValueError):
        build_dataset(_corpus(spark), str(tmp_path / "x"),
                      _cfg(heldout_frac=0.0))
    bad = _cfg()
    bad.split_key = "nope"
    with pytest.raises(TypeError):
        build_dataset(_corpus(spark), str(tmp_path / "y"), bad)


def test_build_dataset_train_scrub(spark, tmp_path):
    """scrub_train_overlap: a train doc quoting a ≥13-word passage of a
    held-out doc (the sub-document leak class corpus-wide dedup passes —
    jaccard is far below any near-dup threshold) is dropped from the
    release's train side; the held-out side is untouched."""
    from llmxmapreduce_spark.operators.splits import holdout_split

    sides = {r["source"]: r["split"] for r in holdout_split(
        spark.createDataFrame([(f"host{h}",) for h in range(8)],
                              "source string"),
        0.3, key_col="source", seed=42).collect()}
    train_host = next(s for s in sorted(sides) if sides[s] == "train")
    held_host = next(s for s in sorted(sides) if sides[s] == "heldout")

    rng = np.random.default_rng(11)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    held_text = " ".join(rng.choice(words, size=60)) + " tailheld"
    quote = " ".join(held_text.split()[20:33])          # 13-word passage
    quoting = (" ".join(rng.choice(words, size=25)) + " " + quote + " "
               + " ".join(rng.choice(words, size=25)) + " tailquote")
    clean = " ".join(rng.choice(words, size=60)) + " tailclean"
    docs = spark.createDataFrame(
        [(600, held_text, held_host, "en"),
         (601, quoting, train_host, "en"),
         (602, clean, train_host, "en")],
        "doc_id bigint, text string, source string, lang string")

    def words_of(out, side):
        return {w for r in spark.read.parquet(f"{out}/{side}").collect()
                for w in r["text"].split()}

    off = str(tmp_path / "off")
    build_dataset(docs, off, _cfg())
    assert "tailquote" in words_of(off, "train")

    on = str(tmp_path / "on")
    summary = build_dataset(docs, on, _cfg(scrub_train_overlap=True))
    assert summary["scrub_train_overlap"] is True
    tw = words_of(on, "train")
    assert "tailquote" not in tw                 # quoting doc scrubbed
    assert "tailclean" in tw                     # clean train doc kept
    assert "tailheld" in words_of(on, "heldout")  # heldout untouched
