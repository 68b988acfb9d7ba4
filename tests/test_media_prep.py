"""Media curation e2e (pipelines/media_prep.py): stage order and
semantics on planted data — metadata junk gated before decode, exact
dups killed before hashing, near-dup re-encodes collapsed to one
canonical survivor, decode failures quarantined with errors, stage
telemetry populated."""

import random

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions.jpeg import encode_jpeg
from llmxmapreduce_spark.functions.png import encode_png
from llmxmapreduce_spark.operators.stage_metrics import StageMetrics
from llmxmapreduce_spark.pipelines.media_prep import (MediaPrepConfig,
                                                      run_media_prep)


def _smooth_rgb(w, h, seed):
    import numpy as np
    rng = random.Random(seed)
    raw = bytes(rng.randrange(256) for _ in range(w * h * 3))
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(int)
    for _ in range(3):
        arr = (arr + np.roll(arr, 1, 0) + np.roll(arr, 1, 1)
               + np.roll(arr, -1, 0) + np.roll(arr, -1, 1)) // 5
    return arr.astype("uint8").tobytes()


@pytest.fixture(scope="module")
def planted(spark):
    w, h = 48, 48
    pic = _smooth_rgb(w, h, 1)
    other = _smooth_rgb(w, h, 2)
    png_pic = encode_png(pic, w, h, color_type=2)
    rows = [
        ("keep_png", png_pic),                      # canonical (min id wins)
        ("xact_dup", png_pic),                      # byte-identical copy
        ("near_jpg", encode_jpeg(pic, w, h, quality=92)),  # re-encode
        ("other_ok", encode_png(other, w, h, color_type=2)),
        ("tiny", b"x"),                             # metadata gate
        ("broken", b"\x89PNG\r\n\x1a\nnot really"),  # decode failure
    ]
    return spark.createDataFrame(rows, "asset_id string, payload binary")


def test_media_prep_e2e(spark, planted):
    sm = StageMetrics(spark)
    kept, quarantined = run_media_prep(
        planted, MediaPrepConfig(min_bytes=8, bands=8, max_distance=6),
        stage_metrics=sm)
    ids = sorted(r.asset_id for r in kept.select("asset_id").collect())
    assert ids == ["keep_png", "other_ok"]
    # hashes ride along as admission state
    row = {r.asset_id: r for r in kept.collect()}
    assert row["keep_png"].dhash is not None
    assert row["keep_png"].ahash is not None
    q = {r.asset_id: r.decode_error for r in quarantined.collect()}
    assert set(q) == {"broken"} and "ValueError" in q["broken"]
    stages = [r["stage"] for r in sm.report()]
    assert stages[:1] == ["metadata_gate"] and "neardup" in stages


def test_media_prep_stage_toggles(spark, planted):
    # exact_dedup off: the byte-identical copy reaches near-dedup and
    # still collapses there (distance 0)
    kept, _ = run_media_prep(
        planted, MediaPrepConfig(min_bytes=8, exact_dedup=False,
                                 bands=8, max_distance=6))
    ids = sorted(r.asset_id for r in kept.select("asset_id").collect())
    assert ids == ["keep_png", "other_ok"]
    # neardup off: re-encode survives, exact dup still dies
    kept2, _ = run_media_prep(
        planted, MediaPrepConfig(min_bytes=8, neardup=False))
    ids2 = sorted(r.asset_id for r in kept2.select("asset_id").collect())
    assert ids2 == ["keep_png", "near_jpg", "other_ok"]


def test_media_prep_media_types_guard(spark, planted):
    with pytest.raises(ValueError, match="media_type"):
        run_media_prep(planted, MediaPrepConfig(media_types=["image"]))
    # with the column present the gate applies
    typed = planted.withColumn(
        "media_type",
        F.when(F.col("asset_id") == "other_ok", "video")
        .otherwise("image"))
    kept, _ = run_media_prep(
        typed, MediaPrepConfig(min_bytes=8, media_types=["image"],
                               bands=8, max_distance=6))
    ids = {r.asset_id for r in kept.select("asset_id").collect()}
    assert "other_ok" not in ids and "keep_png" in ids


def test_media_prep_admit_undecodable_and_keep_by(spark, planted):
    kept, quarantined = run_media_prep(
        planted, MediaPrepConfig(min_bytes=8, admit_undecodable=True,
                                 bands=8, max_distance=6))
    ids = {r.asset_id for r in kept.select("asset_id").collect()}
    assert "broken" in ids and quarantined.count() == 1  # reported anyway
    # keep_by: biggest payload wins the near-dup cluster instead of min id
    sized = planted.withColumn("sz", F.length("payload"))
    kept2, _ = run_media_prep(
        sized, MediaPrepConfig(min_bytes=8, bands=8, max_distance=6,
                               keep_by="sz"))
    ids2 = {r.asset_id for r in kept2.select("asset_id").collect()}
    assert len(ids2 & {"keep_png", "xact_dup", "near_jpg"}) == 1


def test_media_prep_dimension_gates(spark, planted):
    with pytest.raises(ValueError, match="min_width"):
        run_media_prep(planted, MediaPrepConfig(min_width=32))
    dims = planted.withColumn(
        "width",
        F.when(F.col("asset_id") == "other_ok", 16).otherwise(64)
    ).withColumn("height", F.lit(64))
    kept, _ = run_media_prep(
        dims, MediaPrepConfig(min_bytes=8, min_width=32, min_height=32,
                              bands=8, max_distance=6))
    ids = {r.asset_id for r in kept.select("asset_id").collect()}
    assert "other_ok" not in ids and "keep_png" in ids
    # null dimensions fail the gate (unprobed assets can't prove size)
    dims2 = planted.withColumn(
        "width", F.when(F.col("asset_id") == "keep_png",
                        F.lit(None).cast("int")).otherwise(F.lit(64)))
    kept2, _ = run_media_prep(
        dims2, MediaPrepConfig(min_bytes=8, min_width=32,
                               bands=8, max_distance=6))
    ids2 = {r.asset_id for r in kept2.select("asset_id").collect()}
    assert "keep_png" not in ids2


def test_stage_checkpoints_released(spark, planted):
    """r12 audit (second pass): with the quarantine report checkpointed
    (decode-failure-sized), the corpus-sized exact_dedup and
    perceptual_hash cuts release at return — ≤3 pinned frames per call
    (metadata-gate shield + kept + quarantined), and both returned
    frames stay fully readable after the release."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    kept, quarantined = run_media_prep(planted, MediaPrepConfig())
    k = {r["asset_id"] for r in kept.collect()}
    q = {r["asset_id"] for r in quarantined.collect()}
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    leaked = after - before
    assert len(leaked) <= 3, (
        f"{len(leaked)} RDDs left pinned by run_media_prep; superseded "
        "mid-pipeline cuts are leaking")
    assert "broken" in q and "keep_png" in k and "xact_dup" not in k
