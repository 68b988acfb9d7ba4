"""Error-path checkpoint release (r13, from r12 ADVICE): an exception
mid-loop/mid-pipeline must not leave the call's tracked localCheckpoint
blocks pinned for the session — that silently reinstates the leak the
r12 retention sweep fixed, exactly when memory pressure is highest.
These tests force failures into the corpus_prep cutter, the labelprop
round loop, and the media_prep pipeline and assert the tracked blocks
are released while shield/caller frames survive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.retention import pinned_ids


def _registered(sc, ids):
    jmap = sc._jsc.getPersistentRDDs()
    return {rid for rid in ids if jmap.containsKey(rid)}


def test_cutter_abort_releases_window_keeps_shield(spark):
    from llmxmapreduce_spark.pipelines.corpus_prep import _cutter

    sc = spark.sparkContext
    cut = _cutter(None)
    snap0 = pinned_ids(sc)
    d1 = cut("one", spark.range(100).withColumn("x", F.col("id") * 2))
    shield_ids = pinned_ids(sc) - snap0
    d2 = cut("two", d1.withColumn("y", F.col("x") + 1))
    cut2_ids = pinned_ids(sc) - snap0 - shield_ids
    assert shield_ids and cut2_ids

    cut.abort()
    assert _registered(sc, cut2_ids) == set(), \
        "abort() left the current window pinned"
    assert _registered(sc, shield_ids) == shield_ids, \
        "abort() must never sweep the shield (first cut / caller caches)"
    # shield frame still readable (it was never released)
    assert d1.count() == 100
    # manual cleanup of the shield so this test leaves no residue
    from llmxmapreduce_spark.retention import release
    release(sc, shield_ids)


def test_labelprop_releases_on_midloop_error(spark, monkeypatch):
    from llmxmapreduce_spark.operators import labelprop as lp

    sc = spark.sparkContext
    caller = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5)], ["src", "dst"]).cache()
    assert caller.count() == 4
    before = pinned_ids(sc)

    calls = {"n": 0}
    real = lp._one_round

    def exploding(e, labels):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected executor loss")
        return real(e, labels)

    monkeypatch.setattr(lp, "_one_round", exploding)
    with pytest.raises(RuntimeError, match="injected"):
        lp.label_propagation(caller, n_iter=5)

    leaked = pinned_ids(sc) - before
    assert leaked == set(), f"mid-loop error leaked blocks: {leaked}"
    assert caller.count() == 4       # caller cache survived
    caller.unpersist()


def test_media_prep_releases_on_midpipeline_error(spark, monkeypatch):
    from llmxmapreduce_spark.operators import media_dedup
    from llmxmapreduce_spark.pipelines import media_prep as mp

    sc = spark.sparkContext
    assets = spark.createDataFrame(
        [(i, bytes([i % 251] * 64)) for i in range(20)],
        ["asset_id", "payload"])
    before = pinned_ids(sc)

    def exploding(*a, **k):
        raise RuntimeError("injected decode failure")

    # fail AFTER the exact_dedup cut (tracked) at the decode stage
    monkeypatch.setattr(media_dedup, "image_hashes", exploding)
    with pytest.raises(RuntimeError, match="injected"):
        mp.run_media_prep(assets)

    leaked = pinned_ids(sc) - before
    # the metadata_gate cut is the SHIELD (never released by design);
    # everything tracked after it must be gone
    assert len(leaked) <= 1, f"mid-pipeline error leaked blocks: {leaked}"
    from llmxmapreduce_spark.retention import release
    release(sc, leaked)
