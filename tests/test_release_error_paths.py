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

    def exploding(e, labels, *args):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected executor loss")
        return real(e, labels, *args)

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


def test_labelprop_fixpoint_count_failure_releases_current_round(
        spark, monkeypatch):
    """r13 review finding: in fixpoint mode (n_iter=None) the convergence
    count runs BETWEEN the round's eager checkpoint and the
    prev_ids=new_ids rotation — a failure there must release the
    just-pinned round too, not only the previous one."""
    from llmxmapreduce_spark.operators import labelprop as lp

    sc = spark.sparkContext
    caller = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5)], ["src", "dst"]).cache()
    assert caller.count() == 4
    before = pinned_ids(sc)

    calls = {"n": 0}
    # patch the CONCRETE class (Spark 4: classic.DataFrame overrides the
    # pyspark.sql.DataFrame base), or the patch never intercepts
    DF = type(caller)
    real = DF.count

    def exploding_count(self):
        calls["n"] += 1
        # call 1: the edge-cache materialization in the preamble; call 2:
        # round 1's n_changed convergence count — AFTER round 1's
        # checkpoint is pinned but BEFORE it rotates into prev_ids
        if calls["n"] == 2:
            raise RuntimeError("injected count failure")
        return real(self)

    monkeypatch.setattr(DF, "count", exploding_count)
    with pytest.raises(RuntimeError, match="injected"):
        lp.label_propagation(caller, n_iter=None, max_iter=5)
    monkeypatch.setattr(DF, "count", real)

    leaked = pinned_ids(sc) - before
    assert leaked == set(), f"fixpoint count failure leaked: {leaked}"
    assert caller.count() == 4       # caller cache survived
    caller.unpersist()


def test_media_prep_releases_on_quarantine_checkpoint_error(
        spark, monkeypatch):
    """r13 review finding: the final 'neardup' cut (kept_ids) pins before
    the quarantine checkpoint; a failure there must release it, not just
    the `created` set."""
    from llmxmapreduce_spark.pipelines import media_prep as mp

    sc = spark.sparkContext
    assets = spark.createDataFrame(
        [(f"a{i}", bytes([i % 251] * 64)) for i in range(20)],
        ["asset_id", "payload"])
    before = pinned_ids(sc)

    DF = type(assets)
    real = DF.localCheckpoint

    def exploding_on_quarantine(self, eager=True):
        # the quarantine frame is the only one with this exact shape
        if self.columns == ["asset_id", "decode_error"]:
            raise RuntimeError("injected quarantine checkpoint failure")
        return real(self, eager)

    monkeypatch.setattr(DF, "localCheckpoint",
                        exploding_on_quarantine)
    with pytest.raises(RuntimeError, match="injected"):
        mp.run_media_prep(assets)
    monkeypatch.setattr(DF, "localCheckpoint", real)

    leaked = pinned_ids(sc) - before
    # only the untracked metadata_gate shield may remain
    assert len(leaked) <= 1, \
        f"quarantine checkpoint failure leaked kept_ids: {leaked}"
    from llmxmapreduce_spark.retention import release
    release(sc, leaked)
