"""Streaming ingestion dedup (streaming/ingest.py): the stream must equal
the same shards applied sequentially in batch mode — the module's
stream≡batch contract — plus bounded-state exact dedup semantics."""

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.operators.dedup import minhash_dedup_incremental
from llmxmapreduce_spark.streaming import ingest

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu "
         "xi omicron pi rho sigma tau upsilon phi chi psi omega red blue "
         "green gold silver stone river cloud".split())


def _doc(rng, n_words=50):
    return " ".join(rng.choice(VOCAB) for _ in range(n_words))


def _mutate(rng, text, k=1):
    words = text.split()
    for i in rng.choice(len(words), size=k, replace=False):
        words[i] = "mut" + str(int(rng.integers(1_000_000)))
    return " ".join(words)


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 10, minute, 0)


def _shards(seed=31):
    """3 shards with: unique docs, exact dups (across shards), near-dup
    copies of shard-0 docs landing in shards 1 and 2, and a within-shard
    near-dup pair.  Returns list of row-lists [(doc_id, text, ts)]."""
    rng = np.random.default_rng(seed)
    base = [_doc(rng) for _ in range(12)]
    t0 = _ts
    shards = [[], [], []]
    did = 0
    for i, b in enumerate(base):
        shards[i % 3].append((did, b, t0(did % 50)))
        did += 1
    # near-dups of shard-0 docs (ids 0,3,6,9) planted into later shards
    for src in (0, 3, 6, 9):
        shards[1].append((did, _mutate(rng, base[src]), t0(did % 50)))
        did += 1
        shards[2].append((did, _mutate(rng, base[src]), t0(did % 50)))
        did += 1
    # exact dup across shards + within-shard near-dup pair
    shards[2].append((did, base[1], t0(did % 50))); did += 1
    within = _doc(rng)
    shards[1].append((did, within, t0(did % 50))); did += 1
    shards[1].append((did, _mutate(rng, within), t0(did % 50))); did += 1
    return shards


SCHEMA = "doc_id bigint, text string, ts timestamp"
DEDUP_KW = dict(threshold=0.5, verify="estimate")


def _write_shards(spark, path, shards):
    import time
    for i, rows in enumerate(shards):
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(path)
        time.sleep(1.1)  # distinct mtimes → deterministic file order


def test_stream_exact_dedup_first_arrival_wins(spark, tmp_path):
    rng = np.random.default_rng(7)
    texts = [_doc(rng) for _ in range(8)]
    rows = [(i, texts[i % 8], _ts(i % 10))
            for i in range(24)]  # every text arrives 3×
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).repartition(4) \
        .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = ingest.stream_exact_dedup(stream, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("exact_ingest")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("exact_ingest").collect()
    assert len(got) == 8                       # one survivor per text
    assert len({r["text"] for r in got}) == 8
    assert set(spark.table("exact_ingest").columns) == {"doc_id", "text", "ts"}


def test_incremental_ingest_stream_matches_sequential_batch(spark, tmp_path):
    shards = _shards()
    src = str(tmp_path / "src")
    _write_shards(spark, src, shards)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    batches: list[tuple[list[int], list[int]]] = []
    ingest.run_incremental_neardup_ingest(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        on_batch=lambda eid, b, s: batches.append((
            sorted(r["doc_id"] for r in b.select("doc_id").collect()),
            sorted(r["doc_id"] for r in s.select("doc_id").collect()))),
        **DEDUP_KW)

    kept = ingest.read_kept(spark, str(tmp_path / "state"), SCHEMA)
    kept_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # the epoch-keyed layout also reads directly via partition discovery
    direct = spark.read.parquet(str(tmp_path / "state/kept"))
    assert "epoch" in direct.columns
    assert direct.count() == len(kept_ids)

    # replay the exact micro-batch partitioning Spark used, in batch mode
    all_rows = {r[0]: r for sh in shards for r in sh}
    assert len(batches) == 3, "expected one micro-batch per shard file"
    corpus_rows: list = []
    expect_ids: list[int] = []
    for in_ids, _ in batches:
        shard_df = spark.createDataFrame([all_rows[i] for i in in_ids], SCHEMA)
        corpus_df = spark.createDataFrame(corpus_rows, SCHEMA)
        surv = minhash_dedup_incremental(shard_df, corpus_df, **DEDUP_KW)
        srows = surv.collect()
        corpus_rows.extend(tuple(r) for r in srows)
        expect_ids.extend(r["doc_id"] for r in srows)
    assert kept_ids == sorted(expect_ids)
    # per-batch survivors also match the replay
    assert [sorted(s) for _, s in batches] != []
    # dedup did real work: strictly fewer survivors than inputs, and the
    # cross-shard exact dup can never survive
    n_in = sum(len(s) for s in shards)
    assert len(kept_ids) < n_in - 4            # ≥5 of the 11 dups collapsed
    dup_of_1 = [i for sh in shards for (i, t, _) in sh
                if t == all_rows[1][1] and i != 1]
    assert all(d not in kept_ids for d in dup_of_1)


def test_incremental_ingest_resumes_from_checkpoint(spark, tmp_path):
    """Restart semantics: a second availableNow run over the SAME
    checkpoint processes only files that arrived after the first drain —
    already-admitted shards are not re-deduped or re-appended."""
    shards = _shards(seed=11)
    src = str(tmp_path / "src")
    _write_shards(spark, src, shards[:2])

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        seen = []
        ingest.run_incremental_neardup_ingest(
            stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            on_batch=lambda eid, b, s: seen.append(
                sorted(r["doc_id"] for r in b.select("doc_id").collect())),
            **DEDUP_KW)
        return seen

    first = drain()
    kept1 = sorted(r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect())
    assert len(first) == 2

    import time
    time.sleep(1.1)
    spark.createDataFrame(shards[2], SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    second = drain()
    kept2 = sorted(r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect())
    # only the NEW shard was processed; prior admissions unchanged, no dups
    assert len(second) == 1
    assert set(second[0]) == {r[0] for r in shards[2]}
    assert set(kept1) <= set(kept2)
    assert len(kept2) == len(set(kept2))
    shard2_ids = {r[0] for r in shards[2]}
    assert set(kept2) - set(kept1) <= shard2_ids


def test_incremental_ingest_pre_filter_gates_admission(spark, tmp_path):
    shards = _shards(seed=5)
    # poison a few docs with short junk that a quality gate must stop
    shards[0].append((900, "tiny", _ts(0)))
    shards[1].append((901, "also tiny", _ts(0)))
    src = str(tmp_path / "src")
    _write_shards(spark, src, shards)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    ingest.run_incremental_neardup_ingest(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        pre_filter=lambda df: df.filter(F.size(F.split("text", r"\s+")) >= 10),
        **DEDUP_KW)
    kept = ingest.read_kept(spark, str(tmp_path / "state"), SCHEMA)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert 900 not in kept_ids and 901 not in kept_ids
    assert len(kept_ids) > 0


def test_fresh_checkpoint_with_existing_state_refuses(spark, tmp_path):
    """A fresh checkpoint restarts epoch ids at 0 — against an existing
    kept corpus the overwrite-scoped sink would DESTROY epoch 0's prior
    admissions, so the pairing mismatch must refuse up front (review
    repro)."""
    shards = _shards(seed=23)
    src = str(tmp_path / "src")
    _write_shards(spark, src, shards[:1])

    def drain(ckpt):
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        ingest.run_incremental_neardup_ingest(
            stream, str(tmp_path / "state"), str(ckpt), **DEDUP_KW)

    drain(tmp_path / "ckpt")
    kept1 = sorted(r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect())
    assert kept1
    with pytest.raises(ValueError, match="no progress"):
        drain(tmp_path / "ckpt_fresh")
    # prior admissions untouched by the refused run
    kept2 = sorted(r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect())
    assert kept2 == kept1


def test_incremental_ingest_replay_after_crash_is_idempotent(spark, tmp_path):
    """The exactly-once seam, closed: simulate a crash AFTER the epoch
    write but BEFORE the checkpoint commit by deleting the last commit
    marker — the restart replays that micro-batch with the same epoch id,
    overwrites its epoch directory, and the admitted corpus is unchanged
    (the old append-mode sink double-admitted the batch here)."""
    import shutil

    shards = _shards(seed=17)
    src = str(tmp_path / "src")
    _write_shards(spark, src, shards)

    def drain(ckpt):
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        seen = []
        ingest.run_incremental_neardup_ingest(
            stream, str(tmp_path / "state"), str(ckpt),
            on_batch=lambda eid, b, s: seen.append(eid),
            **DEDUP_KW)
        return seen

    first = drain(tmp_path / "ckpt")
    assert len(first) == 3
    kept1 = sorted(r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect())
    assert len(kept1) == len(set(kept1))

    # crash-restore simulation: a checkpoint image where the last batch's
    # epoch dir IS written but its commit marker is NOT (a copied dir,
    # because the driver's same-session metadata-log cache flags in-place
    # edits of a live checkpoint as a concurrent query)
    ckpt2 = tmp_path / "ckpt2"
    shutil.copytree(tmp_path / "ckpt", ckpt2)
    commits = ckpt2 / "commits"
    last = max((f for f in commits.iterdir() if f.name.isdigit()),
               key=lambda f: int(f.name))
    last.unlink()
    crc = commits / f".{last.name}.crc"     # Hadoop checksum sidecar: a
    if crc.exists():                        # stale .crc makes the commit
        crc.unlink()                        # rewrite look concurrent

    second = drain(ckpt2)                  # replays exactly that batch
    assert second == [int(last.name)]
    kept2 = sorted(r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect())
    assert kept2 == kept1                  # no duplicate admission, no loss


def test_incremental_ingest_decontaminates_per_batch(spark, tmp_path):
    """Streaming decontamination composes as pre_filter: each arriving
    shard is scrubbed against the benchmark (GPT-3 App. C 13-gram rule)
    BEFORE admission — a doc quoting a benchmark example never enters
    the kept corpus, in whichever shard it lands."""
    from llmxmapreduce_spark.operators.decontamination import decontaminate

    shards = _shards(seed=11)
    bench_text = ("which of the following rivers crosses the northern "
                  "border twice before reaching the delta plain region")
    # plant benchmark-quoting docs into two different shards
    shards[0].append((950, "intro words " + bench_text + " outro", _ts(1)))
    shards[2].append((951, bench_text + " trailing commentary", _ts(2)))
    bench = spark.createDataFrame([(0, bench_text)],
                                  "doc_id bigint, text string")
    src = str(tmp_path / "src")
    _write_shards(spark, src, shards)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    ingest.run_incremental_neardup_ingest(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        pre_filter=lambda df: decontaminate(df, bench, n=13),
        **DEDUP_KW)
    kept_ids = {r["doc_id"] for r in ingest.read_kept(
        spark, str(tmp_path / "state"), SCHEMA).collect()}
    assert 950 not in kept_ids and 951 not in kept_ids
    assert len(kept_ids) > 0


def test_incremental_media_ingest_hash_state(spark, tmp_path):
    """Media mirror of the incremental ingest: perceptual near-dups are
    refused admission against the kept corpus AND within a shard,
    decode failures are quarantined, and the persisted rows carry their
    dhash — the decode-once admission state."""
    import random as _random

    from llmxmapreduce_spark.functions.png import encode_png, png_decoder
    from llmxmapreduce_spark.streaming.ingest import (
        read_kept, run_incremental_media_ingest)

    w, h = 24, 24
    rng = _random.Random(9)

    def img(seed):
        r = _random.Random(seed)
        return bytes(r.randrange(256) for _ in range(w * h))

    def pert(px, d):
        # constant brightness shift: dhash-invariant away from clipping
        return bytes(min(255, max(0, b + d)) for b in px)

    A, B, C, FF, G = (img(s) for s in (1, 2, 3, 4, 5))
    png = lambda px: encode_png(px, w, h, color_type=0)  # noqa: E731
    shards = [
        [("a0", png(A)), ("b0", png(B))],
        [("a1", png(pert(A, 2))), ("c0", png(C)),
         ("f0", png(FF)), ("f1", png(pert(FF, 2))), ("x0", b"junk")],
        [("a2", png(pert(A, -2))), ("g0", png(G))],
    ]
    src = str(tmp_path / "msrc")
    import time
    for rows in shards:
        spark.createDataFrame(rows, "asset_id string, payload binary") \
            .coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = (spark.readStream.schema("asset_id string, payload binary")
              .option("maxFilesPerTrigger", "1").parquet(src))
    n_schema_fields = len(stream.schema.fields)
    batches, dead = [], []
    run_incremental_media_ingest(
        stream, str(tmp_path / "mstate"), str(tmp_path / "mckpt"),
        decoder=png_decoder,
        on_batch=lambda eid, b, s: (
            batches.append(
                sorted(r["asset_id"] for r in s.select("asset_id").collect())),
            dead.extend(r["asset_id"] for r in
                        b.filter(~b["decode_ok"]).collect())))
    assert len(batches) == 3
    # on_batch is the dead-letter hook: the quarantined junk is visible
    assert dead == ["x0"]
    # the caller's stream schema must not grow a phantom dhash field
    assert len(stream.schema.fields) == n_schema_fields

    out_schema = "asset_id string, payload binary, dhash long"
    kept = read_kept(spark, str(tmp_path / "mstate"), out_schema).collect()
    ids = sorted(r["asset_id"] for r in kept)
    # near-dups of A (a1, a2) and of FF (f1) refused; junk quarantined
    assert ids == ["a0", "b0", "c0", "f0", "g0"]
    assert all(r["dhash"] is not None for r in kept)
    # the persisted hash IS the admission state: recompute one and match
    from llmxmapreduce_spark.operators.media_dedup import dhash_bits
    by_id = {r["asset_id"]: r for r in kept}
    assert by_id["b0"]["dhash"] == dhash_bits(w, h, B)
