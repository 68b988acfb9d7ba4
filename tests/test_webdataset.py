"""WebDataset tar shards (sources/webdataset.py): write→read roundtrip
with metadata, byte-determinism of shards, sample adjacency + member
order inside the tar, shard sizing, duplicate-key guard, and the e2e
composition media_prep → write_webdataset."""

import hashlib
import json
import os
import random
import tarfile

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions.png import encode_png
from llmxmapreduce_spark.sources.webdataset import (read_webdataset,
                                                    write_webdataset)


def _assets(spark, n=25, seed=4):
    rng = random.Random(seed)
    rows = [(f"a{i:04d}",
             encode_png(bytes(rng.randrange(256) for _ in range(64)),
                        8, 8, color_type=0),
             "png", f"src{i % 3}", i)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "asset_id string, payload binary, ext string, "
              "source string, rank long")


def test_roundtrip_with_metadata(spark, tmp_path):
    df = _assets(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out, samples_per_shard=10,
                                ext_col="ext")
    assert manifest["n_samples"] == 25 and manifest["n_shards"] == 3
    assert os.path.exists(os.path.join(out, "_manifest.json"))
    back = read_webdataset(spark, out)
    rows = {r.key: r for r in back.collect()}
    assert len(rows) == 25
    orig = {r.asset_id: r for r in df.collect()}
    for k, r in rows.items():
        assert bytes(r.payload) == bytes(orig[k].payload)
        assert r.ext == "png" and r.n_extra_members == 0
        meta = json.loads(r.meta_json)
        assert meta == {"source": orig[k].source, "rank": orig[k].rank}


def test_shards_are_byte_deterministic(spark, tmp_path):
    df = _assets(spark, n=12)
    sums = []
    for run in ("x", "y"):
        out = str(tmp_path / f"wds_{run}")
        write_webdataset(df.repartition(5 if run == "x" else 2), out,
                         samples_per_shard=6, ext_col="ext")
        digest = {}
        for f in sorted(os.listdir(out)):
            if f.endswith(".tar"):
                with open(os.path.join(out, f), "rb") as fh:
                    digest[f] = hashlib.md5(fh.read()).hexdigest()
        sums.append(digest)
    assert sums[0] == sums[1] and len(sums[0]) == 2


def test_member_order_sample_adjacent(spark, tmp_path):
    df = _assets(spark, n=8)
    out = str(tmp_path / "wds_order")
    write_webdataset(df, out, samples_per_shard=100, ext_col="ext")
    tars = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert len(tars) == 1
    with tarfile.open(os.path.join(out, tars[0])) as tf:
        names = [m.name for m in tf]
    # keys ascending; payload member immediately before its json
    keys = [n.split(".")[0] for n in names]
    assert keys == sorted(keys)
    for i in range(0, len(names), 2):
        assert names[i].endswith(".png") and names[i + 1].endswith(".json")
        assert names[i].split(".")[0] == names[i + 1].split(".")[0]


def test_duplicate_key_guard(spark, tmp_path):
    df = spark.createDataFrame(
        [("dup", b"a"), ("dup", b"b")], "asset_id string, payload binary")
    with pytest.raises(Exception, match="duplicate sample key"):
        write_webdataset(df, str(tmp_path / "wds_dup"),
                         samples_per_shard=10)


def test_media_prep_to_webdataset_e2e(spark, tmp_path):
    """The full media story: curate (near-dup collapse) → shard."""
    from llmxmapreduce_spark.pipelines.media_prep import (MediaPrepConfig,
                                                          run_media_prep)
    rng = random.Random(7)
    px_a = bytes(rng.randrange(256) for _ in range(256))
    px_b = bytes(rng.randrange(256) for _ in range(256))
    base = encode_png(px_a, 16, 16, color_type=0)
    df = spark.createDataFrame(
        [("k0", base), ("k1", base),
         ("k2", encode_png(px_b, 16, 16, color_type=0))],
        "asset_id string, payload binary")
    kept, _ = run_media_prep(df, MediaPrepConfig(min_bytes=8))
    out = str(tmp_path / "wds_e2e")
    manifest = write_webdataset(kept, out, samples_per_shard=10)
    assert manifest["n_samples"] == 2          # exact dup collapsed
    back = read_webdataset(spark, out)
    metas = {r.key: json.loads(r.meta_json) for r in back.collect()}
    assert set(metas) == {"k0", "k2"}
    assert all("dhash" in m for m in metas.values())   # admission state rides


def test_stream_webdataset_micro_batches(spark, tmp_path):
    """stream ≡ batch over landing shards, one micro-batch per tar."""
    import time

    from llmxmapreduce_spark.sources.webdataset import stream_webdataset
    land = str(tmp_path / "landing")
    os.makedirs(land)
    for i, n in enumerate((4, 3)):
        df = _assets(spark, n=n, seed=40 + i).withColumn(
            "asset_id", F.concat(F.lit(f"b{i}_"), F.col("asset_id")))
        write_webdataset(df, str(tmp_path / f"stage{i}"),
                         samples_per_shard=100, ext_col="ext")
        tars = [f for f in os.listdir(str(tmp_path / f"stage{i}"))
                if f.endswith(".tar")]
        os.rename(os.path.join(str(tmp_path / f"stage{i}"), tars[0]),
                  os.path.join(land, f"landed-{i}.tar"))
        time.sleep(1.1)
    stream = stream_webdataset(spark, land, max_files_per_trigger=1)
    q = (stream.writeStream.format("memory").queryName("wds_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("wds_stream").collect()
    assert len(got) == 7
    assert all(r.ingest_ts is not None for r in got)
    batch = read_webdataset(spark, land).collect()
    assert {(r.key, bytes(r.payload)) for r in got} == \
           {(r.key, bytes(r.payload)) for r in batch}


def test_multi_payload_samples_lossless(spark, tmp_path):
    """Round-9 ADVICE regression: an externally-produced WebDataset
    with .jpg + .txt (+ a colliding second .txt) per sample keeps every
    member on read — extras surface in the extra_payloads map."""
    import io
    import tarfile

    out = str(tmp_path / "ext_wds")
    os.makedirs(out)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        def add(name, blob):
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
        add("s0.jpg", b"IMGBYTES")
        add("s0.txt", b"a caption")
        add("s0.json", b'{"k": 1}')
        add("s1.jpg", b"IMG2")
        add("s1.txt", b"first")
        add("s1.ocr.txt", b"second-colliding-ext")
    with open(os.path.join(out, "shard-0.tar"), "wb") as f:
        f.write(buf.getvalue())

    rows = {r.key: r for r in read_webdataset(spark, out).collect()}
    s0 = rows["s0"]
    assert s0.ext == "jpg" and bytes(s0.payload) == b"IMGBYTES"
    assert s0.meta_json == '{"k": 1}'
    assert s0.n_extra_members == 1
    assert {k: bytes(v) for k, v in s0.extra_payloads.items()} == {
        "txt": b"a caption"}
    # "s1.ocr.txt" groups under base "s1.ocr" (splitext convention) —
    # the collision-suffix path is exercised with same-base same-ext
    s1 = rows["s1"]
    assert s1.n_extra_members == 1
    assert bytes(s1.extra_payloads["txt"]) == b"first" or \
        bytes(s1.payload) == b"IMG2"
