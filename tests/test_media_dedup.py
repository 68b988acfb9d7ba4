"""Perceptual media dedup: pure-integer hash primitives vs naive
references, the cross-format showcase (same picture as PNG and JPEG —
byte checksums differ, dhash pairs them), the banded Hamming join's
exactness vs a brute-force all-pairs reference, degenerate-bucket
guardrail, D8 decode sentinels, audio fingerprint robustness, and the
e2e media_dedup canonicalization."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.functions.jpeg import encode_jpeg, jpeg_decoder
from llmxmapreduce_spark.functions.png import encode_png, png_decoder
from llmxmapreduce_spark.functions.wav import decode_wav, encode_wav
from llmxmapreduce_spark.operators.media_dedup import (
    ahash_bits, audio_fingerprint_bits, audio_hashes, box_mean_grid,
    dhash_bits, hamming_neardup_pairs, image_hashes, media_dedup,
    pixels_to_gray)


def _rand_gray(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h))


def _rand_rgb(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------- primitives

def test_pixels_to_gray_channel_inference():
    # gray passes through
    assert pixels_to_gray(2, 1, bytes([10, 200])) == [10, 200]
    # gray+alpha takes channel 0
    assert pixels_to_gray(2, 1, bytes([10, 255, 200, 0])) == [10, 200]
    # rgb uses integer BT.601
    px = bytes([255, 0, 0, 0, 255, 0])
    assert pixels_to_gray(2, 1, px) == [(299 * 255) // 1000,
                                        (587 * 255) // 1000]
    # rgba ignores alpha
    px4 = bytes([0, 0, 255, 9, 10, 10, 10, 9])
    assert pixels_to_gray(2, 1, px4) == [(114 * 255) // 1000, 10]
    with pytest.raises(ValueError):
        pixels_to_gray(3, 1, bytes(4))        # not a whole plane count


def test_box_mean_grid_matches_naive():
    w, h = 29, 17
    gray = list(_rand_gray(w, h, 7))
    grid = box_mean_grid(gray, w, h, 9, 8)
    for r in range(8):
        y0, y1 = (r * h) // 8, ((r + 1) * h) // 8
        for c in range(9):
            x0, x1 = (c * w) // 9, ((c + 1) * w) // 9
            vals = [gray[y * w + x] for y in range(y0, y1)
                    for x in range(x0, x1)]
            assert grid[r][c] == sum(vals) // len(vals)
    with pytest.raises(ValueError):
        box_mean_grid(gray, 5, 5, 9, 8)       # smaller than the grid


def test_dhash_hand_computed_on_grid_sized_image():
    # 9x8 image = one pixel per box; bit r*8+c = pix[c+1] > pix[c]
    w, h = 9, 8
    gray = _rand_gray(w, h, 3)
    got = dhash_bits(w, h, gray)
    want = 0
    for r in range(8):
        for c in range(8):
            if gray[r * w + c + 1] > gray[r * w + c]:
                want |= 1 << (r * 8 + c)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want


def test_ahash_and_signed_wrap():
    # image whose top-right boxes are bright → high bits set → negative
    w, h = 8, 8
    gray = bytes([255 if i >= 32 else 0 for i in range(64)])
    a = ahash_bits(w, h, gray)
    assert a < 0                               # bit 63 is set
    # mean is 127 → exactly the bright half is above it
    assert (a & ((1 << 64) - 1)) == sum(1 << i for i in range(32, 64))


def test_dhash_stable_under_small_perturbation_and_rescale():
    w, h = 40, 32
    gray = _rand_gray(w, h, 11)
    base = dhash_bits(w, h, gray)
    pert = bytearray(gray)
    for i in range(0, len(pert), 97):
        pert[i] = min(255, pert[i] + 3)
    assert _ham(base, dhash_bits(w, h, bytes(pert))) <= 6
    # different image is far
    other = dhash_bits(w, h, _rand_gray(w, h, 12))
    assert _ham(base, other) > 10


# ------------------------------------------------------- banded Hamming join

def test_hamming_pairs_exact_vs_bruteforce(spark):
    rng = random.Random(5)
    n = 160
    hashes = []
    for i in range(n):
        if i % 4 == 0 and i:
            # perturb an earlier hash by 0-4 bit flips → planted neighbors
            h = hashes[rng.randrange(i)][1]
            for _ in range(rng.randrange(5)):
                h ^= 1 << rng.randrange(64)
        else:
            h = rng.getrandbits(64)
        hashes.append((f"a{i:03d}", h - (1 << 64) if h >= 1 << 63 else h))
    df = spark.createDataFrame(hashes, "asset_id string, dhash long")
    got = {(r.id_a, r.id_b, r.distance) for r in hamming_neardup_pairs(
        df, bands=4, max_distance=3).collect()}
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            d = _ham(hashes[i][1], hashes[j][1])
            if d <= 3:
                a, b = sorted((hashes[i][0], hashes[j][0]))
                want.add((a, b, d))
    assert got == want and want              # exact, and non-trivial


def test_hamming_pairs_guards(spark):
    df = spark.createDataFrame([("a", 0), ("b", 1)],
                               "asset_id string, dhash long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, bands=4, max_distance=4)   # pigeonhole
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, bands=5)                   # 5 ∤ 64
    # null hashes never pair
    df2 = spark.createDataFrame([("a", 7), ("b", 7), ("c", None)],
                                "asset_id string, dhash long")
    got = hamming_neardup_pairs(df2, bands=4, max_distance=1).collect()
    assert [(r.id_a, r.id_b, r.distance) for r in got] == [("a", "b", 0)]


def test_hamming_max_bucket_guardrail(spark):
    # 50 identical hashes: without the cap → C(50,2) pairs; cap 10 drops
    # every bucket (all four bands share one value) → no pairs.
    rows = [(f"x{i:02d}", 12345) for i in range(50)]
    df = spark.createDataFrame(rows, "asset_id string, dhash long")
    assert hamming_neardup_pairs(df, bands=4, max_distance=1).count() == 1225
    assert hamming_neardup_pairs(df, bands=4, max_distance=1,
                                 max_bucket=10).count() == 0


def test_hamming_pairs_on_simhash64(spark):
    """The generic banded join composes with the text layer: near-dup
    texts pair straight off simhash64_fast — a fully-JVM text near-dup
    path (no shingle arrays, no python) complementing MinHash."""
    from llmxmapreduce_spark.operators.dedup import simhash64_fast
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    rows = [(1, base), (2, base.replace("green", "blue")),
            (3, "completely different words about spark shuffles and "
                "catalyst optimizer internals at massive scale today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = simhash64_fast(df)
    pairs = hamming_neardup_pairs(
        hashed, id_col="doc_id", hash_col="simhash",
        bands=8, max_distance=7).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert (1, 2) in got and not any(3 in p for p in got)


# --------------------------------------------------------- Spark image path

def test_cross_format_perceptual_dup(spark):
    """The LAION story: one picture, stored once as PNG and once as
    JPEG.  Byte checksums differ; the perceptual hashes pair them."""
    w, h = 64, 48
    rgb = _rand_rgb(w, h, 21)
    # smooth the random field so JPEG quantization noise stays local
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.int32)
    for _ in range(3):
        arr = (arr + np.roll(arr, 1, 0) + np.roll(arr, 1, 1)
               + np.roll(arr, -1, 0) + np.roll(arr, -1, 1)) // 5
    smooth = arr.astype(np.uint8).tobytes()
    png_payload = encode_png(smooth, w, h, color_type=2)
    jpg_payload = encode_jpeg(smooth, w, h, quality=92)
    other = encode_png(_rand_gray(w, h, 99), w, h, color_type=0)

    def dispatch(payload: bytes):
        if payload[:2] == b"\xff\xd8":
            return jpeg_decoder(payload)
        return png_decoder(payload)

    df = spark.createDataFrame(
        [("png_a", png_payload), ("jpg_a", jpg_payload), ("png_b", other)],
        "asset_id string, payload binary")
    hashes = image_hashes(df, decoder=dispatch)
    rows = {r.asset_id: r for r in hashes.collect()}
    assert all(r.decode_ok for r in rows.values())
    assert rows["png_a"].width == w and rows["png_a"].height == h
    # same picture → tiny distance; different picture → far
    assert _ham(rows["png_a"].dhash, rows["jpg_a"].dhash) <= 6
    assert _ham(rows["png_a"].dhash, rows["png_b"].dhash) > 10
    pairs = hamming_neardup_pairs(hashes, bands=8, max_distance=6).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {("jpg_a", "png_a")}


def test_image_hashes_decode_sentinel(spark):
    df = spark.createDataFrame(
        [("ok", encode_png(_rand_gray(16, 16, 1), 16, 16, color_type=0)),
         ("bad", b"not a png"), ("empty", None)],
        "asset_id string, payload binary")
    rows = {r.asset_id: r for r in
            image_hashes(df, decoder=png_decoder).collect()}
    assert rows["ok"].decode_ok and rows["ok"].dhash is not None
    assert not rows["bad"].decode_ok and rows["bad"].dhash is None
    assert "ValueError" in rows["bad"].decode_error
    assert not rows["empty"].decode_ok and rows["empty"].n_bytes == 0


def test_media_dedup_e2e(spark):
    """Planted cluster of three re-encodings collapses to one survivor;
    the unrelated asset and the undecodable asset survive untouched."""
    w, h = 32, 32
    gray = _rand_gray(w, h, 33)
    variants = []
    for i, delta in enumerate((0, 2, -2)):
        px = bytes(min(255, max(0, b + delta)) for b in gray)
        variants.append((f"v{i}", encode_png(px, w, h, color_type=0)))
    assets = variants + [
        ("solo", encode_png(_rand_gray(w, h, 44), w, h, color_type=0)),
        ("broken", b"\x00\x01"),
    ]
    df = spark.createDataFrame(assets, "asset_id string, payload binary")
    hashes = image_hashes(df, decoder=png_decoder)
    kept = media_dedup(df, hashes, bands=8, max_distance=6)
    ids = {r.asset_id for r in kept.select("asset_id").collect()}
    assert "solo" in ids and "broken" in ids
    assert len(ids & {"v0", "v1", "v2"}) == 1
    assert min(ids & {"v0", "v1", "v2"}) == "v0"     # min-id representative
    # keep_by policy: largest payload wins its cluster
    kept2 = media_dedup(df.withColumn("sz", F.length("payload")), hashes,
                        bands=8, max_distance=6, keep_by="sz")
    ids2 = {r.asset_id for r in kept2.select("asset_id").collect()}
    assert len(ids2 & {"v0", "v1", "v2"}) == 1


# ----------------------------------------------------------------- audio

def test_audio_fingerprint_volume_invariance_and_spark_path(spark):
    t = np.arange(8_000)
    beat = (np.sin(t / 30) * (1 + np.sign(np.sin(t / 500))) * 8_000)
    clip = beat.astype(np.int16).reshape(-1, 1)
    loud = (clip.astype(np.int32) * 2).clip(-32768, 32767).astype(np.int16)
    other = (np.sin(t / 7) * 12_000 * np.sign(np.sin(t / 150 + 1))
             ).astype(np.int16).reshape(-1, 1)
    rows = [("quiet", encode_wav(clip, 16_000)),
            ("loud", encode_wav(loud, 16_000)),
            ("other", encode_wav(other, 16_000)),
            ("noise", b"RIFFgarbage")]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    hashes = audio_hashes(df, decoder=decode_wav)
    out = {r.asset_id: r for r in hashes.collect()}
    assert out["quiet"].decode_ok and out["quiet"].sample_rate == 16_000
    assert not out["noise"].decode_ok
    # volume scaling preserves the envelope shape exactly here
    assert _ham(out["quiet"].fingerprint, out["loud"].fingerprint) <= 4
    assert _ham(out["quiet"].fingerprint, out["other"].fingerprint) > 8
    pairs = hamming_neardup_pairs(hashes, hash_col="fingerprint",
                                  bands=8, max_distance=4).collect()
    assert ("loud", "quiet") in {(p.id_a, p.id_b) for p in pairs}


def test_auto_image_decoder_dispatch():
    from llmxmapreduce_spark.operators.media_dedup import auto_image_decoder
    w, h = 16, 16
    gray = _rand_gray(w, h, 8)
    pw, phh, _, ppx = auto_image_decoder(encode_png(gray, w, h, color_type=0))
    assert (pw, phh, ppx) == (w, h, gray)
    jw, jh, jc, _ = auto_image_decoder(encode_jpeg(
        _rand_rgb(w, h, 9), w, h, quality=90))
    assert (jw, jh, jc) == (w, h, 3)
    with pytest.raises(ValueError):
        auto_image_decoder(b"GIF89a notsupported")


def test_hamming_dedup_incremental(spark):
    """Cross-corpus dup dropped, within-shard cluster keeps min id,
    clean + undecodable (null-hash) new assets pass through; empty
    corpus degenerates to within-shard dedup."""
    from llmxmapreduce_spark.operators.media_dedup import (
        hamming_dedup_incremental)
    corpus = spark.createDataFrame(
        [("c0", 100), ("c1", 2048)], "asset_id string, dhash long")
    # n0 ≈ c0 (distance 1); n1/n2 a within-shard pair; n3 clean; n4 broken
    new_hashes = spark.createDataFrame(
        [("n0", 101), ("n1", 7 << 32), ("n2", (7 << 32) | 2),
         ("n3", -1), ("n4", None)],
        "asset_id string, dhash long")
    new_assets = new_hashes.selectExpr("asset_id", "dhash as payload_stub")
    kept = {r.asset_id for r in hamming_dedup_incremental(
        new_assets, new_hashes, corpus).collect()}
    assert kept == {"n1", "n3", "n4"}
    # empty corpus: only within-shard dedup applies
    empty = spark.createDataFrame([], "asset_id string, dhash long")
    kept2 = {r.asset_id for r in hamming_dedup_incremental(
        new_assets, new_hashes, empty).collect()}
    assert kept2 == {"n0", "n1", "n3", "n4"}


# ----------------------------------------------------------------- video

def test_framepack_roundtrip_and_errors():
    from llmxmapreduce_spark.operators.media_dedup import (
        decode_framepack, encode_framepack)
    frames = [b"abc", b"", b"\x00" * 10]
    assert decode_framepack(encode_framepack(frames)) == frames
    assert decode_framepack(encode_framepack([])) == []
    packed = encode_framepack(frames)
    with pytest.raises(ValueError):
        decode_framepack(b"NOPE" + packed[4:])        # bad magic
    with pytest.raises(ValueError):
        decode_framepack(packed[:-2])                 # truncated frame
    with pytest.raises(ValueError):
        decode_framepack(packed + b"x")               # trailing bytes


def test_video_neardup_vote_exact_vs_bruteforce(spark):
    """Synthetic frame-hash rows: operator votes == brute-force
    containment over exact hash matches."""
    from llmxmapreduce_spark.operators.media_dedup import (
        video_neardup_pairs)
    rng = random.Random(17)
    vids = {}
    pool = [rng.getrandbits(63) for _ in range(40)]
    for v in range(12):
        k = rng.randrange(3, 8)
        vids[f"v{v:02d}"] = [rng.choice(pool) for _ in range(k)]
    rows = [(vid, i, h, len(hs))
            for vid, hs in vids.items() for i, h in enumerate(hs)]
    df = spark.createDataFrame(
        rows, "asset_id string, frame_idx int, dhash long, n_frames int")
    got = {(r.id_a, r.id_b): (r.matched_a, r.matched_b, r.n_a, r.n_b)
           for r in video_neardup_pairs(df, min_overlap=0.5).collect()}
    want = {}
    names = sorted(vids)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ha, hb = vids[a], vids[b]
            ma = len({ix for ix, h in enumerate(ha) if h in set(hb)})
            mb = len({ix for ix, h in enumerate(hb) if h in set(ha)})
            if ma and max(ma / len(ha), mb / len(hb)) >= 0.5:
                want[(a, b)] = (ma, mb, len(ha), len(hb))
    assert got == want and want


def test_video_partial_frame_failure_is_whole_asset(spark):
    """A dhash failure mid-video must not leave earlier frames' rows
    next to the sentinel: the whole asset fails as ONE sentinel row."""
    from llmxmapreduce_spark.operators.media_dedup import (
        encode_framepack, framepack_extractor, video_frame_hashes)
    good = encode_png(_rand_gray(16, 16, 1), 16, 16, color_type=0)
    tiny = encode_png(_rand_gray(4, 4, 2), 4, 4, color_type=0)  # < 9x8 grid
    df = spark.createDataFrame(
        [("mixed", encode_framepack([good, tiny, good])),
         ("fine", encode_framepack([good]))],
        "asset_id string, payload binary")
    rows = video_frame_hashes(df, framepack_extractor).collect()
    mixed = [r for r in rows if r.asset_id == "mixed"]
    assert len(mixed) == 1 and not mixed[0].decode_ok
    assert "smaller than hash grid" in mixed[0].decode_error
    assert [r.decode_ok for r in rows if r.asset_id == "fine"] == [True]


def test_video_neardup_cross_codec_e2e(spark):
    """Shifted-window clip detection: video B is frames 1-5 of video A
    re-encoded as JPEG plus one new frame — the vote pairs A and B
    through the codec change; an unrelated video and a broken payload
    don't pair."""
    from llmxmapreduce_spark.operators.media_dedup import (
        encode_framepack, framepack_extractor, video_frame_hashes,
        video_neardup_pairs)
    w, h = 32, 32

    def smooth_rgb(seed):
        arr = np.frombuffer(_rand_rgb(w, h, seed), dtype=np.uint8) \
            .reshape(h, w, 3).astype(np.int32)
        for _ in range(3):
            arr = (arr + np.roll(arr, 1, 0) + np.roll(arr, 1, 1)
                   + np.roll(arr, -1, 0) + np.roll(arr, -1, 1)) // 5
        return arr.astype(np.uint8).tobytes()

    base = [smooth_rgb(100 + i) for i in range(6)]
    vid_a = encode_framepack([encode_png(f, w, h, color_type=2)
                              for f in base])
    vid_b = encode_framepack(
        [encode_jpeg(f, w, h, quality=92) for f in base[1:]]
        + [encode_png(smooth_rgb(999), w, h, color_type=2)])
    vid_c = encode_framepack([encode_png(smooth_rgb(200 + i), w, h,
                                         color_type=2) for i in range(4)])
    df = spark.createDataFrame(
        [("A", vid_a), ("B", vid_b), ("C", vid_c), ("D", b"junk")],
        "asset_id string, payload binary")
    fh = video_frame_hashes(df, framepack_extractor)
    rows = fh.collect()
    assert {r.asset_id for r in rows if not r.decode_ok} == {"D"}
    assert sum(1 for r in rows if r.asset_id == "A") == 6
    pairs = video_neardup_pairs(fh, bands=8, max_distance=6,
                                min_overlap=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {("A", "B")}
    p = pairs[0]
    assert p.matched_a == 5 and p.matched_b == 5
    assert p.n_a == 6 and p.n_b == 6


def test_hamming_incremental_bucketed_state(spark, tmp_path):
    """The persisted banded index: same survivors as the on-the-fly
    corpus path, and the corpus side of the band join reads its
    bucketed layout — only the shard shuffles."""
    from llmxmapreduce_spark.operators.media_dedup import (
        hamming_dedup_incremental, hamming_state_entries,
        write_hamming_state)
    from llmxmapreduce_spark.sources.bucketed import read_bucketed
    corpus = spark.createDataFrame(
        [("c0", 100), ("c1", 2048), ("c2", -1)],
        "asset_id string, dhash long")
    new_hashes = spark.createDataFrame(
        [("n0", 101), ("n1", 7 << 32), ("n2", (7 << 32) | 2),
         ("n3", 4095)], "asset_id string, dhash long")
    new_assets = new_hashes.select("asset_id")
    try:
        write_hamming_state(corpus, "t_ham_state", num_buckets=8,
                            path=str(tmp_path / "hamstate"))
        ce = read_bucketed(spark, "t_ham_state")
        kept_state = {r.asset_id for r in hamming_dedup_incremental(
            new_assets, new_hashes, corpus_entries=ce).collect()}
        kept_plain = {r.asset_id for r in hamming_dedup_incremental(
            new_assets, new_hashes, corpus).collect()}
        assert kept_state == kept_plain == {"n1", "n3"}
        # plan pin on the band join itself: bucketed corpus scan, and
        # the only Exchange is the shard side's.  At test size the
        # corpus would broadcast (which also avoids shuffling it) —
        # force the SMJ/SHJ path the real corpus-sized join takes.
        from llmxmapreduce_spark.sources.bucketed import (
            enable_full_bucketed_scan)
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        prev = enable_full_bucketed_scan(spark)
        try:
            ne = hamming_state_entries(new_hashes)
            j = ne.alias("l").join(ce.alias("r"),
                                   F.expr("l.band_key = r.band_key"))
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan, plan
            n_exchange = sum("Exchange" in ln for ln in plan.splitlines())
            assert n_exchange == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
            for k, v in prev.items():
                spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ham_state")
    # exactly one corpus argument
    with pytest.raises(ValueError):
        hamming_dedup_incremental(new_assets, new_hashes)
    with pytest.raises(ValueError):
        hamming_dedup_incremental(new_assets, new_hashes, corpus,
                                  corpus_entries=corpus)


def test_audio_fingerprint_guards():
    with pytest.raises(ValueError):
        audio_fingerprint_bits(np.zeros((10, 1), dtype=np.int32))  # too short
    with pytest.raises(ValueError):
        audio_fingerprint_bits(np.zeros((100, 1), dtype=np.int32),
                               n_windows=65)


def test_hamming_state_banding_mismatch_raises(spark, tmp_path):
    """Round-9 ADVICE regression: a persisted index written under
    different (bands, bits) would never match any band_key and every
    corpus duplicate would be silently admitted.  The banding now rides
    as column metadata on band_key and is validated before the join."""
    from llmxmapreduce_spark.operators.media_dedup import (
        hamming_dedup_incremental, write_hamming_state)
    from llmxmapreduce_spark.sources.bucketed import read_bucketed
    corpus = spark.createDataFrame(
        [("c0", 100)], "asset_id string, dhash long")
    new_hashes = spark.createDataFrame(
        [("n0", 101)], "asset_id string, dhash long")
    new_assets = new_hashes.select("asset_id")
    try:
        write_hamming_state(corpus, "t_ham_state_b8", bands=8,
                            num_buckets=4,
                            path=str(tmp_path / "hamstate8"))
        ce = read_bucketed(spark, "t_ham_state_b8")
        meta = ce.schema["band_key"].metadata
        assert meta["hamming_bands"] == 8 and meta["hamming_bits"] == 64
        with pytest.raises(ValueError, match="banded with bands=8"):
            hamming_dedup_incremental(new_assets, new_hashes,
                                      corpus_entries=ce, bands=4)
        # matching banding passes and still drops the near-dup
        kept = {r.asset_id for r in hamming_dedup_incremental(
            new_assets, new_hashes, corpus_entries=ce, bands=8,
            max_distance=7).collect()}
        assert kept == set()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ham_state_b8")
