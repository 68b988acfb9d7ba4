"""MP4/ISO BMFF metadata prober (functions/mp4.py) + the probe_media
backfill operator: fixtures are hand-assembled box-by-box from ISO
14496-12 (independent of the prober), covering 32/64-bit box sizes,
mvhd/tkhd/mdhd both versions, stsd codec + coded dims, stsz counts,
packed language, malformed-box errors, and the Spark backfill →
frame_sample_plan chain."""

import struct

import pytest

from llmxmapreduce_spark.functions import mp4 as M


def box(typ: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + typ + \
            struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def _mvhd(timescale=1000, duration=9500, version=0) -> bytes:
    if version:
        body = full(1, struct.pack(">QQIQ", 0, 0, timescale, duration)
                    + bytes(80))
    else:
        body = full(0, struct.pack(">IIII", 0, 0, timescale, duration)
                    + bytes(80))
    return box(b"mvhd", body)


def _tkhd(track_id=1, w=640, h=360, version=0) -> bytes:
    if version:
        head = struct.pack(">QQI", 0, 0, track_id) + bytes(4) + \
            struct.pack(">Q", 0)
    else:
        head = struct.pack(">III", 0, 0, track_id) + bytes(4) + \
            struct.pack(">I", 0)
    tail = bytes(8) + bytes(2 + 2 + 2 + 2) + bytes(36) + \
        struct.pack(">II", w << 16, h << 16)
    return box(b"tkhd", full(version, head + tail))


def _mdhd(timescale=90000, duration=855000, lang="eng", version=0) -> bytes:
    code = 0
    for ch in lang:
        code = (code << 5) | (ord(ch) - 0x60)
    if version:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    return box(b"mdhd", full(version, body + struct.pack(">HH", code, 0)))


def _hdlr(handler=b"vide") -> bytes:
    return box(b"hdlr", full(0, bytes(4) + handler + bytes(12) + b"\x00"))


def _stsd(codec=b"avc1", w=640, h=360) -> bytes:
    entry = box(codec, bytes(6) + struct.pack(">H", 1) + bytes(16)
                + struct.pack(">HH", w, h) + bytes(46))
    return box(b"stsd", full(0, struct.pack(">I", 1) + entry))


def _stsz(n=285) -> bytes:
    return box(b"stsz", full(0, struct.pack(">II", 0, n)))


def _trak(**kw) -> bytes:
    stbl = box(b"stbl", _stsd(kw.get("codec", b"avc1"),
                              kw.get("sw", 640), kw.get("sh", 360))
               + _stsz(kw.get("n", 285)))
    mdia = box(b"mdia", _mdhd(version=kw.get("mdhd_v", 0),
                              lang=kw.get("lang", "eng"))
               + _hdlr(kw.get("handler", b"vide"))
               + box(b"minf", stbl))
    return box(b"trak", _tkhd(kw.get("tid", 1), kw.get("w", 640),
                              kw.get("h", 360), kw.get("tkhd_v", 0))
               + mdia)


def _mp4(largesize_moov=False, mvhd_v=0, **trak_kw) -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    moov = box(b"moov", _mvhd(version=mvhd_v) + _trak(**trak_kw),
               largesize=largesize_moov)
    return ftyp + moov + box(b"mdat", b"\x00" * 32)


def test_probe_basic_and_versions():
    for mvhd_v, tkhd_v, mdhd_v, large in [(0, 0, 0, False), (1, 1, 1, True)]:
        info = M.probe_mp4(_mp4(largesize_moov=large, mvhd_v=mvhd_v,
                                tkhd_v=tkhd_v, mdhd_v=mdhd_v))
        assert info["major_brand"] == "isom"
        assert info["timescale"] == 1000
        assert info["duration_ms"] == 9500
        [t] = info["tracks"]
        assert t["track_id"] == 1 and t["handler"] == "vide"
        assert (t["width"], t["height"]) == (640, 360)
        assert t["codec"] == "avc1"
        assert t["timescale"] == 90000 and t["duration_ms"] == 9500
        assert t["language"] == "eng" and t["n_samples"] == 285


def test_probe_audio_track_and_und_language():
    info = M.probe_mp4(_mp4(handler=b"soun", codec=b"mp4a", w=0, h=0,
                            lang="und"))
    [t] = info["tracks"]
    assert t["handler"] == "soun" and t["codec"] == "mp4a"
    assert t["width"] is None and t["height"] is None
    assert t["language"] is None


def test_probe_errors():
    with pytest.raises(ValueError, match="ISO BMFF"):
        M.probe_mp4(b"plainly not a video file at all")
    # a box claiming to overrun the file
    bad = box(b"ftyp", b"isom" + bytes(8))
    bad += struct.pack(">I", 10 ** 6) + b"moov" + bytes(16)
    with pytest.raises(ValueError, match="overruns"):
        M.probe_mp4(bad)
    # ftyp-only (no moov): unprobable, must raise not return empties
    with pytest.raises(ValueError, match="moov"):
        M.probe_mp4(box(b"ftyp", b"isom" + bytes(8)))


def test_probe_media_backfills_and_feeds_frame_plan(spark):
    from llmxmapreduce_spark.operators.multimodal import (
        frame_sample_plan, probe_media)

    good = _mp4()
    assets = spark.createDataFrame(
        [("v1", 1, "video", bytearray(good), None, None, None, None),
         ("v2", 2, "video", bytearray(b"garbage bytes here"), None, None,
          None, None),
         ("i1", 3, "image", bytearray(b"not touched"), 4, 4, None, "png"),
         ("v3", 4, "video", bytearray(good), 1280, None, 2000, None)],
        "asset_id string, doc_id long, media_type string, payload binary, "
        "width int, height int, duration_ms long, codec string")
    out = {r["asset_id"]: r for r in probe_media(assets).collect()}
    v1 = out["v1"]
    assert v1["probe_ok"] is True
    assert (v1["width"], v1["height"]) == (640, 360)
    assert v1["duration_ms"] == 9500 and v1["codec"] == "avc1"
    assert out["v2"]["probe_ok"] is False
    assert "ValueError" in out["v2"]["probe_error"]
    assert out["i1"]["probe_ok"] is None          # not in media_types
    assert out["i1"]["codec"] == "png"
    v3 = out["v3"]                                # catalog outranks probe
    assert v3["width"] == 1280 and v3["duration_ms"] == 2000
    assert v3["height"] == 360                    # only the hole filled

    plan = frame_sample_plan(
        probe_media(assets).filter("probe_ok"), every_ms=1000)
    per_asset = {r["asset_id"] for r in plan.collect()}
    assert per_asset == {"v1", "v3"}
    assert plan.filter("asset_id = 'v1'").count() == 9   # 9500ms // 1000


def test_g711_wav_decode_known_values():
    """G.711 μ-law/A-law WAVs decode through the RIFF walk to 16-bit
    linear with the spec expansion (hand-pinned reference points)."""
    import numpy as np

    from llmxmapreduce_spark.functions import wav as WV

    def riff(fmt_code, data):
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) & 1 else b""))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rate, ch, width, frames = WV.decode_wav(riff(7, bytes([0xFF, 0x00,
                                                           0x80])))
    assert (rate, ch, width) == (8000, 1, 2)
    assert frames[:, 0].tolist() == [0, -32124, 32124]
    rate, ch, width, frames = WV.decode_wav(riff(6, bytes([0xD5, 0x55])))
    assert frames[:, 0].tolist() == [8, -8]
    # probe reports the codec without decoding samples
    assert WV.probe_wav(riff(7, bytes(16)))["codec"] == "ulaw"
    assert WV.probe_wav(riff(6, bytes(16)))["codec"] == "alaw"
    info = WV.probe_wav(riff(7, bytes(8000)))
    assert info["duration_ms"] == 1000 and info["sample_rate"] == 8000


def test_media_prober_dispatch(spark):
    """One prober for every in-container format: JPEG, PNG, WAV, MP4 —
    and probe_media backfills all three asset classes in one pass."""
    import numpy as np

    from llmxmapreduce_spark.functions import jpeg as J
    from llmxmapreduce_spark.functions import png as P
    from llmxmapreduce_spark.functions import wav as WV
    from llmxmapreduce_spark.operators.multimodal import (media_prober,
                                                          probe_media)

    jp = J.encode_jpeg(bytes(16 * 8 * 3), 16, 8, 3)
    pn = P.encode_png(bytes(5 * 4 * 3), 5, 4, color_type=2)
    wv = WV.encode_wav(np.zeros((4000, 1), dtype=np.int32), 8000)
    m4 = _mp4()
    assert media_prober(jp) == {"width": 16, "height": 8, "channels": 3,
                                "progressive": False, "codec": "jpeg"}
    assert media_prober(pn)["codec"] == "png"
    assert media_prober(pn)["width"] == 5
    assert media_prober(wv)["codec"] == "pcm_s16le"
    assert media_prober(wv)["duration_ms"] == 500
    assert media_prober(m4)["tracks"][0]["codec"] == "avc1"
    with pytest.raises(ValueError):
        media_prober(b"unrecognized payload")

    assets = spark.createDataFrame(
        [("i", 1, "image", bytearray(jp), None, None, None, None),
         ("a", 2, "audio", bytearray(wv), None, None, None, None),
         ("v", 3, "video", bytearray(m4), None, None, None, None)],
        "asset_id string, doc_id long, media_type string, payload binary, "
        "width int, height int, duration_ms long, codec string")
    out = {r["asset_id"]: r for r in probe_media(
        assets, prober=media_prober,
        media_types=("image", "audio", "video")).collect()}
    assert all(out[k]["probe_ok"] for k in "iav")
    assert (out["i"]["width"], out["i"]["height"]) == (16, 8)
    assert out["i"]["codec"] == "jpeg"
    assert out["a"]["duration_ms"] == 500 and out["a"]["codec"] == "pcm_s16le"
    assert out["v"]["duration_ms"] == 9500 and out["v"]["codec"] == "avc1"
