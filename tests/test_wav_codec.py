"""Stdlib WAV codec (functions/wav.py) + its injection into the
multimodal seams: hand-assembled RIFF fixture decode, encode/decode
round trips at both widths, hand-computed features on known signals,
linear resample anchors, corruption rejects, and the
extract_features(decoder=..., featurizer=...) integration with real
decode_ok and real (non-histogram) feature values."""

import struct

import numpy as np
import pytest

from llmxmapreduce_spark.functions import wav as W


def _assemble(fmt_body: bytes, data: bytes, pad_junk: bool = True) -> bytes:
    """RIFF container built by hand from the spec, independent of the
    codec's encoder — includes an (ignored, odd-length) LIST chunk to
    exercise even-padding in the walk."""
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if pad_junk:
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_hand_assembled_fixture():
    # 16-bit mono 4-frame file: samples 0, 1000, -1000, 32767
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4h", 0, 1000, -1000, 32767)
    rate, ch, width, frames = W.decode_wav(_assemble(fmt, data))
    assert (rate, ch, width) == (8000, 1, 2)
    assert frames.tolist() == [[0], [1000], [-1000], [32767]]


def test_decode_8bit_centering():
    # 8-bit PCM is unsigned; 128 is silence → centered 0
    fmt = struct.pack("<HHIIHH", 1, 2, 4000, 8000, 2, 8)
    data = bytes([128, 128, 0, 255])              # frame0 silent, frame1 ±
    rate, ch, width, frames = W.decode_wav(_assemble(fmt, data))
    assert (rate, ch, width) == (4000, 2, 1)
    assert frames.tolist() == [[0, 0], [-128, 127]]


def test_roundtrip_both_widths():
    rng = np.random.default_rng(3)
    frames16 = rng.integers(-32768, 32768, size=(250, 2), dtype=np.int64)
    got = W.decode_wav(W.encode_wav(frames16, 22050, sample_width=2))
    assert got[:3] == (22050, 2, 2)
    assert np.array_equal(got[3], frames16)

    frames8 = rng.integers(-128, 128, size=(97, 1), dtype=np.int64)
    got8 = W.decode_wav(W.encode_wav(frames8, 8000, sample_width=1))
    assert got8[:3] == (8000, 1, 1)
    assert np.array_equal(got8[3], frames8)


def test_features_hand_computed():
    # alternating ±Q on a 16-bit mono signal: rms = peak = Q/2^15,
    # every consecutive pair flips sign → zcr 1, flat envelope
    q = 16384
    n = 64
    frames = np.array([q if i % 2 == 0 else -q for i in range(n)])
    f = W.audio_features(W.decode_wav(W.encode_wav(frames, 8000)), n_env=4)
    assert len(f) == 8
    assert f[0] == pytest.approx(n / 8000)        # duration
    assert f[1] == pytest.approx(0.5)             # rms
    assert f[2] == pytest.approx(1.0)             # zcr
    assert f[3] == pytest.approx(0.5)             # peak
    assert f[4:] == pytest.approx([0.5] * 4)      # envelope

    silent = W.audio_features(
        W.decode_wav(W.encode_wav(np.zeros(10, dtype=int), 8000)))
    assert silent == [10 / 8000] + [0.0] * 11


def test_resample_linear_anchors():
    frames = np.array([[0], [100], [200], [300]])
    up = W.resample_linear(frames, 4000, 8000)
    assert up.shape == (8, 1)
    assert up[0, 0] == 0 and up[-1, 0] == 300     # endpoints anchored
    assert list(up[:, 0]) == sorted(up[:, 0])     # monotone ramp stays so
    same = W.resample_linear(frames, 4000, 4000)
    assert np.array_equal(same, frames)


def test_reject_garbage_and_corruption():
    with pytest.raises(ValueError):
        W.decode_wav(b"not audio at all")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    ok = _assemble(fmt, struct.pack("<2h", 1, 2))
    with pytest.raises(ValueError):               # truncated data chunk
        W.decode_wav(ok[:-1])
    bad_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError):               # compressed format tag
        W.decode_wav(_assemble(bad_fmt, b"\x00\x00"))
    with pytest.raises(ValueError):               # 24-bit unsupported
        W.decode_wav(_assemble(
            struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24), b"\x00" * 6))


def test_multimodal_seams_with_real_audio_codec(spark):
    """The injectable seams run REAL audio end-to-end: a valid WAV
    payload decodes (decode_ok=true) and its feature column carries the
    hand-checkable audio descriptor instead of the byte histogram;
    garbage still degrades to the D8 sentinel row WITH the histogram
    fallback feature."""
    from llmxmapreduce_spark.operators import multimodal as mm

    q, n = 16384, 64
    wav_bytes = W.encode_wav(
        np.array([q if i % 2 == 0 else -q for i in range(n)]), 8000)
    assets = spark.createDataFrame(
        [("a1", "audio", bytearray(wav_bytes), None, None, 8, None),
         ("a2", "audio", bytearray(b"static noise"), None, None, None,
          None)],
        "asset_id string, media_type string, payload binary, width int, "
        "height int, duration_ms long, codec string")
    feats = {r["asset_id"]: r for r in
             mm.extract_features(assets, decoder=W.wav_decoder,
                                 featurizer=W.wav_featurizer).collect()}
    assert feats["a1"]["decode_ok"] is True
    assert feats["a1"]["decode_error"] is None
    got = feats["a1"]["feature"]
    assert len(got) == 12
    assert got[0] == pytest.approx(n / 8000)
    assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(1.0)
    assert feats["a2"]["decode_ok"] is False
    assert "ValueError" in feats["a2"]["decode_error"]
    assert len(feats["a2"]["feature"]) == 16      # histogram fallback dim


def test_resample_audio_operator(spark):
    """resample_audio mirrors resize_images: a decodable WAV re-encodes
    at the target rate (duration preserved within a sample), garbage
    keeps its original payload with the D8 sentinel, and non-audio rows
    are excluded by the media_type gate."""
    from llmxmapreduce_spark.operators import multimodal as mm

    frames = np.arange(-400, 400, dtype=np.int64)     # 800 frames @8k
    wav_bytes = W.encode_wav(frames, 8000)
    assets = spark.createDataFrame(
        [("a1", "audio", bytearray(wav_bytes), None, None, 100, None),
         ("a2", "audio", bytearray(b"hiss"), None, None, None, None),
         ("a3", "image", bytearray(b"png?"), None, None, None, None)],
        "asset_id string, media_type string, payload binary, width int, "
        "height int, duration_ms long, codec string")
    out = {r["asset_id"]: r for r in
           mm.resample_audio(assets, target_rate=16_000,
                             resampler=W.wav_resampler).collect()}
    assert set(out) == {"a1", "a2"}                   # image row excluded
    assert out["a1"]["resample_ok"] is True
    assert out["a1"]["sample_rate"] == 16_000
    rate, ch, width, got = W.decode_wav(bytes(out["a1"]["payload"]))
    assert (rate, ch, width) == (16_000, 1, 2)
    assert abs(got.shape[0] - 1600) <= 1              # duration preserved
    assert got[0, 0] == frames[0] and got[-1, 0] == frames[-1]
    assert out["a2"]["resample_ok"] is False
    assert bytes(out["a2"]["payload"]) == b"hiss"     # original kept
    assert out["a2"]["sample_rate"] is None
