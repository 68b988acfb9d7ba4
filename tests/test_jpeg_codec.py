"""Stdlib+numpy baseline JPEG codec (functions/jpeg.py): DCT pair
pinned to orthonormality and a hand-computed DC case, exact flat-block
roundtrips, quantization-tolerance roundtrips for 4:4:4 / 4:2:0 / progressive /
grayscale / odd dimensions / restart intervals, magnitude↔extend
inverse, zigzag permutation sanity, error paths, and the multimodal
extract_features/resize_images seam with the real codec."""

import numpy as np
import pytest

from llmxmapreduce_spark.functions import jpeg as J


def test_zigzag_is_a_permutation():
    assert sorted(J.ZIGZAG) == list(range(64))
    # first diagonal steps of T.81 Figure 5
    assert J.ZIGZAG[:8] == [0, 1, 8, 16, 9, 2, 3, 10]


def test_dct_pair_orthonormal_and_dc_hand_value():
    rng = np.random.default_rng(0)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(J.idct2(J.fdct2(b)), b, atol=1e-10)
    # flat block value v: DC = sum/8 = 8·(v-128), every AC exactly 0
    f = J.fdct2(np.full((8, 8), 52.0) - 128.0)
    assert abs(f[0, 0] - 8 * (52 - 128)) < 1e-9
    assert np.abs(f).sum() - abs(f[0, 0]) < 1e-9


def test_magnitude_extend_inverse():
    for v in list(range(-300, 301)) + [-32767, 32767]:
        s, mag = J._magnitude(v)
        assert J._extend(mag, s) == v
        assert s == (abs(v)).bit_length()


def test_flat_blocks_roundtrip_exactly():
    """A uniform image is DC-only; DC survives quantization exactly
    whenever round(DC/q)·q reproduces it — true for every level at
    q90's luma table — so decode must return the EXACT input bytes."""
    for val in (0, 17, 52, 128, 200, 255):
        px = bytes([val]) * (24 * 16)
        w, h, nc, out = J.decode_jpeg(
            J.encode_jpeg(px, 24, 16, channels=1, quality=90))
        assert (w, h, nc) == (24, 16, 1)
        assert out == px


@pytest.mark.parametrize("sub,ri", [("4:4:4", 0), ("4:4:4", 3),
                                    ("4:2:0", 0), ("4:2:0", 3)])
def test_rgb_roundtrip_within_quantization(sub, ri):
    """Smooth (non-wrapping) ramps at q=90 must come back within a few
    levels per channel in every mode; restart intervals must not change
    the decoded image."""
    H, W = 37, 53
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([xx * 4, yy * 5, xx * 2 + yy * 2],
                   axis=-1).astype(np.uint8)   # max 212, no wrap edges
    data = J.encode_jpeg(img.tobytes(), W, H, 3, quality=90,
                         subsampling=sub, restart_interval=ri)
    w, h, nc, out = J.decode_jpeg(data)
    assert (w, h, nc) == (W, H, 3)
    got = np.frombuffer(out, np.uint8).reshape(H, W, 3).astype(int)
    err = np.abs(got - img.astype(int))
    assert err.mean() < 2.5 and err.max() <= 20
    if ri:
        assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RSTn present
        base = J.decode_jpeg(J.encode_jpeg(
            img.tobytes(), W, H, 3, quality=90, subsampling=sub))[3]
        assert base == out                     # RST is framing only


def test_sharp_content_444_high_quality():
    """A pixel checkerboard (worst-case AC energy) at q=95, 4:4:4 —
    the no-chroma-loss mode must track it closely."""
    H, W = 16, 24
    cb = ((np.indices((H, W)).sum(axis=0) % 2) * 255).astype(np.uint8)
    img = np.stack([cb, 255 - cb, np.full_like(cb, 77)], axis=-1)
    w, h, nc, out = J.decode_jpeg(J.encode_jpeg(
        img.tobytes(), W, H, 3, quality=95, subsampling="4:4:4"))
    got = np.frombuffer(out, np.uint8).reshape(H, W, 3).astype(int)
    assert np.abs(got - img.astype(int)).mean() < 3


def test_grayscale_odd_dims_quality_monotone():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    errs = []
    for q in (50, 75, 95):
        w, h, nc, out = J.decode_jpeg(
            J.encode_jpeg(g.tobytes(), 23, 19, 1, quality=q))
        assert (w, h, nc) == (23, 19, 1)
        got = np.frombuffer(out, np.uint8).reshape(19, 23).astype(int)
        errs.append(np.abs(got - g.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]         # more quality, less error


def test_error_paths():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")
    good = J.encode_jpeg(bytes(64), 8, 8, 1)
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:40])               # truncated mid-segment
    # flip SOF0 -> SOF3 (lossless): must refuse, not mis-decode
    i = good.find(b"\xff\xc0")
    lossless = good[:i] + b"\xff\xc3" + good[i + 2:]
    with pytest.raises(ValueError, match="SOF"):
        J.decode_jpeg(lossless)
    # SOF0 -> SOF2 with the baseline 0..63 scan: an ILLEGAL progressive
    # scan (DC and AC may not mix) — refuse, not mis-decode
    prog = good[:i] + b"\xff\xc2" + good[i + 2:]
    with pytest.raises(ValueError, match="DC and AC"):
        J.decode_jpeg(prog)
    with pytest.raises(ValueError, match="channels"):
        J.encode_jpeg(bytes(8 * 8 * 2), 8, 8, 2)
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg(bytes(8 * 8 * 3), 8, 8, 3, subsampling="4:1:1")


def test_multimodal_seams_with_real_jpeg(spark):
    """Third real format through the injectable seams: a valid JPEG
    decodes (decode_ok=true), garbage degrades to the D8 sentinel row,
    and resize_images re-encodes at the target dimensions."""
    from llmxmapreduce_spark.operators import multimodal as mm

    flat = J.encode_jpeg(bytes([90, 40, 200]) * 64, 8, 8, 3, quality=90)
    assets = spark.createDataFrame(
        [("j1", "image", bytearray(flat), 8, 8, None, None),
         ("j2", "image", bytearray(b"not an image"), None, None, None,
          None)],
        "asset_id string, media_type string, payload binary, width int, "
        "height int, duration_ms long, codec string")
    feats = {r["asset_id"]: r for r in
             mm.extract_features(assets, decoder=J.jpeg_decoder).collect()}
    assert feats["j1"]["decode_ok"] is True
    assert feats["j2"]["decode_ok"] is False
    assert "ValueError" in feats["j2"]["decode_error"]

    resized = {r["asset_id"]: r for r in
               mm.resize_images(assets, target_w=2, target_h=2,
                                resizer=J.jpeg_resizer).collect()}
    assert resized["j1"]["resize_ok"] is True
    w, h, nc, px = J.decode_jpeg(bytes(resized["j1"]["payload"]))
    assert (w, h, nc) == (2, 2, 3)
    got = np.frombuffer(px, np.uint8).reshape(2, 2, 3).astype(int)
    assert np.abs(got - np.array([90, 40, 200])).max() <= 6
    assert resized["j2"]["resize_ok"] is False


@pytest.mark.parametrize("case", ["smooth444", "smooth420", "noise444",
                                  "noise420", "gray", "flat"])
def test_progressive_decodes_identical_to_baseline(case):
    """encode_jpeg_progressive writes the SAME quantized coefficients
    as the baseline encoder, so decoding both files must give BIT-
    IDENTICAL pixels — one equality that pins every progressive decode
    path (DC first at Al=1 + refinement, banded AC first passes at
    Al=2/1, successive-approximation AC refinements with EOBRUN,
    correction bits, ZRL-over-history) against the long-verified
    sequential path."""
    rng = np.random.default_rng(3)
    H, W = 37, 53
    yy, xx = np.mgrid[0:H, 0:W]
    smooth = np.stack([xx * 4, yy * 5, xx * 2 + yy * 2],
                      axis=-1).astype(np.uint8)
    imgs = {
        "smooth444": (smooth, 3, "4:4:4"),
        "smooth420": (smooth, 3, "4:2:0"),
        "noise444": (rng.integers(0, 256, (24, 31, 3), dtype=np.uint8),
                     3, "4:4:4"),
        "noise420": (rng.integers(0, 256, (24, 31, 3), dtype=np.uint8),
                     3, "4:2:0"),
        "gray": (rng.integers(0, 256, (19, 23), dtype=np.uint8)[..., None],
                 1, None),
        "flat": (np.full((32, 32, 3), 130, dtype=np.uint8), 3, "4:4:4"),
    }
    img, ch, sub = imgs[case]
    h, w = img.shape[:2]
    kw = dict(quality=75) if sub is None else \
        dict(quality=75, subsampling=sub)
    data = J.encode_jpeg_progressive(img.tobytes(), w, h, ch, **kw)
    assert b"\xff\xc2" in data                 # really SOF2
    assert data.count(b"\xff\xda") >= 5        # really multi-scan
    base = J.decode_jpeg(J.encode_jpeg(img.tobytes(), w, h, ch, **kw))
    prog = J.decode_jpeg(data)
    assert prog[:3] == base[:3]
    assert prog[3] == base[3]


def test_progressive_quality_sweep_roundtrip():
    """End-to-end quality check of the progressive path on its own: the
    decoded image must track the source within quantization error."""
    H, W = 21, 34
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([xx * 6, yy * 9, np.full((H, W), 64)],
                   axis=-1).astype(np.uint8)
    for q in (50, 90):
        w, h, nc, out = J.decode_jpeg(J.encode_jpeg_progressive(
            img.tobytes(), W, H, 3, quality=q))
        got = np.frombuffer(out, np.uint8).reshape(H, W, 3).astype(int)
        assert np.abs(got - img.astype(int)).mean() < (6 if q == 50 else 2)
