"""Stdlib PNG codec (functions/png.py) + its injection into the
multimodal seams: spec-assembled fixture decode (Sub/Up filtered rows),
all-filter unfiltering, encode/decode round trip, nearest resize, and
the extract_features/resize_images integration with real decode_ok."""

import os
import struct
import zlib

import numpy as np
import pytest

from llmxmapreduce_spark.functions import png as P

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_rgb.png")
# fixture truth: 2x2 RGB, row0 filtered Sub, row1 filtered Up (assembled
# chunk-by-chunk from the spec, independent of this codec)
PIXELS = bytes([255, 0, 0, 0, 255, 0,
                0, 0, 255, 255, 255, 255])


def test_decode_fixture():
    w, h, ctype, px = P.decode_png(open(FIXTURE, "rb").read())
    assert (w, h, ctype) == (2, 2, 2)
    assert px == PIXELS


def _assemble(rows_filtered: bytes, w: int, h: int, ctype: int) -> bytes:
    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows_filtered))
            + chunk(b"IEND", b""))


def test_all_filter_types_unfilter():
    """Each of the five spec filters applied to a known grayscale image
    must un-filter back to the same pixels (filter math from RFC 2083
    §6.2-6.6, applied here by hand)."""
    w = h = 4
    img = bytes(range(16))                      # 4x4 gray, ctype 0
    rows = [img[y * w:(y + 1) * w] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filtered = bytearray()
    prev = bytes(w)
    for y, row in enumerate(rows):
        f = y % 5 if h >= 5 else [0, 1, 2, 4][y]  # cover 0,1,2,4 at 4 rows
        filtered.append(f)
        for i, cur in enumerate(row):
            left = row[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            if f == 0:
                filtered.append(cur)
            elif f == 1:
                filtered.append((cur - left) & 0xFF)
            elif f == 2:
                filtered.append((cur - up) & 0xFF)
            elif f == 3:
                filtered.append((cur - ((left + up) >> 1)) & 0xFF)
            else:
                filtered.append((cur - paeth(left, up, ul)) & 0xFF)
        prev = row
    got = P.decode_png(_assemble(bytes(filtered), w, h, 0))
    assert got == (w, h, 0, img)
    # filter 3 (Average) via a second 5-row image
    img5 = bytes((i * 37) % 256 for i in range(5 * 3))
    rows5 = [img5[y * 3:(y + 1) * 3] for y in range(5)]
    filtered = bytearray()
    prev = bytes(3)
    for y, row in enumerate(rows5):
        filtered.append(3)
        for i, cur in enumerate(row):
            left = row[i - 1] if i else 0
            filtered.append((cur - ((left + prev[i]) >> 1)) & 0xFF)
        prev = row
    assert P.decode_png(_assemble(bytes(filtered), 3, 5, 0)) \
        == (3, 5, 0, img5)


def test_roundtrip_all_color_types():
    rng = np.random.default_rng(11)
    for ctype, ch in P.CHANNELS.items():
        w, h = 7, 5
        px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
        assert P.decode_png(P.encode_png(px, w, h, ctype)) \
            == (w, h, ctype, px)


def test_reject_garbage_and_corruption():
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"JFIF not a png")
    good = bytearray(open(FIXTURE, "rb").read())
    good[30] ^= 0xFF                            # flip a byte inside IDAT
    with pytest.raises(ValueError):
        P.decode_png(bytes(good))
    # 16-bit depth rejected cleanly (unsupported, not mis-decoded)
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        P.decode_png(bad)


def test_resize_nearest():
    # 4x4 gray gradient → 2x2 picks pixels (0,0) (0,2) (2,0) (2,2)
    px = bytes(range(16))
    assert P.resize_nearest(px, 4, 4, 1, 2, 2) == bytes([0, 2, 8, 10])
    out = P.png_resizer(P.encode_png(px, 4, 4, 0), 2, 2)
    assert P.decode_png(out) == (2, 2, 0, bytes([0, 2, 8, 10]))


def test_multimodal_seams_with_real_codec(spark):
    """The injectable seams now run a REAL format end-to-end: a valid
    PNG payload decodes (decode_ok=true), garbage still degrades to the
    D8 sentinel row, and resize_images re-encodes a decodable PNG with
    the target dimensions."""
    from llmxmapreduce_spark.operators import multimodal as mm

    png_bytes = open(FIXTURE, "rb").read()
    assets = spark.createDataFrame(
        [("a1", "image", bytearray(png_bytes), 2, 2, None, None),
         ("a2", "image", bytearray(b"not an image"), None, None, None,
          None)],
        "asset_id string, media_type string, payload binary, width int, "
        "height int, duration_ms long, codec string")
    feats = {r["asset_id"]: r for r in
             mm.extract_features(assets, decoder=P.png_decoder).collect()}
    assert feats["a1"]["decode_ok"] is True
    assert feats["a1"]["decode_error"] is None
    assert feats["a2"]["decode_ok"] is False
    assert "ValueError" in feats["a2"]["decode_error"]

    resized = {r["asset_id"]: r for r in
               mm.resize_images(assets, target_w=1, target_h=1,
                                resizer=P.png_resizer).collect()}
    assert resized["a1"]["resize_ok"] is True
    w, h, ctype, px = P.decode_png(bytes(resized["a1"]["payload"]))
    assert (w, h, ctype) == (1, 1, 2) and px == bytes([255, 0, 0])
    assert resized["a2"]["resize_ok"] is False   # garbage → fake thumb
    assert len(resized["a2"]["payload"]) == 1


def test_resize_bilinear_hand_computed():
    """Half-pixel-center bilinear, checked against hand-derived values:
    a 2x2 gray upscaled to 4x4 — the corner outputs clamp to the source
    corners and the interior mixes at exactly 1/4-3/4 weights."""
    import numpy as np

    src = np.array([[0, 100], [200, 60]], dtype=np.uint8)
    out = np.frombuffer(
        P.resize_bilinear(src.tobytes(), 2, 2, 1, 4, 4),
        dtype=np.uint8).reshape(4, 4).astype(int)
    # corners clamp to the source corners
    assert out[0, 0] == 0 and out[0, 3] == 100
    assert out[3, 0] == 200 and out[3, 3] == 60
    # row 0 interior: src=(x+0.5)*0.5-0.5 → frac 0.25 / 0.75 of (0,100)
    assert out[0, 1] == 25 and out[0, 2] == 75
    # column 0 interior mixes (0,200) at the same weights
    assert out[1, 0] == 50 and out[2, 0] == 150
    # identity resize is exact, channels independent
    rgb = np.arange(2 * 2 * 3, dtype=np.uint8)
    assert P.resize_bilinear(rgb.tobytes(), 2, 2, 3, 2, 2) == rgb.tobytes()
    # downscale averages: 4x4 constant stays constant
    flat = bytes([77]) * 16
    assert P.resize_bilinear(flat, 4, 4, 1, 2, 2) == bytes([77]) * 4


def test_resizers_accept_bilinear_method():
    import numpy as np

    from llmxmapreduce_spark.functions import jpeg as J

    w = h = 8
    grad = np.tile(np.arange(0, 256, 32, dtype=np.uint8), (h, 1))
    png_in = P.encode_png(grad.tobytes(), w, h, color_type=0)
    out = P.png_resizer(png_in, 4, 4, method="bilinear")
    ww, hh, ct, px = P.decode_png(out)
    assert (ww, hh) == (4, 4)
    jp_in = J.encode_jpeg(np.repeat(grad[..., None], 3, -1).tobytes(),
                          w, h, 3, quality=95)
    ww, hh, nc, px = J.decode_jpeg(J.jpeg_resizer(jp_in, 4, 4,
                                                  method="bilinear"))
    assert (ww, hh, nc) == (4, 4, 3)
