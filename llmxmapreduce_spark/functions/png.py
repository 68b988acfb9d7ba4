"""Stdlib-only PNG codec (zlib + struct — no PIL/libvips).

Closes the "one real format" gap in the multimodal stack: the container
ships no image libraries, so the decode/resize steps in
``operators/multimodal.py`` were environmental stubs behind injectable
seams.  PNG needs nothing beyond the standard library — the format is
chunked (length/type/data/CRC32), pixel data is zlib-deflated scanlines
with five per-row predictive filters (PNG spec, RFC 2083 §6) — so this
module implements a real decode → pixels → re-encode round trip:

- :func:`decode_png` — signature + chunk walk (CRC-verified), IHDR
  parse, IDAT concat + inflate, per-scanline UN-filtering (None/Sub/Up/
  Average/Paeth).  8-bit depth, color types 0 (gray), 2 (RGB), 4
  (gray+alpha), 6 (RGBA); anything else raises ``ValueError`` (palette/
  16-bit/interlace are out of scope for a vendored codec — callers fall
  back to the sentinel path, the D8 contract).
- :func:`encode_png` — filter-0 scanlines, one IDAT, spec CRCs.
- :func:`resize_nearest` / :func:`png_resizer` — nearest-neighbor
  downscale wired for ``multimodal.resize_images(resizer=png_resizer)``.
- :func:`png_decoder` — drop-in for
  ``multimodal.extract_features(decoder=png_decoder)``.

Pure per-payload functions: they run INSIDE the existing mapInPandas
operators, so the Spark-side contracts (Arrow batch shape, sentinel
rows, payload locality) are unchanged and already tested."""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, color_type, pixels) with ``pixels`` the raw
    row-major samples (filter bytes removed, filters undone).  Raises
    ``ValueError`` on anything that is not a supported 8-bit
    non-interlaced PNG — callers treat that as decode failure."""
    if not payload.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(_SIG), None, []
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype} "
            f"interlace={interlace}) — 8-bit gray/RGB/GA/RGBA only")
    ch = CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("pixel data size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:                                    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:                                  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:                                  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:                                  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter type {f}")
        out += line
        prev = bytes(line)
    return w, h, ctype, bytes(out)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               color_type: int = 2) -> bytes:
    """Raw row-major samples → PNG bytes (filter 0 per scanline, one
    IDAT).  The inverse of :func:`decode_png` up to compression."""
    ch = CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError("pixels size does not match dimensions")
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 9))
            + _chunk(b"IEND", b""))


def resize_nearest(pixels: bytes, w: int, h: int, channels: int,
                   tw: int, th: int) -> bytes:
    """Nearest-neighbor resample to tw×th (deterministic source-pixel
    election: floor(t·src/target), the standard NN grid)."""
    out = bytearray()
    for ty in range(th):
        sy = min(h - 1, ty * h // th)
        base = sy * w
        for tx in range(tw):
            sx = min(w - 1, tx * w // tw)
            o = (base + sx) * channels
            out += pixels[o:o + channels]
    return bytes(out)


def resize_bilinear(pixels: bytes, w: int, h: int, channels: int,
                    tw: int, th: int) -> bytes:
    """Bilinear resample to tw×th with the half-pixel-center convention
    (``src = (t + 0.5)·scale − 0.5``, edges clamped — the OpenCV/PIL
    default): the interpolating resize a training pipeline wants for
    thumbnails/normalization, where nearest-neighbor aliases."""
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64) \
        .reshape(h, w, channels)
    sy = (np.arange(th) + 0.5) * (h / th) - 0.5
    sx = (np.arange(tw) + 0.5) * (w / tw) - 0.5
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.round(out), 0, 255).astype(np.uint8).tobytes()


def png_decoder(payload: bytes):
    """Drop-in for ``multimodal.extract_features(decoder=...)``: decodes
    or raises (ValueError → decode_ok=false sentinel row)."""
    return decode_png(payload)


def png_resizer(payload: bytes, target_w: int, target_h: int,
                method: str = "nearest") -> bytes:
    """Drop-in for ``multimodal.resize_images(resizer=...)``: decode →
    resample (``method`` 'nearest' or 'bilinear') → re-encode, same
    color type.  Pin the method with ``functools.partial``."""
    w, h, ctype, px = decode_png(payload)
    fn = resize_bilinear if method == "bilinear" else resize_nearest
    return encode_png(fn(px, w, h, CHANNELS[ctype], target_w, target_h),
                      target_w, target_h, ctype)


def probe_png(payload: bytes) -> dict:
    """Metadata-only probe (IHDR read, no inflate) →
    ``{width, height, channels, codec}``."""
    if not payload.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    if payload[12:16] != b"IHDR" or len(payload) < 29:
        raise ValueError("PNG: missing IHDR")
    w, h = struct.unpack(">II", payload[16:24])
    ctype = payload[25]
    return {"width": w, "height": h,
            "channels": CHANNELS.get(ctype), "codec": "png"}
