"""Dependency-free MP4 / ISO BMFF (ISO 14496-12) metadata prober.

A 100 TB video corpus is curated by CONTAINER METADATA long before any
frame is decoded: duration/resolution/codec gates, per-codec routing,
frame-sampling plans, corrupt-file quarantine.  This module walks the
box structure with stdlib ``struct`` only — no ffmpeg — and returns
exactly the metadata those gates need; actual frame DECODE stays behind
the env-stubbed seam (operators/multimodal.py), which is the honest
split: probing is pure byte-walking, decoding needs codec libraries.

Box grammar per the spec: ``[size:u32][type:4cc][payload]``; size==1 →
64-bit largesize follows; size==0 → box runs to end of enclosure.
Parsed boxes: ftyp (brand), moov/mvhd (movie timescale+duration),
trak/tkhd (track id, presentation width/height as 16.16 fixed point),
mdia/mdhd (media timescale+duration+language, packed 5-bit),
mdia/hdlr (handler: vide/soun/...), stbl/stsd (first sample-entry
fourcc = codec; coded width/height for visual entries), stbl/stsz
(sample count = frame count).  Unknown boxes are skipped by size —
the walker never needs to understand what it doesn't index.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); raises ValueError on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[body:body + 8])
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError(f"mp4: box {typ!r} overruns its enclosure")
        yield typ, body, box_end
        pos = box_end


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """version, position-after-version/flags."""
    return data[pos], pos + 4


def _lang(code: int) -> str | None:
    """mdhd packed 5-bit ISO-639-2/T language ('und' → None)."""
    s = "".join(chr(((code >> sh) & 0x1F) + 0x60) for sh in (10, 5, 0))
    return None if s in ("und", "```") else s


def probe_mp4(payload: bytes) -> dict:
    """→ ``{major_brand, timescale, duration_ms, tracks: [...]}`` with
    one dict per track: ``track_id, handler, codec, width, height,
    duration_ms, timescale, language, n_samples``.  Raises ValueError
    on anything that is not a walkable ISO BMFF file — the multimodal
    seam's decode-failure contract."""
    if len(payload) < 16 or payload[4:8] not in (
            b"ftyp", b"moov", b"free", b"skip", b"wide", b"mdat"):
        raise ValueError("not an ISO BMFF file (no leading box)")
    out: dict = {"major_brand": None, "timescale": None,
                 "duration_ms": None, "tracks": []}
    for typ, b, e in _walk(payload, 0, len(payload)):
        if typ == b"ftyp":
            out["major_brand"] = payload[b:b + 4].decode("latin-1")
        elif typ == b"moov":
            _probe_moov(payload, b, e, out)
    if out["timescale"] is None and not out["tracks"]:
        raise ValueError("mp4: no moov box found (streaming-only or "
                         "truncated file)")
    return out


def _probe_moov(data: bytes, start: int, end: int, out: dict) -> None:
    for typ, b, e in _walk(data, start, end):
        if typ == b"mvhd":
            v, p = _fullbox(data, b)
            if v == 1:
                _, _, ts, dur = struct.unpack(">QQIQ", data[p:p + 28])
            else:
                _, _, ts, dur = struct.unpack(">IIII", data[p:p + 16])
            out["timescale"] = ts
            out["duration_ms"] = int(dur * 1000 // ts) if ts else None
        elif typ == b"trak":
            out["tracks"].append(_probe_trak(data, b, e))


def _probe_trak(data: bytes, start: int, end: int) -> dict:
    t = {"track_id": None, "handler": None, "codec": None,
         "width": None, "height": None, "duration_ms": None,
         "timescale": None, "language": None, "n_samples": None}
    for typ, b, e in _walk(data, start, end):
        if typ == b"tkhd":
            v, p = _fullbox(data, b)
            if v == 1:
                t["track_id"] = struct.unpack(">I", data[p + 16:p + 20])[0]
                p_wh = p + 20 + 8 + 8 + 2 + 2 + 2 + 2 + 36
            else:
                t["track_id"] = struct.unpack(">I", data[p + 8:p + 12])[0]
                p_wh = p + 12 + 4 + 4 + 2 + 2 + 2 + 2 + 36
            w, h = struct.unpack(">II", data[p_wh:p_wh + 8])
            if w and h:                       # 16.16 fixed point
                t["width"], t["height"] = w >> 16, h >> 16
        elif typ == b"mdia":
            _probe_mdia(data, b, e, t)
    return t


def _probe_mdia(data: bytes, start: int, end: int, t: dict) -> None:
    for typ, b, e in _walk(data, start, end):
        if typ == b"mdhd":
            v, p = _fullbox(data, b)
            if v == 1:
                ts, dur = struct.unpack(">IQ", data[p + 16:p + 28])
                p_lang = p + 28
            else:
                ts, dur = struct.unpack(">II", data[p + 8:p + 16])
                p_lang = p + 16
            t["timescale"] = ts
            t["duration_ms"] = int(dur * 1000 // ts) if ts else None
            t["language"] = _lang(
                struct.unpack(">H", data[p_lang:p_lang + 2])[0])
        elif typ == b"hdlr":
            t["handler"] = data[b + 8:b + 12].decode("latin-1")
        elif typ == b"minf":
            for t2, b2, e2 in _walk(data, b, e):
                if t2 == b"stbl":
                    _probe_stbl(data, b2, e2, t)


def _probe_stbl(data: bytes, start: int, end: int, t: dict) -> None:
    for typ, b, e in _walk(data, start, end):
        if typ == b"stsd":
            _, p = _fullbox(data, b)
            (n_entries,) = struct.unpack(">I", data[p:p + 4])
            if n_entries and p + 16 <= e:
                t["codec"] = data[p + 8:p + 12].decode("latin-1")
                # visual sample entry: 6 reserved + 2 dref idx + 16
                # predefined/reserved, then coded width/height (u16 each)
                if t["handler"] == "vide" and t["width"] is None:
                    wh = p + 12 + 6 + 2 + 16
                    if wh + 4 <= e:
                        w, h = struct.unpack(">HH", data[wh:wh + 4])
                        t["width"], t["height"] = w or None, h or None
        elif typ == b"stsz":
            _, p = _fullbox(data, b)
            t["n_samples"] = struct.unpack(">I", data[p + 4:p + 8])[0]


def mp4_prober(payload: bytes) -> dict:
    """Drop-in for ``multimodal.extract_features(decoder=...)`` /
    ``probe_media``: probes or raises (ValueError → decode_ok=false)."""
    return probe_mp4(bytes(payload))
