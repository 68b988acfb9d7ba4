"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT,
stdlib + numpy) — the third REAL in-container media format after PNG
(functions/png.py) and WAV (functions/wav.py), for the multimodal
decoder/featurizer/resizer seams (operators/multimodal.py).

Public-spec implementation: marker segments (SOI/APP/DQT/SOF0/DHT/
DRI/SOS/EOI), canonical Huffman tables built from DHT BITS/HUFFVAL,
byte-stuffed entropy stream with restart-marker handling, zigzag +
dequant, orthonormal separable IDCT (numpy), JFIF YCbCr↔RGB, and
chroma-subsampling upsample for sampling factors up to 2×2.  The
encoder writes baseline interleaved scans with the Annex K quant and
Huffman tables (quality-scaled per the classic libjpeg formula),
4:4:4 or 4:2:0, optional restart interval.

Correctness story without an external codec in this container: the
DCT pair is pinned to orthonormality (decode∘encode of an unquantized
block is identity to 1e-10), flat blocks roundtrip EXACTLY (DC-only,
hand-computable), natural images roundtrip within quantization
tolerance at q=90, and the entropy layer is exercised across both
subsampling modes, restart intervals, grayscale, and odd (non-multiple
-of-8/16) dimensions.  Like PNG/WAV, decode failures raise ValueError
→ the multimodal seam's decode_ok=false sentinel rows.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# raster index of the k-th zigzag position (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63]

# Annex K.1/K.2 quantization tables, natural (raster) order
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: F = _DCT @ f @ _DCT.T is exactly
# T.81's FDCT (1/4 c(u)c(v) ΣΣ …); the inverse is the transpose pair
_DCT = np.array([[math.sqrt((1 if u else 0.5) / 4)
                  * math.cos((2 * x + 1) * u * math.pi / 16)
                  for x in range(8)] for u in range(8)])


def fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# ---------------------------------------------------------------- huffman

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) → {symbol: (code, length)} — the canonical
    code assignment of T.81 Annex C (codes count up within a length,
    shift left when the length grows)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Inverse table keyed by (length, code) — O(1) per candidate length
    while reading bit-by-bit."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


class _BitReader:
    """Entropy-stream reader: unstuffs 0xFF00, surfaces RST markers via
    :meth:`restart`, stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                self.marker = nxt        # restart marker reached
                return False
            else:
                self.marker = nxt        # EOI / next segment
                return False
        else:
            self.pos = p + 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def bit(self) -> int:
        if self._n == 0 and not self._fill():
            raise ValueError("JPEG: entropy stream exhausted")
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align (discard pad bits) and consume the RSTn that must
        sit at the current byte position — whether or not a prior
        ``_fill`` already peeked it into ``self.marker``."""
        self._acc = self._n = 0
        if self.marker is None:
            d, p = self.data, self.pos
            if not (p + 1 < len(d) and d[p] == 0xFF
                    and 0xD0 <= d[p + 1] <= 0xD7):
                raise ValueError("JPEG: expected restart marker")
        elif not 0xD0 <= self.marker <= 0xD7:
            raise ValueError("JPEG: expected restart marker")
        self.pos += 2
        self.marker = None

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            s = table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category s, s-bit representation) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# ----------------------------------------------------------------- decode

class _Comp:
    """Per-component decode state: sampling, quant id, and the zigzag-
    order coefficient array accumulated across scans (progressive files
    touch it many times; baseline once)."""

    __slots__ = ("cid", "hs", "vs", "tq", "coefs", "bw", "bh",
                 "bw_pad", "bh_pad", "pred")

    def __init__(self, cid, hs, vs, tq):
        self.cid, self.hs, self.vs, self.tq = cid, hs, vs, tq
        self.pred = 0


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, n_components, pixels) with ``pixels`` row-major
    RGB (3 components) or grayscale (1).  Sequential baseline/extended
    (SOF0/SOF1) AND progressive (SOF2 — spectral selection + successive
    approximation, per-scan coefficient accumulation), sampling factors
    ≤ 2; anything else raises ValueError — the multimodal seam's
    decode-failure contract."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    frame = None
    comps: list[_Comp] = []
    restart_interval = 0
    saw_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        m = payload[pos + 1]
        pos += 2
        if m == 0xFF or m == 0x00:           # fill byte / stray
            pos -= 1
            continue
        if m == 0xD9:                        # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        end = pos + seglen
        if m == 0xDB:                        # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = tbl                # DQT payload is zigzag
                qt[tq] = nat.reshape(8, 8)
        elif m == 0xC4:                      # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (hdc if tc == 0 else hac)[th] = _build_decoder(bits, vals)
                i += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):        # SOF0/1 (sequential), SOF2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            progressive = (m == 0xC2)
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(_Comp(cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c.hs for c in comps)
            vmax = max(c.vs for c in comps)
            if hmax > 2 or vmax > 2:
                raise ValueError("JPEG: sampling factors above 2 "
                                 "not supported")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c.bw_pad, c.bh_pad = mcux * c.hs, mcuy * c.vs
                cw = -(-(w * c.hs) // hmax)
                ch = -(-(h * c.vs) // vmax)
                c.bw, c.bh = -(-cw // 8), -(-ch // 8)
                c.coefs = np.zeros((c.bh_pad * c.bw_pad, 64),
                                   dtype=np.int32)
            frame = (w, h, progressive, hmax, vmax, mcux, mcuy)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: unsupported SOF marker 0x{m:02X} "
                             "(sequential/progressive huffman only)")
        elif m == 0xDD:                      # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:                      # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in comps if x.cid == cs), None)
                if comp is None:
                    raise ValueError("JPEG: scan names unknown component")
                scan_comps.append((comp, td_ta >> 4, td_ta & 0xF))
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            end = _decode_scan(payload, end, frame, scan_comps,
                               hdc, hac, restart_interval, ss, se, ah, al)
            saw_scan = True
        pos = end
    if not saw_scan:
        raise ValueError("JPEG: no scan found")
    return _assemble(frame, comps, qt)


def _decode_scan(payload, pos, frame, scan_comps, hdc, hac, ri,
                 ss, se, ah, al):
    """Decode one entropy-coded scan into the components' coefficient
    arrays; returns the byte offset of the next marker segment.  Handles
    baseline (Ss=0..Se=63, Ah=Al=0) and every progressive scan kind
    (DC first/refine, AC first/refine) per T.81 G.1.2."""
    w, h, progressive, hmax, vmax, mcux, mcuy = frame
    if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("JPEG: bad spectral params in sequential scan")
    if progressive and ss == 0 and se != 0:
        raise ValueError("JPEG: progressive scan mixes DC and AC "
                         "(Ss=0 requires Se=0)")
    if progressive and ss > 0 and len(scan_comps) != 1:
        raise ValueError("JPEG: progressive AC scans must be "
                         "non-interleaved")
    r = _BitReader(payload, pos)
    state = {"eobrun": 0}
    for comp, *_ in scan_comps:
        comp.pred = 0

    def maybe_restart(n_mcu):
        if ri and n_mcu and n_mcu % ri == 0:
            r.restart()
            state["eobrun"] = 0
            for comp, *_ in scan_comps:
                comp.pred = 0

    if len(scan_comps) > 1 or not progressive:
        # interleaved: full (padded) MCU grid
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(n_mcu)
                for comp, td, ta in scan_comps:
                    for by in range(comp.vs):
                        for bx in range(comp.hs):
                            blk = comp.coefs[
                                (my * comp.vs + by) * comp.bw_pad
                                + mx * comp.hs + bx]
                            _decode_block(r, blk, comp,
                                          hdc.get(td), hac.get(ta),
                                          ss, se, ah, al, state)
                n_mcu += 1
    else:
        # non-interleaved: the component's OWN block grid (unpadded)
        comp, td, ta = scan_comps[0]
        n_mcu = 0
        for by in range(comp.bh):
            for bx in range(comp.bw):
                maybe_restart(n_mcu)
                blk = comp.coefs[by * comp.bw_pad + bx]
                _decode_block(r, blk, comp, hdc.get(td), hac.get(ta),
                              ss, se, ah, al, state)
                n_mcu += 1
    # scan ends: reader.pos sits on (or just before) the next marker
    p = r.pos
    while p < len(payload) and payload[p] != 0xFF:
        p += 1          # tolerate stray pad bytes before the marker
    return p


def _decode_block(r, blk, comp, dct, act, ss, se, ah, al, state):
    if ss == 0:                              # DC (and baseline AC tail)
        if ah == 0:
            s = r.decode_symbol(dct)
            diff = _extend(r.bits(s), s) if s else 0
            comp.pred += diff
            blk[0] = comp.pred << al
        else:                                # DC refinement: raw bit
            if r.bit():
                blk[0] |= 1 << al
    if se == 0:
        return
    k = max(ss, 1)
    if ah == 0:                              # AC first pass (incl. baseline)
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        while k <= se:
            rs = r.decode_symbol(act)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr == 15:
                    k += 16                  # ZRL
                    continue
                state["eobrun"] = (1 << rr) - 1 + (r.bits(rr) if rr else 0)
                break                        # EOB(run)
            k += rr
            if k > se:
                raise ValueError("JPEG: AC index overflow")
            blk[k] = _extend(r.bits(s), s) << al
            k += 1
    else:                                    # AC refinement (G.1.2.3)
        p1, m1 = 1 << al, -1 << al
        if state["eobrun"] == 0:
            while k <= se:
                rs = r.decode_symbol(act)
                rr, s = rs >> 4, rs & 0xF
                if s == 0:
                    if rr < 15:
                        # counts the CURRENT block too: its correction-
                        # bit tail below still runs, then decrements
                        state["eobrun"] = (1 << rr) + \
                            (r.bits(rr) if rr else 0)
                        break
                    newval = 0               # ZRL: skip 16 zero-history
                elif s == 1:
                    newval = p1 if r.bit() else m1
                else:
                    raise ValueError("JPEG: bad refinement magnitude")
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if r.bit() and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else m1)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:                   # correction-only tail
                v = int(blk[k])
                if v != 0 and r.bit() and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
                k += 1
            state["eobrun"] -= 1


def _assemble(frame, comps, qt):
    w, h, _prog, hmax, vmax, mcux, mcuy = frame
    full = []
    for c in comps:
        q = qt.get(c.tq)
        if q is None:
            raise ValueError("JPEG: missing quantization table")
        qzz = q.reshape(64)[ZIGZAG].astype(np.float64)
        plane = np.zeros((c.bh_pad * 8, c.bw_pad * 8))
        for by in range(c.bh_pad):
            for bx in range(c.bw_pad):
                zz = c.coefs[by * c.bw_pad + bx]
                nat = np.zeros(64)
                nat[ZIGZAG] = zz * qzz
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    idct2(nat.reshape(8, 8)) + 128.0
        if c.vs < vmax:
            plane = np.repeat(plane, vmax // c.vs, axis=0)
        if c.hs < hmax:
            plane = np.repeat(plane, hmax // c.hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(full) != 3:
        raise ValueError(f"JPEG: {len(full)}-component images unsupported")
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# ----------------------------------------------------------------- encode

def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(wtr, block, q, dc_codes, ac_codes, pred):
    coef = fdct2(block - 128.0)
    zz = np.round(coef.reshape(64)[ZIGZAG] / q.reshape(64)[ZIGZAG]) \
        .astype(np.int64)
    diff = int(zz[0]) - pred
    s, mag = _magnitude(diff)
    c, ln = dc_codes[s]
    wtr.write(c, ln)
    if s:
        wtr.write(mag, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]          # ZRL
            wtr.write(c, ln)
            run -= 16
        s, mag = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        wtr.write(c, ln)
        wtr.write(mag, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]              # EOB
        wtr.write(c, ln)
    return int(zz[0])


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge")


def _prep_planes(pixels: bytes, width: int, height: int, channels: int,
                 quality: int, subsampling: str):
    """Shared encoder front half: color convert, subsample, MCU-pad.
    → (samp, quants, padded, hmax, vmax, mcux, mcuy)."""
    if channels not in (1, 3):
        raise ValueError("encode_jpeg: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("encode_jpeg: pixel buffer does not match dims")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64) \
        .reshape(height, width, channels)
    qly = _scaled_qt(QT_LUMA, quality).reshape(8, 8)
    qch = _scaled_qt(QT_CHROMA, quality).reshape(8, 8)
    if channels == 1:
        comp_planes = [arr[:, :, 0]]
        samp, quants = [(1, 1)], [qly]
    else:
        r_, g_, b_ = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        if subsampling == "4:2:0":
            samp = [(2, 2), (1, 1), (1, 1)]
            cb = _pad_to(cb, 2, 2)
            cr = _pad_to(cr, 2, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        comp_planes = [y, cb, cr]
        quants = [qly, qch, qch]
    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # pad each plane so every MCU's blocks exist
    padded = []
    for (hs, vs), p in zip(samp, comp_planes):
        th, tw = mcuy * vs * 8, mcux * hs * 8
        padded.append(np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"))
    return samp, quants, padded, hmax, vmax, mcux, mcuy


def encode_jpeg(pixels: bytes, width: int, height: int, channels: int = 3,
                quality: int = 75, subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Raw row-major RGB (channels=3) or grayscale (1) → baseline JPEG.
    ``subsampling`` '4:4:4' or '4:2:0' (RGB only); optional DRI/RSTn
    every ``restart_interval`` MCUs."""
    samp, quants, padded, hmax, vmax, mcux, mcuy = _prep_planes(
        pixels, width, height, channels, quality, subsampling)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tables = ([(dc_l, ac_l)] if channels == 1
              else [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)])

    wtr = _BitWriter()
    pred = [0] * channels
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * channels
            for ci, ((hs, vs), plane, q, (dct, act)) in enumerate(
                    zip(samp, padded, quants, tables)):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        pred[ci] = _encode_block(
                            wtr, plane[y0:y0 + 8, x0:x0 + 8], q,
                            dct, act, pred[ci])
            n_mcu += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq])
                   + bytes(int(tbl.reshape(64)[z]) for z in ZIGZAG))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")                      # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, quants[0])
    sof = bytes([8]) + struct.pack(">HH", height, width) \
        + bytes([channels])
    comp_ids = [1, 2, 3][:channels]
    for cid, (hs, vs) in zip(comp_ids, samp):
        sof += bytes([cid, (hs << 4) | vs, 0 if cid == 1 else 1])
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if channels == 3:
        out += dqt(1, quants[1])
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for cid in comp_ids:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder

# libjpeg-style default scan scripts (comp index lists + Ss,Se,Ah,Al):
# DC first at Al=1, banded AC first passes at Al>0, then the successive-
# approximation refinements — together they exercise every progressive
# decode path (DC first/refine, AC first with EOBRUN, AC refinement
# with correction bits and ZRL-over-history).
_PROG_SCANS_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_PROG_SCANS_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


# Progressive AC scans need EOBn symbols (r<<4, r=1..14) that the
# Annex K baseline tables don't define — real encoders build custom
# Huffman tables for progressive files.  Ours is the simplest valid
# canonical table: every symbol we can emit ((r,s) s=1..10, ZRL, EOB0-14)
# at code length 16 (Kraft sum 176·2⁻¹⁶ ≪ 1; last code 175 ≠ all-ones).
# Compression is poor and irrelevant; it also exercises the decoder's
# from-DHT table construction with a non-standard layout.
AC_PROG_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0] + [r << 4 for r in range(15)])
AC_PROG_BITS = [0] * 15 + [len(AC_PROG_VALS)]


class _ProgState:
    """Per-scan entropy state: the EOB run and the correction bits
    buffered to ride out with it (T.81 G.1.2.2/G.1.2.3 encode side)."""

    def __init__(self, wtr: _BitWriter, ac_codes: dict):
        self.wtr = wtr
        self.ac = ac_codes
        self.eobrun = 0
        self.corr: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            c, ln = self.ac[nb << 4]
            self.wtr.write(c, ln)
            if nb:
                self.wtr.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.corr:
            self.wtr.write(b, 1)
        self.corr = []


def _enc_ac_first(st: _ProgState, blk, ss, se, al) -> None:
    wtr, ac = st.wtr, st.ac
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        v = (v >> al) if v >= 0 else -((-v) >> al)   # truncate toward 0
        if v == 0:
            r += 1
            continue
        st.flush_eobrun()
        while r > 15:
            wtr.write(*ac[0xF0])
            r -= 16
        s, mag = _magnitude(v)
        wtr.write(*ac[(r << 4) | s])
        wtr.write(mag, s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _enc_ac_refine(st: _ProgState, blk, ss, se, al) -> None:
    wtr, ac = st.wtr, st.ac
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = 0
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    r = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            st.flush_eobrun()
            wtr.write(*ac[0xF0])
            r -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:                    # history-nonzero: buffered correction
            br.append(t & 1)
            continue
        st.flush_eobrun()            # newly significant: (run, 1) + sign
        wtr.write(*ac[(r << 4) | 1])
        wtr.write(1 if int(blk[ss + i]) > 0 else 0, 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.corr.extend(br)
        if st.eobrun == 0x7FFF or len(st.corr) > 900:
            st.flush_eobrun()


def encode_jpeg_progressive(pixels: bytes, width: int, height: int,
                            channels: int = 3, quality: int = 75,
                            subsampling: str = "4:4:4") -> bytes:
    """Raw pixels → progressive JPEG (SOF2) with the libjpeg-style
    default scan script.  The quantized coefficients are identical to
    :func:`encode_jpeg` at the same settings, so a decoder must produce
    the IDENTICAL image from both files — the test pin."""
    samp, quants, padded, hmax, vmax, mcux, mcuy = _prep_planes(
        pixels, width, height, channels, quality, subsampling)

    # quantize every component to zigzag-order coefficient arrays
    coefs = []
    dims = []                      # (bw_pad, bh_pad, bw, bh)
    for (hs, vs), plane, q in zip(samp, padded, quants):
        bh_pad, bw_pad = plane.shape[0] // 8, plane.shape[1] // 8
        qzz = q.reshape(64)[ZIGZAG].astype(np.float64)
        arr = np.zeros((bh_pad, bw_pad, 64), dtype=np.int64)
        for by in range(bh_pad):
            for bx in range(bw_pad):
                coef = fdct2(plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                             - 128.0)
                arr[by, bx] = np.round(coef.reshape(64)[ZIGZAG] / qzz)
        cw = -(-(width * hs) // hmax)
        ch = -(-(height * vs) // vmax)
        coefs.append(arr)
        dims.append((bw_pad, bh_pad, -(-cw // 8), -(-ch // 8)))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_prog = _build_codes(AC_PROG_BITS, AC_PROG_VALS)
    dc_tabs = [dc_l] + [dc_c] * (channels - 1)
    ac_tabs = [ac_prog] * channels          # shared table id 0
    comp_ids = [1, 2, 3][:channels]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(
        int(quants[0].reshape(64)[z]) for z in ZIGZAG))
    if channels == 3:
        out += seg(0xDB, bytes([1]) + bytes(
            int(quants[1].reshape(64)[z]) for z in ZIGZAG))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for cid, (hs, vs) in zip(comp_ids, samp):
        sof += bytes([cid, (hs << 4) | vs, 0 if cid == 1 else 1])
    out += seg(0xC2, sof)                              # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
               + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_PROG_BITS)
               + bytes(AC_PROG_VALS))
    if channels == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS)
                   + bytes(DC_CHROMA_VALS))

    script = _PROG_SCANS_COLOR if channels == 3 else _PROG_SCANS_GRAY
    for comp_idx, ss, se, ah, al in script:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            td = 0 if ci == 0 else 1         # DC per class; AC shared id 0
            sos += bytes([comp_ids[ci], td << 4])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        wtr = _BitWriter()
        if ss == 0:                                    # DC scan
            preds = {ci: 0 for ci in comp_idx}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in comp_idx:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = coefs[ci][my * vs + by, mx * hs + bx]
                                dc = int(blk[0])
                                if ah == 0:
                                    v = dc >> al
                                    s, mag = _magnitude(v - preds[ci])
                                    preds[ci] = v
                                    wtr.write(*dc_tabs[ci][s])
                                    if s:
                                        wtr.write(mag, s)
                                else:                  # refinement: raw bit
                                    wtr.write((dc >> al) & 1, 1)
        else:                                          # AC scan: one comp
            [ci] = comp_idx
            st = _ProgState(wtr, ac_tabs[ci])
            bw_pad, bh_pad, bw, bh = dims[ci]
            for by in range(bh):
                for bx in range(bw):
                    blk = coefs[ci][by, bx]
                    if ah == 0:
                        _enc_ac_first(st, blk, ss, se, al)
                    else:
                        _enc_ac_refine(st, blk, ss, se, al)
            st.flush_eobrun()
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def probe_jpeg(payload: bytes) -> dict:
    """Metadata-only probe (no entropy decode): walk markers to SOFn →
    ``{width, height, channels, progressive, codec}``.  The image half
    of the curate-by-metadata-first story (``multimodal.probe_media``)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        m = payload[pos + 1]
        pos += 2
        if m in (0xD9, 0xDA):
            break
        (ln,) = struct.unpack(">H", payload[pos:pos + 2])
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            seg = payload[pos + 2:pos + ln]
            h, w = struct.unpack(">HH", seg[1:5])
            return {"width": w, "height": h, "channels": seg[5],
                    "progressive": m == 0xC2, "codec": "jpeg"}
        pos += ln
    raise ValueError("JPEG: no frame header found")


# ------------------------------------------------------------------ seams

def jpeg_decoder(payload: bytes):
    """Drop-in for ``multimodal.extract_features(decoder=...)``."""
    return decode_jpeg(payload)


def jpeg_resizer(payload: bytes, target_w: int, target_h: int,
                 method: str = "nearest") -> bytes:
    """Drop-in for ``multimodal.resize_images(resizer=...)``: decode →
    resample ('nearest' or 'bilinear') → re-encode (q=90, 4:4:4).
    Pin the method with ``functools.partial``."""
    from llmxmapreduce_spark.functions.png import (resize_bilinear,
                                                   resize_nearest)

    w, h, nc, px = decode_jpeg(payload)
    fn = resize_bilinear if method == "bilinear" else resize_nearest
    return encode_jpeg(fn(px, w, h, nc, target_w, target_h),
                       target_w, target_h, nc, quality=90)
