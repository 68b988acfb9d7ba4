"""Stdlib-only WAV/PCM codec + real audio features (struct + numpy — no
ffmpeg/soundfile).

Second real media format in-container (after ``functions/png.py``): WAV
is a RIFF container — ``RIFF``/``WAVE`` header, then even-padded
``fmt ``/``data`` chunks — and PCM sample math needs nothing beyond
struct and numpy, so the audio half of the multimodal stack
(``operators/multimodal.py``) gets a real decode → features → re-encode
path instead of the environmental stub:

- :func:`decode_wav` — RIFF chunk walk (even-padding honored), PCM
  format gate (compressed WAVs raise ``ValueError`` — the D8 sentinel
  path), 8-bit unsigned / 16-bit signed little-endian, any channel
  count; returns centered int32 frames shaped (n_frames, n_channels).
- :func:`encode_wav` — canonical 44-byte header + data chunk, the exact
  inverse (decode∘encode is identity on frames).
- :func:`audio_features` — deterministic fixed-width descriptor
  [duration_s, rms, zero_crossing_rate, peak] + an n-segment RMS energy
  envelope, computed on amplitude-normalized mono; the real-feature
  stand-in for an audio-embedding model.
- :func:`resample_linear` — per-channel linear interpolation onto the
  target rate's sample grid (endpoint-anchored).
- :func:`wav_decoder` / :func:`wav_featurizer` — drop-ins for
  ``multimodal.extract_features(decoder=..., featurizer=...)``.

Pure per-payload functions: they run INSIDE the existing mapInPandas
operators, so the Spark-side contracts (Arrow batch shape, sentinel
rows, payload locality) are unchanged and already tested."""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_ALAW = 6            # G.711 A-law (telephony corpora)
_ULAW = 7            # G.711 μ-law


def _ulaw_to_linear(u: "np.ndarray") -> "np.ndarray":
    """G.711 μ-law byte → 16-bit linear (the classic public-domain
    expansion: invert, rebuild the biased mantissa, shift by segment)."""
    u = (~u.astype(np.int32)) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int32)


def _alaw_to_linear(a: "np.ndarray") -> "np.ndarray":
    """G.711 A-law byte → 16-bit linear (XOR 0x55, then per-segment
    mantissa reconstruction)."""
    a = a.astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int32)


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (sample_rate, n_channels, sample_width, frames) with ``frames``
    an int32 array shaped (n_frames, n_channels), CENTERED (8-bit
    unsigned PCM is shifted to signed −128..127, so silence is 0 at
    every width).  Raises ``ValueError`` on anything that is not an
    uncompressed 8/16-bit PCM WAV — callers treat that as decode
    failure (the D8 sentinel contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {typ!r} chunk")
        if typ == b"fmt ":
            fmt = body
        elif typ == b"data":
            data = body
        pos += 8 + ln + (ln & 1)          # RIFF chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if audio_format not in (_PCM, _ALAW, _ULAW):
        raise ValueError(f"compressed WAV (format {audio_format}); "
                         "only PCM and G.711 a/μ-law are supported")
    if audio_format in (_ALAW, _ULAW):
        # G.711 companded telephony audio: 8-bit bytes expanding to
        # 16-bit linear — decoded width is 2 by construction
        if bits != 8 or n_channels < 1 or sample_rate < 1:
            raise ValueError(f"bad G.711 layout ({bits}-bit, "
                             f"{n_channels}ch, {sample_rate}Hz)")
        n_frames = len(data) // n_channels
        raw = np.frombuffer(data[:n_frames * n_channels], dtype=np.uint8)
        expand = _ulaw_to_linear if audio_format == _ULAW \
            else _alaw_to_linear
        return sample_rate, n_channels, 2, expand(raw).reshape(
            n_frames, n_channels)
    if bits not in (8, 16) or n_channels < 1 or sample_rate < 1:
        raise ValueError(f"unsupported PCM layout ({bits}-bit, "
                         f"{n_channels}ch, {sample_rate}Hz)")
    width = bits // 8
    frame_bytes = width * n_channels
    n_frames = len(data) // frame_bytes
    data = data[:n_frames * frame_bytes]
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    return sample_rate, n_channels, width, samples.reshape(
        n_frames, n_channels)


def encode_wav(frames: np.ndarray, sample_rate: int,
               sample_width: int = 2) -> bytes:
    """(n_frames, n_channels) centered int frames → canonical PCM WAV
    bytes; exact inverse of :func:`decode_wav` at the same width."""
    frames = np.asarray(frames)
    if frames.ndim == 1:
        frames = frames[:, None]
    n_frames, n_channels = frames.shape
    if sample_width == 1:
        data = (frames.astype(np.int64) + 128).clip(0, 255) \
            .astype(np.uint8).tobytes()
    elif sample_width == 2:
        data = frames.astype(np.int64).clip(-32768, 32767) \
            .astype("<i2").tobytes()
    else:
        raise ValueError(f"sample_width must be 1 or 2, got {sample_width}")
    bits = sample_width * 8
    block = sample_width * n_channels
    fmt = struct.pack("<HHIIHH", _PCM, n_channels, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(decoded: tuple[int, int, int, np.ndarray],
                   n_env: int = 8) -> list[float]:
    """Fixed-width (4 + n_env) descriptor of a decoded WAV:
    [duration_s, rms, zero_crossing_rate, peak] + per-segment RMS energy
    envelope, all on the amplitude-normalized (±1) channel mean —
    deterministic, so pipelines over audio columns are value-testable
    without a model."""
    sample_rate, _, width, frames = decoded
    n = frames.shape[0]
    if n == 0:
        return [0.0] * (4 + n_env)
    scale = float(2 ** (8 * width - 1))
    mono = frames.mean(axis=1) / scale
    rms = float(np.sqrt(np.mean(mono * mono)))
    signs = np.sign(mono)
    nz = signs != 0
    zcr = (float(np.mean(np.diff(signs[nz]) != 0))
           if np.count_nonzero(nz) > 1 else 0.0)
    peak = float(np.max(np.abs(mono)))
    env = []
    for seg in np.array_split(mono, n_env):
        env.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
    return [n / float(sample_rate), rms, zcr, peak] + env


def resample_linear(frames: np.ndarray, src_rate: int,
                    dst_rate: int) -> np.ndarray:
    """Per-channel linear interpolation onto the destination rate's
    sample grid (first/last samples anchored).  Nearest-neighbor-grade
    quality — the injectable seam mirror of PNG's resize_nearest; a real
    deployment injects a windowed-sinc resampler the same way."""
    frames = np.asarray(frames)
    if frames.ndim == 1:
        frames = frames[:, None]
    n = frames.shape[0]
    if n == 0 or src_rate == dst_rate:
        return frames.copy()
    m = max(1, int(round(n * dst_rate / src_rate)))
    src_t = np.arange(n) / src_rate
    dst_t = np.arange(m) * (src_t[-1] / max(m - 1, 1))
    out = np.stack([np.interp(dst_t, src_t, frames[:, c])
                    for c in range(frames.shape[1])], axis=1)
    return np.round(out).astype(frames.dtype)


def wav_decoder(payload: bytes):
    """Drop-in for ``multimodal.extract_features(decoder=wav_decoder)``."""
    return decode_wav(bytes(payload))


def wav_featurizer(decoded) -> list[float]:
    """Drop-in for ``multimodal.extract_features(featurizer=...)`` —
    real audio features replace the byte-histogram fallback whenever the
    decode succeeded."""
    return audio_features(decoded)


def wav_resampler(payload: bytes, target_rate: int) -> bytes:
    """Drop-in for ``multimodal.resample_audio(resampler=...)``:
    decode → linear resample → re-encode at the target rate (same
    sample width)."""
    rate, _, width, frames = decode_wav(bytes(payload))
    return encode_wav(resample_linear(frames, rate, target_rate),
                      target_rate, sample_width=width)


def probe_wav(payload: bytes) -> dict:
    """Metadata-only probe (header walk, no sample decode) →
    ``{duration_ms, sample_rate, channels, codec}`` with codec one of
    pcm_u8 / pcm_s16le / alaw / ulaw — the audio half of
    ``multimodal.probe_media``'s curate-by-metadata-first story."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if typ == b"fmt ":
            fmt = payload[pos + 8:pos + 8 + ln]
        elif typ == b"data":
            data_len = min(ln, len(payload) - pos - 8)
        pos += 8 + ln + (ln & 1)
    if fmt is None or data_len is None or len(fmt) < 16:
        raise ValueError("missing/short fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    codec = {(_PCM, 8): "pcm_u8", (_PCM, 16): "pcm_s16le",
             (_ALAW, 8): "alaw", (_ULAW, 8): "ulaw"}.get(
        (audio_format, bits))
    if codec is None or n_channels < 1 or sample_rate < 1:
        raise ValueError(f"unsupported WAV (format {audio_format}, "
                         f"{bits}-bit)")
    frame_bytes = (bits // 8) * n_channels
    n_frames = data_len // frame_bytes
    return {"duration_ms": int(n_frames * 1000 // sample_rate),
            "sample_rate": sample_rate, "channels": n_channels,
            "codec": codec}
