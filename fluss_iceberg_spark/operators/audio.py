"""Pure-Python audio (WAV/RIFF PCM) decode — the audio modality's real
decode path, completing the multimodal surface (image raster decode in
operators/rasters.py, video frame plumbing in operators/multimodal.py).

Implemented from the public RIFF/WAVE format specification with stdlib
``struct`` + numpy only:

- RIFF chunk walk (``RIFF``/``WAVE`` container, ``fmt `` + ``data``
  chunks, unknown chunks skipped, word-aligned chunk padding honored)
- PCM (format 1) at 8-bit unsigned and 16-bit signed little-endian,
  any channel count / sample rate

``decode_wav`` returns ``(ndarray[n_frames, channels] int32, rate)`` —
samples centered at zero for BOTH widths (8-bit is stored unsigned with
a 128 bias per the spec; the decoder removes it) — or ``None`` for
anything corrupt or unsupported (compressed formats, 24-bit, float),
never an exception: a 100 TB crawl always contains garbage.

Feature extraction (``operators/multimodal.audio_features``) reduces the
waveform to EXACT integer statistics — frame/channel counts, integer
duration, sample sum, energy (sum of squares), min/max, zero crossings —
so an arithmetic oracle can replay them bit-for-bit. A matching minimal
encoder (``encode_wav``) exists for export and for constructing the
decode path's inputs without sharing parsing code with it.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(payload):
    """RIFF/WAVE PCM decode: ``(int32 array [n_frames, channels], rate)``
    or None for corrupt/unsupported payloads."""
    try:
        b = bytes(payload)
    except (TypeError, ValueError):
        return None
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8 : i + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format != 1 or channels < 1 or rate < 1 or bits not in (8, 16):
        return None
    bytes_per_frame = channels * (bits // 8)
    n_frames = len(data) // bytes_per_frame
    if n_frames == 0:
        return None
    usable = n_frames * bytes_per_frame
    if bits == 8:
        # 8-bit PCM is unsigned, biased at 128 (WAVE spec)
        arr = np.frombuffer(data, dtype=np.uint8, count=usable).astype(np.int32) - 128
    else:
        arr = np.frombuffer(data[:usable], dtype="<i2").astype(np.int32)
    return arr.reshape(n_frames, channels), int(rate)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Minimal RIFF/WAVE PCM encoder (8-bit unsigned / 16-bit signed LE)
    for waveform export and decode-path verification. ``samples`` is
    ``[n_frames, channels]`` (or 1-D mono) of zero-centered values."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    if bits == 8:
        raw = (arr.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = arr.astype(np.int32).clip(-32768, 32767).astype("<i2").tobytes()
    else:
        raise ValueError(f"unsupported bit width {bits}")
    byte_rate = rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block_align, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
        + (b"\x00" if len(raw) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def zero_crossings(channel: np.ndarray) -> int:
    """Count sign changes along one channel, with EXACT integer
    semantics an SQL oracle can replay: a crossing at frame i (i >= 1)
    is (s[i-1] < 0) != (s[i] < 0) — zero counts as non-negative."""
    neg = channel < 0
    return int((neg[1:] != neg[:-1]).sum())


# ---------------------------------------------------------------------------
# Fixed-frame integer DFT — real frequency-domain DSP under a cross-engine
# value gate (the audio twin of the pHash DCT). Every clip's channel-0
# signal is truncated/zero-padded to a 64-sample frame and probed at bins
# k ∈ {1, 2, 4, 8}: X[k] = Σ_t x[t]·cis(-2πkt/64), with cos/sin as a
# FIXED-POINT 64-entry table (round(trig·2^14), generated once in Python,
# embedded verbatim in the SQL oracle) and the angle index (k·t) mod 64 —
# pure integer multiply/accumulate, so Spark/DuckDB/Python agree to the
# bit. Power = re² + im² (int64: |re| ≤ 64·2000·2^14 ≈ 2.1e9, power ≤
# 4.4e18 < 2^63). 100 TB: per-payload kernel work; at production frame
# sizes the same table-driven form is the Goertzel/FFT seam.
# ---------------------------------------------------------------------------

DFT_FRAME = 64
DFT_SHIFT = 14
DFT_BINS = (1, 2, 4, 8)


def dft64_tables() -> tuple:
    """(cos, sin) fixed-point tables: trig(2π·a/64)·2^14 for a=0..63."""
    import math

    cos = [
        int(round(math.cos(2 * math.pi * a / DFT_FRAME) * (1 << DFT_SHIFT)))
        for a in range(DFT_FRAME)
    ]
    sin = [
        int(round(math.sin(2 * math.pi * a / DFT_FRAME) * (1 << DFT_SHIFT)))
        for a in range(DFT_FRAME)
    ]
    return cos, sin


def spectrum64(channel: np.ndarray) -> dict:
    """Integer DFT powers at the probe bins over the 64-sample frame,
    plus the dominant bin (max power; ties → lowest bin)."""
    x = np.zeros(DFT_FRAME, dtype=np.int64)
    n = min(len(channel), DFT_FRAME)
    x[:n] = np.asarray(channel[:n], dtype=np.int64)
    cos, sin = dft64_tables()
    cos = np.array(cos, dtype=np.int64)
    sin = np.array(sin, dtype=np.int64)
    out = {}
    t = np.arange(DFT_FRAME, dtype=np.int64)
    for k in DFT_BINS:
        idx = (k * t) % DFT_FRAME
        re = int((x * cos[idx]).sum())
        im = int((-x * sin[idx]).sum())
        out[f"p{k}"] = re * re + im * im
    powers = [out[f"p{k}"] for k in DFT_BINS]
    out["dom_bin"] = DFT_BINS[powers.index(max(powers))]
    return out
