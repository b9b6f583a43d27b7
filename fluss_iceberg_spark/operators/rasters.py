"""Pure-Python raster (pixel-level) codecs — the full image decode path.

operators/codecs.py parses container HEADERS (what PIL's lazy
``Image.open`` does); this module decodes the RASTER — actual pixel
arrays — from the container bytes, completing the real-decode surface
for the multimodal pipeline (reference README.md:104-316 demonstrates
the lakehouse the pipeline feeds; pixel features are the training-data
extension the 100 TB curation pipeline needs: channel statistics,
perceptual hashes, resize). Implemented from the public format
specifications with zero non-baked dependencies (stdlib ``zlib`` +
``struct``, numpy for the array math):

- **netpbm** P5/P6 (binary gray/RGB, maxval <= 255) and P2/P3 (ASCII)
- **PNG** (ISO/IEC 15948): 8-bit depth, color types 0 (L), 2 (RGB),
  3 (palette, expanded to RGB), 4 (LA), 6 (RGBA); all five scanline
  filters (None/Sub/Up/Average/Paeth); multi-IDAT. Interlaced (Adam7),
  16-bit and sub-byte depths return None (unsupported, not wrong).
- **BMP** (BITMAPINFOHEADER): uncompressed 24-bit BGR / 32-bit BGRA,
  bottom-up or top-down, 4-byte row padding.

Every decoder returns ``(ndarray[H,W,C] uint8, mode)`` or ``None`` —
corrupt/unsupported payloads yield None, never an exception (a 100 TB
crawl always contains garbage). A matching minimal PNG **encoder**
(``encode_png``) exists so pipelines can export rasters and so the
decode path can be exercised against independently-constructed bytes:
encoder and decoder share no filter code (the encoder applies filters
forward, the decoder inverts them), making a round trip a real check.

JPEG/GIF raster decode (DCT / LZW) is intentionally out of scope for a
stdlib-only container: the header probes in codecs.py still extract
their dimensions, and ``decode_pixels`` returns None for them.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- netpbm


def _pnm_tokens(b: bytes, n: int, start: int = 2):
    """Yield the first ``n`` whitespace-separated header tokens after
    ``start``, honoring '#' comments, and the offset past the single
    whitespace byte that terminates the last one (netpbm spec: exactly
    one whitespace char separates the maxval from the raster)."""
    toks = []
    i = start
    while len(toks) < n and i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            eol = b.find(b"\n", i)
            i = len(b) if eol < 0 else eol + 1
            continue
        if c.isspace():
            i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace() and b[j : j + 1] != b"#":
            j += 1
        toks.append(b[i:j])
        i = j
    if len(toks) < n or i >= len(b):
        return None
    return toks, i + 1  # consume the single terminating whitespace byte


def decode_pnm_pixels(b: bytes):
    magic = b[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        return None
    channels = 3 if magic in (b"P3", b"P6") else 1
    got = _pnm_tokens(b, 3)
    if got is None:
        return None
    (w_t, h_t, maxval_t), off = got
    try:
        w, h, maxval = int(w_t), int(h_t), int(maxval_t)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    n = w * h * channels
    if magic in (b"P5", b"P6"):
        raster = b[off : off + n]
        if len(raster) < n:
            return None
        arr = np.frombuffer(raster, dtype=np.uint8, count=n)
    else:  # ASCII: remaining tokens are decimal sample values
        vals = re.sub(rb"#[^\n\r]*", b" ", b[off - 1 :]).split()
        if len(vals) < n:
            return None
        try:
            arr = np.array([int(v) for v in vals[:n]], dtype=np.int64)
        except ValueError:
            return None
        if arr.min() < 0 or arr.max() > maxval:
            return None
        arr = arr.astype(np.uint8)
    return arr.reshape(h, w, channels), ("RGB" if channels == 3 else "L")


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> (channels, mode); palette handled separately
_PNG_COLOR = {0: (1, "L"), 2: (3, "RGB"), 4: (2, "LA"), 6: (4, "RGBA")}


def _png_chunks(b: bytes):
    """Yield (type, data) chunks; stop at IEND or truncation."""
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if len(data) < length:
            return
        yield ctype, data
        if ctype == b"IEND":
            return
        i += 12 + length  # length + type + data + CRC


def _unfilter(raw: bytes, h: int, w: int, bpp: int):
    """Invert PNG scanline filtering. None/Up rows vectorize (numpy);
    the serial filters (Sub/Average/Paeth) carry a per-pixel left
    dependency by definition, so those rows run a byte loop — over
    ``bytearray`` with native Python ints, which beats numpy scalar
    indexing several-fold at any stride. Executes per-payload inside a
    partition-parallel Arrow kernel, so per-image work is the honest
    unit of cost."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)  # zero row above the image (PNG spec)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up — vectorized, no serial dependency
            np.add(
                np.frombuffer(row, dtype=np.uint8),
                np.frombuffer(prev, dtype=np.uint8),
                out=out[y],
            )
            prev = out[y].tobytes()
            continue
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                c_ = prev[x - bpp] if x >= bpp else 0
                bb = prev[x]
                p = a + bb - c_
                pa = p - a if p >= a else a - p
                pb = p - bb if p >= bb else bb - p
                pc = p - c_ if p >= c_ else c_ - p
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c_)
                row[x] = (row[x] + pred) & 0xFF
        else:
            return None
        out[y] = np.frombuffer(row, dtype=np.uint8)
        prev = bytes(row)
    return out


def decode_png_pixels(b: bytes):
    if b[:8] != _PNG_SIG:
        return None
    w = h = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            if len(data) < 13:
                return None
            w, h = struct.unpack_from(">II", data, 0)
            bit_depth, color_type = data[8], data[9]
            interlace = data[12]
        elif ctype == b"PLTE":
            if len(data) % 3:
                return None
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if not w or not h or not idat or bit_depth != 8 or interlace != 0:
        return None  # 16-bit / sub-byte depths and Adam7 unsupported
    if color_type == 3:
        if palette is None:
            return None
        channels, mode = 1, "P"
    elif color_type in _PNG_COLOR:
        channels, mode = _PNG_COLOR[color_type]
    else:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    flat = _unfilter(raw, h, w, channels)
    if flat is None:
        return None
    arr = flat.reshape(h, w, channels)
    if color_type == 3:
        idx = arr[:, :, 0]
        if idx.max() >= len(palette):
            return None
        # expand palette indices to RGB — pixel semantics, PIL convert("RGB")
        return palette[idx], "RGB"
    return arr, mode


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit L/LA/RGB/RGBA) for raster export and
    decode-path verification. ``filter_type`` picks the per-row scanline
    filter (0-4); the filtered bytes are computed FORWARD here, which the
    decoder must invert — encoder and decoder share no filter code."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad PNG filter {filter_type}")
    rows = arr.reshape(h, w * c).astype(np.int32)
    zero = np.zeros(w * c, dtype=np.int32)
    filtered = bytearray()
    for y in range(h):
        cur, prev = rows[y], (rows[y - 1] if y > 0 else zero)
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        filtered.append(filter_type)
        filtered += (enc & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ BMP


def decode_bmp_pixels(b: bytes):
    if b[:2] != b"BM" or len(b) < 54:
        return None
    (data_off,) = struct.unpack_from("<I", b, 10)
    w, h_signed = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if w <= 0 or h_signed == 0 or compression != 0 or bpp not in (24, 32):
        return None
    h = abs(h_signed)
    c = bpp // 8
    stride = (w * c + 3) & ~3  # rows padded to 4 bytes
    need = data_off + stride * h
    if len(b) < need:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    arr = rows.reshape(h, stride)[:, : w * c].reshape(h, w, c)
    if h_signed > 0:  # bottom-up storage
        arr = arr[::-1]
    arr = arr[:, :, [2, 1, 0] + ([3] if c == 4 else [])]  # BGR(A) -> RGB(A)
    return np.ascontiguousarray(arr), ("RGBA" if c == 4 else "RGB")


# ------------------------------------------------------------- dispatch

_DECODERS = (decode_png_pixels, decode_pnm_pixels, decode_bmp_pixels)


def decode_pixels(payload):
    """Raster decode dispatch on magic bytes: ``(H*W*C uint8 array, mode)``
    or None for anything unrecognized, unsupported, or corrupt."""
    try:
        b = bytes(payload)
    except (TypeError, ValueError):
        return None
    if len(b) < 2:
        return None
    for dec in _DECODERS:
        try:
            got = dec(b)
        except (struct.error, IndexError, ValueError):
            got = None
        if got is not None:
            return got
    return None
