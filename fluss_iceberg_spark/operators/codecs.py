"""Pure-Python image header probes — the in-container real-decode path.

``decode_real`` (operators/multimodal.py) extracts (width, height, mode)
per payload. PIL's ``Image.open`` does exactly that lazily — it parses
the container header and defers raster decode — so for this feature set
a header parse IS the real decode. This module implements that parse
for the common container formats from their public specifications, with
zero dependencies, so the real-decode path executes in environments
(like this container) where Pillow is not installed:

- PPM/PGM binary+ASCII (netpbm: magic ``P2/P3/P5/P6``, whitespace+comment
  tokenized header)
- BMP (``BM`` + BITMAPINFOHEADER: i32 width/height at offsets 18/22,
  u16 bpp at 28)
- PNG (8-byte signature, IHDR: u32be width/height at offsets 16/20,
  color type at 25)
- GIF (``GIF87a``/``GIF89a`` + u16le logical screen size)
- JPEG (marker walk to the first SOF0-SOF15 frame header)

Every probe returns ``(width, height, mode)`` or ``None`` for payloads
it cannot prove are that format — corrupt blobs yield None, never an
exception (a 100 TB crawl always contains garbage). Mode strings follow
PIL conventions ("RGB", "L", "P", "RGBA", "LA") so the two decode paths
are drop-in interchangeable and unit-tested against each other when PIL
is available.
"""

from __future__ import annotations

import re
import struct

_PNM_MODE = {b"P2": "L", b"P3": "RGB", b"P5": "L", b"P6": "RGB"}
# PNG color types: 0 gray, 2 truecolor, 3 palette, 4 gray+alpha, 6 rgba
_PNG_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
# SOF markers carry the frame dimensions; DHT/DAC/RST/SOI/EOI are not SOFs
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def probe_pnm(b: bytes) -> tuple[int, int, str] | None:
    if b[:2] not in _PNM_MODE:
        return None
    # header tokens are separated by whitespace; '#' starts a comment
    # that runs to end-of-line (netpbm spec). Tokenize the first ~1KB.
    head = re.sub(rb"#[^\n\r]*", b" ", b[2:1024])
    toks = head.split()
    if len(toks) < 2:
        return None
    try:
        w, h = int(toks[0]), int(toks[1])
    except ValueError:
        return None
    if w <= 0 or h <= 0:
        return None
    return w, h, _PNM_MODE[b[:2]]


def probe_bmp(b: bytes) -> tuple[int, int, str] | None:
    if b[:2] != b"BM" or len(b) < 30:
        return None
    w, h = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    if w <= 0 or h == 0:
        return None
    # negative height = top-down DIB, same magnitude
    mode = {1: "P", 4: "P", 8: "P", 24: "RGB", 32: "RGBA"}.get(bpp)
    return (w, abs(h), mode) if mode else None


def probe_png(b: bytes) -> tuple[int, int, str] | None:
    if b[:8] != b"\x89PNG\r\n\x1a\n" or len(b) < 26 or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", b, 16)
    color_type = b[25]
    if w == 0 or h == 0 or color_type not in _PNG_MODE:
        return None
    return w, h, _PNG_MODE[color_type]


def probe_gif(b: bytes) -> tuple[int, int, str] | None:
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 10:
        return None
    w, h = struct.unpack_from("<HH", b, 6)
    if w == 0 or h == 0:
        return None
    return w, h, "P"  # GIF is palette-indexed; PIL opens it as mode P


def probe_jpeg(b: bytes) -> tuple[int, int, str] | None:
    if b[:2] != b"\xff\xd8" or len(b) < 4:
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None  # desynced — not a marker where one must be
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            h, w = struct.unpack_from(">HH", b, i + 5)
            ncomp = b[i + 9]
            if w == 0 or h == 0:
                return None
            return w, h, {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, "RGB")
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        i += 2 + seglen
    return None


_PROBES = (probe_png, probe_jpeg, probe_gif, probe_bmp, probe_pnm)


def probe_image(payload) -> tuple[int, int, str] | None:
    """Dispatch on magic bytes; None for anything unrecognized/corrupt."""
    try:
        b = bytes(payload)
    except (TypeError, ValueError):
        return None
    if len(b) < 2:
        return None
    for probe in _PROBES:
        try:
            got = probe(b)
        except (struct.error, IndexError):
            got = None
        if got is not None:
            return got
    return None
