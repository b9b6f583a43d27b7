"""Pure-Python animated-GIF frame decode — the video modality's real
decode path (frames-from-a-container), completing the multimodal
surface: raster images (operators/rasters.py), audio (operators/
audio.py), and now multi-frame animation, all from their public
specifications with stdlib-only parsing.

GIF89a structure handled (GIF spec, public): header + logical screen
descriptor, global color table, and a block stream of extensions
(graphic-control extensions supply per-frame delay; others skipped via
their sub-block framing) and image descriptors, each followed by a
variable-code-width **LZW**-compressed index raster. The LZW decoder
implements the spec's dynamic dictionary: initial width = min_code_size
+ 1, clear/EOI codes, width growth at dictionary sizes 2^n, the
"code == next_entry" self-referential case, and a 4096-entry cap.

``decode_gif_frames`` returns a list of per-frame records — frame
index, geometry (left/top/width/height within the logical screen),
delay in centiseconds, and the decoded palette-index array — or None
for anything corrupt or unsupported (interlaced frames return None:
supporting Adam-style row reordering adds surface without changing
what the gate proves). Frames are reported as-decoded (no inter-frame
disposal composition), which is exactly the frame-sampling shape a
training-data pipeline needs: per-frame features, not playback.

A matching minimal encoder (``encode_gif``) writes animated GIFs using
spec-conformant LZW with periodic clear codes (dictionary never grows
past one bit of width — simple, valid output any decoder accepts); it
shares no code with the decoder, so round trips are a real check.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------- LZW decode


def _lzw_decode(data: bytes, min_code_size: int, expected: int):
    """GIF-variant LZW: variable code width, clear + EOI codes, 4096-entry
    dictionary cap. Returns exactly ``expected`` indices or None."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as a list of bytes entries
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:expected]) if len(out) >= expected else None
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]  # the self-referential case
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected]) if len(out) >= expected else None


def _sub_blocks(b: bytes, i: int):
    """Concatenate GIF data sub-blocks starting at offset i; return
    (payload, offset past the terminator) or None if truncated."""
    parts = []
    while True:
        if i >= len(b):
            return None
        n = b[i]
        i += 1
        if n == 0:
            return b"".join(parts), i
        if i + n > len(b):
            return None
        parts.append(b[i : i + n])
        i += n


def decode_gif_frames(payload):
    """Animated-GIF decode: list of frame dicts (frame_idx, left, top,
    width, height, delay_cs, ``indices`` HxW uint8 palette-index array,
    ``palette`` Nx3 uint8 — local table when present, else global) or
    None for corrupt/unsupported payloads."""
    try:
        b = bytes(payload)
    except (TypeError, ValueError):
        return None
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    flags = b[10]
    i = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if i + 3 * n > len(b):
            return None
        global_palette = np.frombuffer(b, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    frames = []
    delay_cs = 0
    while i < len(b):
        block = b[i]
        i += 1
        if block == 0x3B:  # trailer
            return frames if frames else None
        if block == 0x21:  # extension: label + sub-blocks
            if i >= len(b):
                return None
            label = b[i]
            i += 1
            got = _sub_blocks(b, i)
            if got is None:
                return None
            body, i = got
            if label == 0xF9 and len(body) >= 4:  # graphic control
                (delay_cs,) = struct.unpack_from("<H", body, 1)
            continue
        if block != 0x2C:  # not an image descriptor
            return None
        if i + 9 > len(b):
            return None
        left, top, w, h = struct.unpack_from("<HHHH", b, i)
        iflags = b[i + 8]
        i += 9
        if w == 0 or h == 0 or iflags & 0x40:  # interlaced unsupported
            return None
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if i + 3 * n > len(b):
                return None
            palette = np.frombuffer(b, np.uint8, 3 * n, i).reshape(n, 3)
            i += 3 * n
        if palette is None or i >= len(b):
            return None
        min_code_size = b[i]
        i += 1
        if not 2 <= min_code_size <= 11:
            return None
        got = _sub_blocks(b, i)
        if got is None:
            return None
        data, i = got
        idx = _lzw_decode(data, min_code_size, w * h)
        if idx is None:
            return None
        arr = np.frombuffer(idx, np.uint8).reshape(h, w)
        if arr.max() >= len(palette):
            return None
        frames.append(
            {
                "frame_idx": len(frames),
                "left": left,
                "top": top,
                "width": w,
                "height": h,
                "delay_cs": delay_cs,
                "indices": arr,
                "palette": palette,
            }
        )
        delay_cs = 0  # a GCE applies to the single following image
    return None  # ran off the end without a trailer


# ----------------------------------------------------------- LZW encode


def _lzw_encode_flat(indices: np.ndarray, min_code_size: int) -> bytes:
    """Spec-conformant LZW stream that never grows the dictionary past
    one width step: emit a clear code, then each index as its own code,
    re-clearing before the dictionary would force a width increase.
    Simple, valid, and decoder-agnostic (any conforming reader accepts
    it); compression is not the point here — export fidelity is."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # after a clear the table has eoi+1 entries; each emitted index code
    # appends one entry; re-clear before len reaches 2^width
    budget = (1 << width) - (eoi + 1) - 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    left = budget
    for v in indices.ravel().tolist():
        if left == 0:
            emit(clear)
            left = budget
        emit(int(v))
        left -= 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames, palette: np.ndarray, delays_cs=None) -> bytes:
    """Minimal animated-GIF encoder: one global color table, one image
    descriptor per frame (full-screen), optional per-frame delays via
    graphic-control extensions."""
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    n_colors = len(palette)
    depth = max(1, (int(n_colors) - 1).bit_length())
    table_size = 1 << depth
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes() + b"\x00" * (3 * (table_size - n_colors))
    min_code_size = max(2, depth)
    for k, frame in enumerate(frames):
        fh, fw = frame.shape
        delay = (delays_cs[k] if delays_cs is not None else 0)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh) + b"\x00"
        out.append(min_code_size)
        data = _lzw_encode_flat(np.asarray(frame, dtype=np.uint8), min_code_size)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
