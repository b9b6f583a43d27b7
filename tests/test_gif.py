"""Animated-GIF codec (operators/gif.py): encoder→decoder round trips
(the encoder's flat periodic-clear LZW vs the decoder's full dynamic
dictionary — no shared code), a REAL dynamic-dictionary LZW stream the
flat encoder can never emit (exercises the table-growth and
self-referential-code branches), hand-built structural edge cases, and
PIL frame parity when Pillow happens to be installed."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from fluss_iceberg_spark.operators.gif import (
    _lzw_decode,
    decode_gif_frames,
    encode_gif,
)

rng = np.random.default_rng(5)
PAL64 = rng.integers(0, 256, (64, 3), dtype=np.uint8)


def test_round_trip_multiframe_with_delays():
    frames = [rng.integers(0, 64, (11, 9), dtype=np.uint8) for _ in range(4)]
    dec = decode_gif_frames(encode_gif(frames, PAL64, delays_cs=[0, 10, 25, 400]))
    assert len(dec) == 4
    for k, f in enumerate(dec):
        assert (f["frame_idx"], f["width"], f["height"]) == (k, 9, 11)
        assert f["delay_cs"] == [0, 10, 25, 400][k]
        assert np.array_equal(f["indices"], frames[k])
        assert np.array_equal(f["palette"][:64], PAL64)


def test_round_trip_large_frame_and_tiny_palette():
    big = rng.integers(0, 64, (40, 50), dtype=np.uint8)  # >255-byte sub-blocks
    assert np.array_equal(decode_gif_frames(encode_gif([big], PAL64))[0]["indices"], big)
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    fr = rng.integers(0, 2, (5, 7)).astype(np.uint8)
    dec = decode_gif_frames(encode_gif([fr], pal2))
    assert np.array_equal(dec[0]["indices"], fr)


def test_lzw_dynamic_dictionary_stream():
    """Build a dictionary-using LZW stream BY HAND (codes that reference
    multi-symbol entries, including the code == next_entry
    self-referential case) — the flat encoder never emits these, so this
    pins the decoder branches a real-world GIF exercises."""
    min_code = 2  # clear=4, eoi=5, first dynamic entry=6, width starts at 3
    # emit: CLEAR, 1, 2, 6 (multi-symbol entry [1,2]), then 8 at the
    # moment the table has exactly 8 entries — the self-referential
    # code == next_entry case (entry = prev + prev[0]) — then EOI.
    # Width grows 3 -> 4 after code 6 brings the table to 2^3 entries,
    # so the last two codes must be written at width 4 (matching a
    # conforming encoder).
    codes_and_widths = [(4, 3), (1, 3), (2, 3), (6, 3), (8, 4), (5, 4)]
    acc = 0
    nbits = 0
    out = bytearray()
    for c, width in codes_and_widths:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    # spec replay: 1 -> [1]; 2 -> [2], add 6=[1,2]; 6 -> [1,2], add
    # 7=[2,1] (table now 8 -> width 4); 8 self-ref -> [1,2]+[1]=[1,2,1]
    expected = bytes([1, 2, 1, 2, 1, 2, 1])
    got = _lzw_decode(bytes(out), min_code, len(expected))
    assert got == expected


def test_extensions_skipped_and_gce_scoping():
    """Unknown extensions (comment, application) are skipped via their
    sub-block framing; a GCE's delay applies only to the NEXT image."""
    f0 = rng.integers(0, 64, (4, 4), dtype=np.uint8)
    f1 = rng.integers(0, 64, (4, 4), dtype=np.uint8)
    b = encode_gif([f0, f1], PAL64, delays_cs=[30, 0])
    # splice a comment extension right after the global color table
    head_len = 13 + 3 * 64
    comment = b"\x21\xfe\x05hello\x00"
    spliced = b[:head_len] + comment + b[head_len:]
    dec = decode_gif_frames(spliced)
    assert len(dec) == 2
    assert dec[0]["delay_cs"] == 30 and dec[1]["delay_cs"] == 0
    assert np.array_equal(dec[0]["indices"], f0)
    assert np.array_equal(dec[1]["indices"], f1)


def test_local_color_table_wins():
    fr = np.zeros((2, 2), dtype=np.uint8)
    b = bytearray(encode_gif([fr], PAL64))
    # rewrite the image descriptor to carry a local table of 2 entries
    idesc = b.index(b"\x2c")
    local = np.array([[9, 9, 9], [1, 1, 1]], dtype=np.uint8)
    rebuilt = (
        bytes(b[: idesc + 9])
        + bytes([0x80 | 0])  # local table flag, size 2^(0+1)=2
        + local.tobytes()
        + bytes(b[idesc + 10 :])
    )
    dec = decode_gif_frames(rebuilt)
    assert np.array_equal(dec[0]["palette"], local)


def test_rejects_corrupt_unsupported():
    frames = [rng.integers(0, 64, (6, 6), dtype=np.uint8)]
    good = encode_gif(frames, PAL64)
    assert decode_gif_frames(b"GIF89a") is None
    assert decode_gif_frames(good[: len(good) // 2]) is None  # truncated
    assert decode_gif_frames(b"not a gif") is None
    assert decode_gif_frames(None) is None
    no_trailer = good[:-1]
    assert decode_gif_frames(no_trailer) is None
    interlaced = bytearray(good)
    idesc = interlaced.index(b"\x2c")
    interlaced[idesc + 9] |= 0x40
    assert decode_gif_frames(bytes(interlaced)) is None
    # index out of palette range: shrink the declared screen palette is
    # structural; instead corrupt a pixel code stream to decode garbage
    # indices >= palette length via a 128-entry frame on a 64-color table
    frames_big_idx = [np.full((3, 3), 100, dtype=np.uint8)]
    bad = encode_gif(frames_big_idx, PAL64)  # encoder trusts caller
    assert decode_gif_frames(bad) is None


def test_pil_parity_frames():
    PIL = pytest.importorskip("PIL.Image")
    frames = [rng.integers(0, 64, (8, 10), dtype=np.uint8) for _ in range(3)]
    b = encode_gif(frames, PAL64, delays_cs=[10, 20, 30])
    with PIL.open(io.BytesIO(b)) as im:
        assert im.n_frames == 3
        for k in range(3):
            im.seek(k)
            assert np.array_equal(np.asarray(im), frames[k])
            assert im.info.get("duration", 0) == [100, 200, 300][k]
