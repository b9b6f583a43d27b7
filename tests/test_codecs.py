"""Pure-Python image header probes (operators/codecs.py): constructed
VALID files of each format decode to their true (width, height, mode);
corrupt/truncated payloads return None. When Pillow happens to be
installed, every probe result is checked against PIL on the same bytes
— the two decode_real paths must be drop-in interchangeable."""

from __future__ import annotations

import binascii
import struct
import zlib

import pytest

from fluss_iceberg_spark.operators import codecs as C


def make_png(w: int, h: int, color_type: int = 2) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    nchan = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * (w * nchan) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_bmp(w: int, h: int) -> bytes:
    row = w * 3
    pad = (4 - row % 4) % 4
    pixels = (b"\x40" * row + b"\x00" * pad) * h
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
        )
        + pixels
    )


def make_ppm(w: int, h: int) -> bytes:
    return f"P6\n# a comment\n{w} {h}\n255\n".encode() + b"\x10" * (w * h * 3)


# the canonical 1x1 GIF (public knowledge, e.g. the classic tracking
# pixel): header + LSD + 2-color table + GCE + image + LZW + trailer
GIF_1X1 = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff"
    b"!\xf9\x04\x00\x00\x00\x00\x00"
    b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
)

# header-only JPEG: SOI + APP0/JFIF + SOF0 (8x6, 3 components). Enough
# for any header probe (PIL included — lazy open reads to SOF), though
# not renderable.
JPEG_HDR = (
    b"\xff\xd8"
    + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 6, 8)
    + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
)


VALID = [
    (make_ppm(5, 3), (5, 3, "RGB")),
    (b"P5 4 2 255 " + b"\x00" * 8, (4, 2, "L")),
    (make_bmp(7, 2), (7, 2, "RGB")),
    (make_png(9, 4), (9, 4, "RGB")),
    (make_png(3, 3, color_type=6), (3, 3, "RGBA")),
    (GIF_1X1, (1, 1, "P")),
    (JPEG_HDR, (8, 6, "RGB")),
]

CORRUPT = [
    b"",
    b"x",
    b"not an image at all",
    b"P6\n-3 4\n255\n",  # negative dims
    b"\x89PNG\r\n\x1a\n" + b"\x00" * 6,  # truncated before IHDR
    b"BM\x00\x00",  # truncated BMP
    b"\xff\xd8\x00\x00",  # JPEG desync (no marker after SOI)
]


@pytest.mark.parametrize("payload,want", VALID, ids=[w[2] + str(w[0]) for _, w in VALID])
def test_probe_valid(payload, want):
    assert C.probe_image(payload) == want


@pytest.mark.parametrize("payload", CORRUPT, ids=range(len(CORRUPT)))
def test_probe_corrupt_returns_none(payload):
    assert C.probe_image(payload) is None


def test_bmp_topdown_negative_height():
    b = bytearray(make_bmp(7, 2))
    struct.pack_into("<i", b, 22, -2)  # top-down DIB
    assert C.probe_image(bytes(b)) == (7, 2, "RGB")


def test_pil_parity_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    for payload, want in VALID[:-1]:  # header-only JPEG isn't PIL-valid
        with PIL.open(io.BytesIO(payload)) as im:
            assert (im.width, im.height, im.mode) == want
