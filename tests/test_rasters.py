"""Raster (pixel-level) codecs: operators/rasters.py.

The decode path is verified three independent ways: (1) round trips
against the module's own PNG encoder — which shares no filter code with
the decoder (forward vs inverse filtering); (2) hand-constructed
containers (palette PNG, BMP top-down/bottom-up, netpbm ASCII) decoded
against the arrays they were built from; (3) PIL parity on the same
bytes when Pillow happens to be installed. aHash is verified against a
from-the-definition pure-Python replay of the cross-multiplied integer
threshold the DuckDB oracle also uses."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fluss_iceberg_spark.operators import rasters as R
from fluss_iceberg_spark.operators.multimodal import ahash_bits

rng = np.random.default_rng(42)


# ------------------------------------------------------------- PNG


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(channels, filter_type):
    arr = rng.integers(0, 256, size=(11, 19, channels), dtype=np.uint8)
    got = R.decode_png_pixels(R.encode_png(arr, filter_type))
    assert got is not None
    dec, mode = got
    assert mode == {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[channels]
    assert np.array_equal(dec, arr)


def test_png_multi_idat_and_dispatch():
    """Rasters split across several IDAT chunks concatenate before
    inflate (PNG spec), and decode_pixels dispatches on the signature."""
    arr = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    b = R.encode_png(arr, 2)
    # split the single IDAT into two chunks
    sig_ihdr = b[: 8 + 25]
    (idat_len,) = struct.unpack_from(">I", b, 33)
    idat_data = b[41 : 41 + idat_len]
    rest = b[41 + idat_len + 4 :]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    half = len(idat_data) // 2
    rebuilt = (
        sig_ihdr
        + chunk(b"IDAT", idat_data[:half])
        + chunk(b"IDAT", idat_data[half:])
        + rest
    )
    dec, mode = R.decode_pixels(rebuilt)
    assert np.array_equal(dec, arr)


def test_png_palette_expands_to_rgb():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    b = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dec, mode = R.decode_png_pixels(b)
    assert mode == "RGB"
    assert np.array_equal(dec, palette[idx])


def test_png_unsupported_shapes_return_none():
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = R.encode_png(arr)
    # 16-bit depth
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    assert R.decode_png_pixels(bytes(bad_depth)) is None
    # Adam7 interlace flag
    interlaced = bytearray(good)
    interlaced[28] = 1
    assert R.decode_png_pixels(bytes(interlaced)) is None
    # palette image without PLTE
    no_plte = bytearray(good)
    no_plte[25] = 3
    assert R.decode_png_pixels(bytes(no_plte)) is None
    # corrupt deflate stream / truncation
    assert R.decode_png_pixels(good[:40]) is None
    garbled = good[:41] + b"\x00\x00\x00\x00" + good[45:]
    assert R.decode_png_pixels(garbled) is None


# ----------------------------------------------------------- netpbm


def test_pnm_binary_and_ascii():
    raster = bytes(range(48))
    dec, mode = R.decode_pnm_pixels(b"P6\n4 4\n255\n" + raster)
    assert mode == "RGB" and dec.shape == (4, 4, 3) and dec.tobytes() == raster
    dec, mode = R.decode_pnm_pixels(b"P5\n# c\n6 8\n255\n" + bytes(range(48)))
    assert mode == "L" and dec.shape == (8, 6, 1)
    dec, mode = R.decode_pnm_pixels(b"P2\n3 2\n255\n1 2 3\n4 5 6\n")
    assert dec.ravel().tolist() == [1, 2, 3, 4, 5, 6]
    dec, mode = R.decode_pnm_pixels(b"P3\n1 2\n9\n1 2 3 4 5 6")
    assert mode == "RGB" and dec.ravel().tolist() == [1, 2, 3, 4, 5, 6]


def test_pnm_rejects_bad_payloads():
    assert R.decode_pnm_pixels(b"P6\n4 4\n255\nshort") is None
    assert R.decode_pnm_pixels(b"P6\n4 4\n65535\n" + b"x" * 96) is None  # 2-byte
    assert R.decode_pnm_pixels(b"P2\n2 1\n255\n7 999\n") is None  # > maxval
    assert R.decode_pnm_pixels(b"P6\n0 4\n255\n") is None


# -------------------------------------------------------------- BMP


def _make_bmp(arr: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    order = range(h) if top_down else range(h - 1, -1, -1)
    rows = b"".join(
        arr[y][:, [2, 1, 0]].tobytes().ljust(stride, b"\x00") for y in order
    )
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, (-h if top_down else h), 1, 24, 0, len(rows), 2835, 2835, 0, 0,
        )
        + rows
    )


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_both_row_orders(top_down):
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    dec, mode = R.decode_bmp_pixels(_make_bmp(arr, top_down))
    assert mode == "RGB" and np.array_equal(dec, arr)


def test_bmp_rejects_compressed_and_short():
    b = bytearray(_make_bmp(rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)))
    b[30] = 1  # BI_RLE8
    assert R.decode_bmp_pixels(bytes(b)) is None
    assert R.decode_bmp_pixels(_make_bmp(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))[:60]) is None


# -------------------------------------------------- dispatch + PIL parity


def test_decode_pixels_dispatch_and_garbage():
    assert R.decode_pixels(b"not an image") is None
    assert R.decode_pixels(b"") is None
    assert R.decode_pixels(None) is None
    arr = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    assert np.array_equal(R.decode_pixels(R.encode_png(arr, 4))[0], arr)


def test_pil_parity_pixel_decode():
    """When Pillow is installed, our raster decode must produce the same
    pixel array PIL does for the same bytes (PNG all filters + palette,
    P5/P6, BMP)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    cases = []
    for ft in range(5):
        cases.append(R.encode_png(rng.integers(0, 256, (9, 13, 3), dtype=np.uint8), ft))
    cases.append(b"P6\n5 4\n255\n" + bytes(rng.integers(0, 256, 60, dtype=np.uint8)))
    cases.append(_make_bmp(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)))
    for b in cases:
        ours, mode = R.decode_pixels(b)
        with PIL.open(io.BytesIO(b)) as im:
            theirs = np.asarray(im.convert("RGB") if mode == "RGB" else im)
        if theirs.ndim == 2:
            theirs = theirs[:, :, None]
        assert np.array_equal(ours, theirs)


# ------------------------------------------------------------- aHash


def _ahash_reference(gray: np.ndarray) -> str:
    """From-the-definition replay: floor-grid 8x8 blocks, bit = block
    mean > global mean via exact cross-multiplication."""
    h, w = gray.shape
    total = int(gray.sum())
    bits = []
    for r in range(8):
        for c in range(8):
            y0, y1 = (r * h) // 8, ((r + 1) * h) // 8
            x0, x1 = (c * w) // 8, ((c + 1) * w) // 8
            bsum = int(gray[y0:y1, x0:x1].sum())
            bits.append("1" if bsum * (h * w) > total * ((y1 - y0) * (x1 - x0)) else "0")
    return "".join(bits)


@pytest.mark.parametrize("shape", [(16, 16), (8, 8), (11, 23), (64, 48)])
def test_ahash_matches_reference(shape):
    gray = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert ahash_bits(gray) == _ahash_reference(gray.astype(np.int64))
    # 3-channel: gray = channel SUM (no division), same reference
    rgb = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert ahash_bits(rgb) == _ahash_reference(rgb.astype(np.int64).sum(axis=2))


def test_ahash_tiny_image_is_none():
    assert ahash_bits(np.zeros((7, 16), dtype=np.uint8)) is None
    assert ahash_bits(np.zeros((16, 7, 3), dtype=np.uint8)) is None


def test_ahash_near_dup_invariance():
    """A sparse small perturbation (the near-dup case the query
    synthesizes) leaves most blocks' votes unchanged — hamming distance
    stays far below that of an unrelated image."""
    base = rng.integers(40, 200, size=(16, 16), dtype=np.uint8)
    perturbed = base.copy()
    perturbed[::5, ::7] = np.minimum(perturbed[::5, ::7] + 4, 255)
    other = rng.integers(40, 200, size=(16, 16), dtype=np.uint8)
    h0, h1, h2 = ahash_bits(base), ahash_bits(perturbed), ahash_bits(other)
    d_near = sum(a != b for a, b in zip(h0, h1))
    d_far = sum(a != b for a, b in zip(h0, h2))
    assert d_near <= 8 < d_far


def test_ahash_near_pairs_banding_exact(spark):
    """The hamming-banded LSH must return EXACTLY the brute-force pair
    set for radius < band count (pigeonhole), including intra-hash
    (hamming 0) pairs from duplicate clusters."""
    from itertools import combinations

    from fluss_iceberg_spark.operators.multimodal import ahash_near_pairs

    rng2 = np.random.default_rng(99)
    base = ["".join(rng2.choice(list("01"), 64)) for _ in range(12)]
    rows = []
    doc = 0
    for h in base:
        for _ in range(int(rng2.integers(1, 4))):  # duplicate clusters
            bits = list(h)
            for flip in rng2.choice(64, int(rng2.integers(0, 5)), replace=False):
                bits[flip] = "1" if bits[flip] == "0" else "0"
            rows.append((doc, "".join(bits)))
            doc += 1
    rows.append((doc, None))  # undecodable payload -> NULL hash, dropped
    df = spark.createDataFrame(rows, "doc_id long, ahash string")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in ahash_near_pairs(df, max_hamming=6, n_bands=8).collect()
    }
    want = set()
    for (da, ha), (db, hb) in combinations(rows[:-1], 2):
        d = sum(a != b for a, b in zip(ha, hb))
        if d <= 6:
            want.add((min(da, db), max(da, db), d))
    assert got == want and len(want) > 0


def test_ahash_near_pairs_rejects_bad_radius(spark):
    from fluss_iceberg_spark.operators.multimodal import ahash_near_pairs

    df = spark.createDataFrame([(1, "0" * 64)], "doc_id long, ahash string")
    with pytest.raises(ValueError):
        ahash_near_pairs(df, max_hamming=8, n_bands=8)


def test_phash_kernel_matches_oracle_arithmetic():
    """phash_bits over the synthetic pixel model == the DuckDB oracle's
    arithmetic replay (no Spark: the PNG decode path itself is gated by
    png_pixel_stats; this pins the DCT/median/bit pipeline)."""
    import duckdb
    import numpy as np

    from fluss_iceberg_spark.operators.multimodal import phash_bits
    from fluss_iceberg_spark.workloads.multimodal import _phash_oracle_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT UNNEST(range(0, 45)) AS doc_id")
    rows = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_phash_oracle_sql()).fetchall()
    }
    for doc in range(45):
        w, h = doc % 9 + 8, doc % 5 + 8
        i = np.arange(w * h * 3, dtype=np.int64)
        arr = ((doc * 31 + i * 7) % 251).reshape(h, w, 3).astype(np.uint8)
        assert rows[doc] == (w, h, phash_bits(arr)), doc


def test_phash_robust_to_brightness_not_structure():
    """The property aHash lacks: a global brightness shift leaves the
    pHash unchanged (DC absorbs it; AC coefficients and their median
    shift-invariant), while transposing the image changes it."""
    import numpy as np

    from fluss_iceberg_spark.operators.multimodal import phash_bits

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 200, size=(16, 16), dtype=np.int64)
    base = phash_bits(arr)
    assert phash_bits(arr + 40) == base  # brightness shift
    assert phash_bits(arr.T) != base  # structural change


def test_phash_small_image_none():
    import numpy as np

    from fluss_iceberg_spark.operators.multimodal import phash_bits

    assert phash_bits(np.zeros((7, 12), dtype=np.uint8)) is None
