"""WAV/RIFF PCM codec (operators/audio.py): encoder→decoder round trips
at both bit widths, hand-built containers with extra chunks and odd-length
padding, corrupt/unsupported rejects, and the stdlib `wave` module as an
independent parity reference (it ships with CPython — a decoder we did
not write)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from fluss_iceberg_spark.operators.audio import decode_wav, encode_wav, zero_crossings

rng = np.random.default_rng(11)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("channels", [1, 2, 4])
def test_round_trip(bits, channels):
    lim = 100 if bits == 8 else 20000
    arr = rng.integers(-lim, lim, size=(37, channels), dtype=np.int64).astype(np.int32)
    got = decode_wav(encode_wav(arr, 16000, bits))
    assert got is not None
    dec, rate = got
    assert rate == 16000
    assert np.array_equal(dec, arr)


def test_mono_1d_input_and_odd_data_padding():
    arr = np.array([1, -2, 3], dtype=np.int32)  # 3 bytes of 8-bit data: odd
    b = encode_wav(arr, 8000, 8)
    assert len(b) % 2 == 0  # word-aligned container
    dec, rate = decode_wav(b)
    assert np.array_equal(dec, arr[:, None])


def test_extra_chunks_are_skipped():
    """Real WAV files carry LIST/INFO etc. between fmt and data."""
    arr = rng.integers(-500, 500, size=(9, 2), dtype=np.int64).astype(np.int32)
    b = encode_wav(arr, 44100, 16)
    # splice a LIST chunk (odd length, so padding matters) after fmt
    fmt_end = b.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = b[:fmt_end] + extra + b[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec, rate = decode_wav(spliced)
    assert rate == 44100 and np.array_equal(dec, arr)


def test_rejects_corrupt_and_unsupported():
    arr = np.zeros((4, 1), dtype=np.int32)
    good = encode_wav(arr, 8000, 16)
    assert decode_wav(b"RIFFxxxxWAVE") is None  # no chunks
    assert decode_wav(b"garbage") is None
    assert decode_wav(None) is None
    assert decode_wav(good[:20]) is None  # truncated chunk
    ulaw = bytearray(good)
    ulaw[20] = 7  # audio format 7 = mu-law
    assert decode_wav(bytes(ulaw)) is None
    b24 = bytearray(good)
    b24[34] = 24  # 24-bit
    assert decode_wav(bytes(b24)) is None


def test_stdlib_wave_parity():
    """The CPython `wave` module must read our encoder's output with
    identical parameters and raw frames — and our decoder must read
    wave-module-written bytes back to the same samples."""
    arr = rng.integers(-3000, 3000, size=(25, 2), dtype=np.int64).astype(np.int32)
    ours = encode_wav(arr, 22050, 16)
    with wave.open(io.BytesIO(ours)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (2, 2, 22050)
        frames = w.readframes(w.getnframes())
    assert np.array_equal(
        np.frombuffer(frames, dtype="<i2").reshape(-1, 2), arr.astype("<i2")
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(arr.astype("<i2").tobytes())
    dec, rate = decode_wav(buf.getvalue())
    assert rate == 22050 and np.array_equal(dec, arr)


def test_zero_crossings_definition():
    s = np.array([3, -1, -2, 0, 5, -5], dtype=np.int32)
    # sign-bit sequence: + - - + + -  → changes at 1, 3, 5
    assert zero_crossings(s) == 3
    assert zero_crossings(np.array([1, 2, 3], dtype=np.int32)) == 0
    assert zero_crossings(np.array([0, -1, 0], dtype=np.int32)) == 2


def test_spectrum64_tone_isolation():
    """A pure probe-bin tone puts (essentially) all power in its bin."""
    import math

    import numpy as np

    from fluss_iceberg_spark.operators.audio import spectrum64

    t = np.arange(64)
    for k in (1, 2, 4, 8):
        x = (1500 * np.cos(2 * math.pi * k * t / 64)).astype(np.int64)
        s = spectrum64(x)
        assert s["dom_bin"] == k
        others = [s[f"p{b}"] for b in (1, 2, 4, 8) if b != k]
        assert s[f"p{k}"] > 50 * max(max(others), 1)


def test_spectrum64_pad_and_truncate():
    import numpy as np

    from fluss_iceberg_spark.operators.audio import spectrum64

    short = np.arange(20, dtype=np.int64) * 10 - 100
    padded = np.concatenate([short, np.zeros(44, dtype=np.int64)])
    assert spectrum64(short) == spectrum64(padded)
    long = np.arange(100, dtype=np.int64)
    assert spectrum64(long) == spectrum64(long[:64])


def test_spectrum64_kernel_equals_oracle_model():
    """Kernel DFT over the synth sample model == the oracle's replay
    (no Spark: decode itself is gated by multimodal_audio_features)."""
    import duckdb
    import numpy as np

    from fluss_iceberg_spark.operators.audio import spectrum64
    from fluss_iceberg_spark.workloads.multimodal import (
        _audio_spectrum_oracle_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT UNNEST(range(0, 40)) AS doc_id")
    rows = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(_audio_spectrum_oracle_sql()).fetchall()
    }
    for doc in range(40):
        c, n = 1 + doc % 2, doc % 50 + 20
        t = np.arange(n, dtype=np.int64)
        if doc % 3 == 0:
            x = (doc * 13 + t * c * 17) % 200 - 100
        else:
            x = (doc * 13 + t * c * 17) % 4001 - 2000
        s = spectrum64(x)
        assert rows[doc] == (s["p1"], s["p2"], s["p4"], s["p8"], s["dom_bin"]), doc
