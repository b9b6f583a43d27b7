"""ISO-BMFF (MP4) writer/parser unit coverage: round trip, spec edge
cases the synthesized corpus doesn't reach (64-bit largesize, co64,
constant-size stsz, size==0 to-end boxes), and corruption handling."""

from __future__ import annotations

import struct

import pytest

from fluss_iceberg_spark.operators.video import (
    VideoTrack,
    _box,
    encode_mp4,
    frame_bytes,
    parse_mp4,
)


def _mk_frames(d: int, n: int):
    frames = [
        bytes((d * 7 + i * 31 + k * 13) % 251 for k in range(16 + (d + i * 3) % 9))
        for i in range(n)
    ]
    durs = [100 + d % 7 if i < n // 2 else 150 + d % 11 for i in range(n)]
    return frames, durs


def test_roundtrip_all_geometries():
    for d in range(60):
        n = d % 6 + 3
        frames, durs = _mk_frames(d, n)
        ts = 1000 + (d % 3) * 200
        w, h = (d % 5 + 2) * 16, (d % 4 + 2) * 16
        payload = encode_mp4(frames, durs, ts, w, h)
        t = parse_mp4(payload)
        assert t is not None
        assert (t.brand, t.handler, t.track_id) == ("isom", "vide", 1)
        assert (t.timescale, t.duration) == (ts, sum(durs))
        assert (t.width, t.height) == (w, h)
        assert t.durations == durs
        assert [frame_bytes(payload, t, i) for i in range(n)] == frames


def test_chunk_tail_and_single_chunk():
    # odd frame count -> short tail chunk; frames_per_chunk > n -> one
    # short chunk (the stsc single-entry path)
    frames, durs = _mk_frames(3, 5)
    t = parse_mp4(encode_mp4(frames, durs, 1000, 32, 32, frames_per_chunk=2))
    assert t.n_frames == 5
    frames, durs = _mk_frames(4, 3)
    p = encode_mp4(frames, durs, 1000, 32, 32, frames_per_chunk=8)
    t = parse_mp4(p)
    assert [frame_bytes(p, t, i) for i in range(3)] == frames


def test_corrupt_payloads_yield_none():
    assert parse_mp4(None) is None
    assert parse_mp4(b"") is None
    assert parse_mp4(b"\x00" * 64) is None
    frames, durs = _mk_frames(1, 4)
    p = encode_mp4(frames, durs, 1000, 16, 16)
    assert parse_mp4(p[:-12]) is None  # truncated moov
    # flip stco to point past EOF: corrupt every plausible offset byte
    bad = bytearray(p)
    idx = p.rindex(b"stco")
    struct.pack_into(">I", bad, idx + 12, 2**31)
    assert parse_mp4(bytes(bad)) is None


def test_largesize_and_to_end_boxes():
    frames, durs = _mk_frames(2, 3)
    p = encode_mp4(frames, durs, 1000, 16, 16)
    # rewrite ftyp with a 64-bit largesize header (size==1 marker)
    ftyp_len = struct.unpack_from(">I", p, 0)[0]
    body = p[8:ftyp_len]
    wide_ftyp = (
        struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 16 + len(body)) + body
    )
    shift = len(wide_ftyp) - ftyp_len
    rest = bytearray(p[ftyp_len:])
    # stco offsets moved by `shift`: fix them so frames still resolve
    idx = bytes(rest).rindex(b"stco")
    (n_chunks,) = struct.unpack_from(">I", rest, idx + 8)
    for c in range(n_chunks):
        (off,) = struct.unpack_from(">I", rest, idx + 12 + c * 4)
        struct.pack_into(">I", rest, idx + 12 + c * 4, off + shift)
    p2 = wide_ftyp + bytes(rest)
    t = parse_mp4(p2)
    assert t is not None and t.n_frames == 3
    assert [frame_bytes(p2, t, i) for i in range(3)] == frames
    # size==0: last box (moov) extends to end of file
    moov_at = p.rindex(b"moov") - 4
    zeroed = bytearray(p)
    struct.pack_into(">I", zeroed, moov_at, 0)
    t = parse_mp4(bytes(zeroed))
    assert t is not None and t.n_frames == 3


def test_co64_and_constant_stsz():
    frames = [b"\x01\x02\x03\x04"] * 4  # equal sizes -> constant stsz legal
    durs = [10, 10, 10, 10]
    p = encode_mp4(frames, durs, 600, 16, 16)
    # rewrite stsz to the constant-size form (sample_size != 0, no table)
    idx = p.rindex(b"stsz")
    head, tail = p[: idx - 4], p[idx - 4 :]
    (old_len,) = struct.unpack_from(">I", tail, 0)
    new_stsz = _box(b"stsz", struct.pack(">III", 0, 4, 4))
    rebuilt = head + new_stsz + tail[old_len:]
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov shrink)
    delta = old_len - len(new_stsz)
    out = bytearray(rebuilt)
    for marker in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        at = bytes(out).rindex(marker) - 4
        (sz,) = struct.unpack_from(">I", out, at)
        struct.pack_into(">I", out, at, sz - delta)
    t = parse_mp4(bytes(out))
    assert t is not None and t.sizes == [4, 4, 4, 4]
    # rewrite stco as co64 (8-byte offsets)
    idx = bytes(out).rindex(b"stco")
    (stco_len,) = struct.unpack_from(">I", out, idx - 4)
    (n_chunks,) = struct.unpack_from(">I", out, idx + 8)
    offs = [
        struct.unpack_from(">I", out, idx + 12 + c * 4)[0] for c in range(n_chunks)
    ]
    co64 = _box(
        b"co64",
        struct.pack(">II", 0, n_chunks)
        + b"".join(struct.pack(">Q", o) for o in offs),
    )
    grown = co64 and len(co64) - stco_len
    out2 = bytearray(bytes(out)[: idx - 4] + co64 + bytes(out)[idx - 4 + stco_len :])
    for marker in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        at = bytes(out2).rindex(marker) - 4
        (sz,) = struct.unpack_from(">I", out2, at)
        struct.pack_into(">I", out2, at, sz + grown)
    t = parse_mp4(bytes(out2))
    assert t is not None and t.n_frames == 4
    assert frame_bytes(bytes(out2), t, 2) == b"\x01\x02\x03\x04"


def test_stss_sync_samples():
    frames, durs = _mk_frames(5, 7)
    # no stss box: EVERY sample is sync, per the spec
    t = parse_mp4(encode_mp4(frames, durs, 1000, 16, 16))
    assert t.sync == [True] * 7
    # sync_every=3 marks 1-based samples 1,4,7 -> 0-based 0,3,6
    p = encode_mp4(frames, durs, 1000, 16, 16, sync_every=3)
    t = parse_mp4(p)
    assert t.sync == [i % 3 == 0 for i in range(7)]
    assert [frame_bytes(p, t, i) for i in range(7)] == frames
    # truncated stss table -> reject
    bad = bytearray(p)
    idx = p.rindex(b"stss")
    struct.pack_into(">I", bad, idx + 8, 2_000_000)
    assert parse_mp4(bytes(bad)) is None


def test_writer_rejects_misaligned_inputs():
    with pytest.raises(ValueError):
        encode_mp4([b"x"], [1, 2], 1000, 16, 16)
    with pytest.raises(ValueError):
        encode_mp4([], [], 1000, 16, 16)


def test_frame_bytes_is_byte_range_only():
    # frame_bytes must not depend on scanning mdat: give it a track with
    # hand-built offsets over a flat buffer
    buf = bytes(range(100))
    t = VideoTrack(
        brand="isom", timescale=1, duration=1, track_id=1, width=1, height=1,
        handler="vide", durations=[1, 1], offsets=[10, 50], sizes=[5, 3],
        sync=[True, True],
    )
    assert frame_bytes(buf, t, 0) == bytes([10, 11, 12, 13, 14])
    assert frame_bytes(buf, t, 1) == bytes([50, 51, 52])


def test_multi_trak_prefers_video_handler():
    """Real files put the audio trak first; the parser must pick the
    'vide' trak, not positionally the first one."""
    frames, durs = _mk_frames(7, 4)
    p = encode_mp4(frames, durs, 1000, 48, 32)
    # build a fake audio trak: clone the video trak, flip its hdlr to
    # 'soun', and splice it BEFORE the real one inside moov
    moov_at = p.rindex(b"moov") - 4
    (moov_len,) = struct.unpack_from(">I", p, moov_at)
    moov_body = p[moov_at + 8 : moov_at + moov_len]
    trak_at = moov_body.index(b"trak") - 4
    (trak_len,) = struct.unpack_from(">I", moov_body, trak_at)
    trak = bytearray(moov_body[trak_at : trak_at + trak_len])
    h = bytes(trak).index(b"hdlr")
    assert trak[h + 12 : h + 16] == b"vide"
    trak[h + 12 : h + 16] = b"soun"
    new_body = (
        moov_body[:trak_at] + bytes(trak) + moov_body[trak_at:]
    )
    new_moov = struct.pack(">I", 8 + len(new_body)) + b"moov" + new_body
    p2 = p[:moov_at] + new_moov
    t = parse_mp4(p2)
    assert t is not None and t.handler == "vide"
    assert (t.width, t.height) == (48, 32)
    assert [frame_bytes(p2, t, i) for i in range(4)] == frames
