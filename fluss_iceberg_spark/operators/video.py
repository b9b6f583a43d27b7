"""Pure-Python video container (ISO-BMFF / MP4) parse — the video
modality's real container path, completing the multimodal decode surface
(image rasters in operators/rasters.py + gif.py, audio in
operators/audio.py). Recreates the video-column handling a lakehouse
ingest of crawl media needs (reference README.md demo stores media
pointers next to analytics rows; here the payload itself is a typed
binary column).

Implemented from the public ISO/IEC 14496-12 (ISO base media file
format) specification with stdlib ``struct`` only:

- generic box walk (32-bit size, ``size == 1`` -> 64-bit largesize,
  ``size == 0`` -> box extends to end of file), recursive descent into
  the container boxes ``moov/trak/mdia/minf/stbl``
- ``mvhd`` (version 0 and 1): movie timescale + duration
- ``tkhd`` (version 0 and 1): track id + 16.16 fixed-point width/height
- ``hdlr``: handler type (video tracks are ``vide``)
- the sample table: ``stts`` (decode-time run lengths -> per-sample
  durations), ``stsz`` (per-sample sizes, or a constant ``sample_size``),
  ``stsc`` (chunk-run expansion: entries are (first_chunk,
  samples_per_chunk) runs that apply UNTIL the next entry's
  first_chunk), ``stco``/``co64`` (absolute chunk file offsets)
- per-sample absolute byte ranges: chunk offset + the sizes of prior
  samples in the same chunk; frame bytes slice straight out of ``mdat``

``parse_mp4`` returns a ``VideoTrack`` (movie metadata + per-frame
(duration, offset, size) table) or ``None`` for anything corrupt or
unsupported -- never an exception: a 100 TB crawl always contains
garbage. ``frame_bytes`` materializes one frame's payload from the
sample table, which is exactly the 100 TB access pattern: at scale the
kernel reads ``moov`` plus the SAMPLED frames' byte ranges only, never
the full ``mdat`` (the sample table is the index that makes video
frame-sampling IO-proportional to frames taken, not bytes stored).

A matching minimal writer (``encode_mp4``) exists for constructing the
parse path's inputs and shares no parsing code with it (forward box
serialization vs inverse walk).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


# ------------------------------------------------------------ box walk


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the sibling boxes in
    b[start:end], honoring 64-bit largesize and size==0 (to-end) per the
    spec. Stops (rather than raises) on truncation."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", b, i)
        btype = b[i + 4 : i + 8]
        header = 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, i + 8)
            header = 16
        elif size == 0:
            size = end - i
        if size < header or i + size > end:
            return
        yield btype, i + header, i + size
        i += size


def _find_box(b: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _iter_boxes(b, start, end):
        if t == btype:
            return s, e
    return None


# ------------------------------------------------------- parsed result


@dataclass
class VideoTrack:
    brand: str
    timescale: int
    duration: int  # in movie timescale units
    track_id: int
    width: int
    height: int
    handler: str
    # per-frame, in decode order
    durations: list  # [int] timescale units (from stts run expansion)
    offsets: list  # [int] absolute file offsets (stsc x stco x stsz)
    sizes: list  # [int] bytes
    sync: list  # [bool] keyframe flags (stss; ALL sync when absent, per spec)

    @property
    def n_frames(self) -> int:
        return len(self.sizes)


def _parse_mvhd(b: bytes, s: int, e: int):
    version = b[s]
    if version == 1:
        if e - s < 28:
            return None
        timescale, duration = struct.unpack_from(">IQ", b, s + 20)
    else:
        if e - s < 20:
            return None
        timescale, duration = struct.unpack_from(">II", b, s + 12)
    return int(timescale), int(duration)

def _parse_tkhd(b: bytes, s: int, e: int):
    version = b[s]
    # track_id sits after version/flags + 2 timestamps; width/height are
    # the LAST 8 bytes of the box as 16.16 fixed-point (spec layout)
    if version == 1:
        if e - s < 32:
            return None
        (track_id,) = struct.unpack_from(">I", b, s + 20)
    else:
        if e - s < 24:
            return None
        (track_id,) = struct.unpack_from(">I", b, s + 12)
    if e - s < 8:
        return None
    w_fixed, h_fixed = struct.unpack_from(">II", b, e - 8)
    return int(track_id), w_fixed >> 16, h_fixed >> 16


def _parse_stts(b: bytes, s: int, e: int):
    """Expand decode-time run lengths to one duration per sample."""
    if e - s < 8:
        return None
    (n_entries,) = struct.unpack_from(">I", b, s + 4)
    if e - s < 8 + n_entries * 8:
        return None
    durations: list[int] = []
    for k in range(n_entries):
        count, delta = struct.unpack_from(">II", b, s + 8 + k * 8)
        if count > 1_000_000:  # corrupt-bounded: refuse absurd tables
            return None
        durations.extend([delta] * count)
    return durations


def _parse_stsz(b: bytes, s: int, e: int):
    if e - s < 12:
        return None
    sample_size, sample_count = struct.unpack_from(">II", b, s + 4)
    if sample_count > 1_000_000:
        return None
    if sample_size != 0:  # constant-size shortcut per spec
        return [sample_size] * sample_count
    if e - s < 12 + sample_count * 4:
        return None
    return list(struct.unpack_from(f">{sample_count}I", b, s + 12))


def _parse_stss(b: bytes, s: int, e: int):
    """Sync-sample numbers (1-based). Returns the set, or None on a
    malformed table. A MISSING stss box means every sample is sync —
    that case is handled by the caller, not here."""
    if e - s < 8:
        return None
    (n_entries,) = struct.unpack_from(">I", b, s + 4)
    if n_entries > 1_000_000 or e - s < 8 + n_entries * 4:
        return None
    return set(struct.unpack_from(f">{n_entries}I", b, s + 8))


def _parse_stsc(b: bytes, s: int, e: int):
    if e - s < 8:
        return None
    (n_entries,) = struct.unpack_from(">I", b, s + 4)
    if e - s < 8 + n_entries * 12:
        return None
    entries = []
    for k in range(n_entries):
        first_chunk, per_chunk, _sdi = struct.unpack_from(
            ">III", b, s + 8 + k * 12
        )
        entries.append((first_chunk, per_chunk))
    return entries


def _parse_stco(b: bytes, s: int, e: int, wide: bool):
    if e - s < 8:
        return None
    (n_entries,) = struct.unpack_from(">I", b, s + 4)
    width = 8 if wide else 4
    if n_entries > 1_000_000 or e - s < 8 + n_entries * width:
        return None
    fmt = f">{n_entries}Q" if wide else f">{n_entries}I"
    return list(struct.unpack_from(fmt, b, s + 8))


def _expand_chunks(stsc, stco, sizes):
    """The stsc chunk-run expansion: entry k's samples_per_chunk applies
    to chunks [first_chunk_k, first_chunk_{k+1}) (1-based), the last
    entry through the final stco chunk. Returns per-sample absolute
    offsets in decode order, or None on inconsistency."""
    n_chunks = len(stco)
    per_chunk = [0] * n_chunks
    for k, (first, count) in enumerate(stsc):
        last = stsc[k + 1][0] - 1 if k + 1 < len(stsc) else n_chunks
        if first < 1 or last > n_chunks or first > last + 1:
            return None
        for c in range(first - 1, last):
            per_chunk[c] = count
    offsets: list[int] = []
    sample = 0
    for c in range(n_chunks):
        pos = stco[c]
        for _ in range(per_chunk[c]):
            if sample >= len(sizes):
                return None
            offsets.append(pos)
            pos += sizes[sample]
            sample += 1
    if sample != len(sizes):
        return None
    return offsets


def parse_mp4(payload):
    """ISO-BMFF parse: VideoTrack (metadata + per-frame byte-range
    table) or None for corrupt/unsupported payloads."""
    try:
        b = bytes(payload)
    except (TypeError, ValueError):
        return None
    n = len(b)
    brand = None
    moov = None
    for btype, s, e in _iter_boxes(b, 0, n):
        if btype == b"ftyp" and e - s >= 4:
            brand = b[s : s + 4].decode("ascii", "replace")
        elif btype == b"moov":
            moov = (s, e)
    if brand is None or moov is None:
        return None
    mvhd = _find_box(b, *moov, b"mvhd")
    if mvhd is None:
        return None
    movie = _parse_mvhd(b, *mvhd)
    if movie is None:
        return None
    # real files carry several traks (commonly audio first): prefer the
    # track whose hdlr is 'vide', falling back to the first parseable one
    chosen = None  # (is_video, track, handler, mdia)
    for btype, ts, te in _iter_boxes(b, *moov):
        if btype != b"trak":
            continue
        tkhd = _find_box(b, ts, te, b"tkhd")
        mdia = _find_box(b, ts, te, b"mdia")
        if tkhd is None or mdia is None:
            continue
        track = _parse_tkhd(b, *tkhd)
        if track is None:
            continue
        hdlr = _find_box(b, *mdia, b"hdlr")
        handler = ""
        if hdlr is not None and hdlr[1] - hdlr[0] >= 12:
            handler = b[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
        is_video = handler == "vide"
        if chosen is None or (is_video and not chosen[0]):
            chosen = (is_video, track, handler, mdia)
        if is_video:
            break
    if chosen is None:
        return None
    _, track, handler, mdia = chosen
    minf = _find_box(b, *mdia, b"minf")
    if minf is None:
        return None
    stbl = _find_box(b, *minf, b"stbl")
    if stbl is None:
        return None
    stts = _find_box(b, *stbl, b"stts")
    stsz = _find_box(b, *stbl, b"stsz")
    stsc = _find_box(b, *stbl, b"stsc")
    stss = _find_box(b, *stbl, b"stss")
    stco = _find_box(b, *stbl, b"stco")
    wide = False
    if stco is None:
        stco = _find_box(b, *stbl, b"co64")
        wide = True
    if None in (stts, stsz, stsc, stco):
        return None
    durations = _parse_stts(b, *stts)
    sizes = _parse_stsz(b, *stsz)
    chunk_entries = _parse_stsc(b, *stsc)
    chunk_offsets = _parse_stco(b, *stco, wide)
    if None in (durations, sizes, chunk_entries, chunk_offsets):
        return None
    if len(durations) != len(sizes):
        return None
    offsets = _expand_chunks(chunk_entries, chunk_offsets, sizes)
    if offsets is None:
        return None
    if stss is None:
        sync = [True] * len(sizes)  # no stss box: every sample is sync
    else:
        sync_set = _parse_stss(b, *stss)
        if sync_set is None:
            return None
        sync = [(i + 1) in sync_set for i in range(len(sizes))]
    for off, size in zip(offsets, sizes):
        if off + size > n:
            return None  # sample table points outside the file
    timescale, duration = movie
    if timescale <= 0:
        return None  # corrupt mvhd: a zero/negative timescale would make
        # every duration-derived feature divide by zero downstream
    track_id, width, height = track
    return VideoTrack(
        brand=brand,
        timescale=timescale,
        duration=duration,
        track_id=track_id,
        width=width,
        height=height,
        handler=handler,
        durations=durations,
        offsets=offsets,
        sizes=sizes,
        sync=sync,
    )


def frame_bytes(payload: bytes, track: VideoTrack, idx: int) -> bytes:
    """One frame's payload via the sample-table byte range — the
    IO-proportional access path (no mdat scan)."""
    off, size = track.offsets[idx], track.sizes[idx]
    return bytes(payload[off : off + size])


# --------------------------------------------------------------- writer


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4(
    frames: list,
    frame_durations: list,
    timescale: int,
    width: int,
    height: int,
    track_id: int = 1,
    frames_per_chunk: int = 2,
    brand: bytes = b"isom",
    sync_every: int = 0,
) -> bytes:
    """Minimal ISO-BMFF writer: ftyp + mdat (frames packed in chunks of
    ``frames_per_chunk``) + moov with a full sample table. Chunking is
    real — stco holds one offset per chunk and stsc carries the
    (first_chunk, samples_per_chunk) runs, including the short final
    chunk — so the parser's chunk-run expansion is genuinely exercised.
    Forward-serialization only; shares no code with parse_mp4."""
    n = len(frames)
    if n != len(frame_durations) or n == 0:
        raise ValueError("frames and durations must align and be non-empty")
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    # chunk layout: offsets are absolute file positions inside mdat
    chunks: list[int] = []  # absolute offset per chunk
    base = len(ftyp) + 8  # mdat body starts after its 8-byte header
    pos = 0
    for i in range(0, n, frames_per_chunk):
        chunks.append(base + pos)
        pos += sum(len(f) for f in frames[i : i + frames_per_chunk])
    # stsc runs: all chunks carry frames_per_chunk except a short tail
    tail = n % frames_per_chunk
    stsc_entries = [(1, frames_per_chunk)]
    if tail and n > tail:
        stsc_entries.append((len(chunks), tail))
    elif tail:  # single short chunk
        stsc_entries = [(1, tail)]
    # stts runs: collapse equal consecutive durations
    stts_runs: list[tuple[int, int]] = []
    for dur in frame_durations:
        if stts_runs and stts_runs[-1][1] == dur:
            stts_runs[-1] = (stts_runs[-1][0] + 1, dur)
        else:
            stts_runs.append((1, dur))
    duration = sum(frame_durations)

    def full(btype: bytes, version_flags: int, body: bytes) -> bytes:
        return _box(btype, struct.pack(">I", version_flags) + body)

    mvhd = full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", track_id + 1),
    )
    tkhd = full(
        b"tkhd",
        7,  # enabled | in-movie | in-preview
        struct.pack(">IIIII", 0, 0, track_id, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = full(
        b"mdhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # 'und' language, pre_defined
    )
    hdlr = full(
        b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
    )
    vmhd = full(b"vmhd", 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = full(b"dref", 0, struct.pack(">I", 1) + full(b"url ", 1, b""))
    dinf = _box(b"dinf", dref)
    # one generic sample description entry (raw video stand-in)
    sample_entry = _box(
        b"raw ",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + sample_entry)
    stts = full(
        b"stts",
        0,
        struct.pack(">I", len(stts_runs))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_runs),
    )
    stsc = full(
        b"stsc",
        0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", fc, pc, 1) for fc, pc in stsc_entries),
    )
    stsz = full(
        b"stsz",
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = full(
        b"stco",
        0,
        struct.pack(">I", len(chunks))
        + b"".join(struct.pack(">I", c) for c in chunks),
    )
    stss = b""
    if sync_every > 0:  # omit the box entirely when every frame is sync
        sync_samples = list(range(1, n + 1, sync_every))
        stss = full(
            b"stss",
            0,
            struct.pack(">I", len(sync_samples))
            + b"".join(struct.pack(">I", sn) for sn in sync_samples),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stss + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
