"""MP4 (ISO BMFF) metadata demux — the box-arithmetic tier, pure stdlib.

VERDICT r10 task #2 (+ r11 task #7: multi-track + edit lists): real
pipelines hit MP4 video, and the *metadata* tier (codec id, track
timescale, frame count, per-frame byte offsets) is pure box arithmetic
over ftyp/moov/trak/mdia/stbl — the same honesty level as the parquet
footer dump in ``storage/etl.file_meta``. Frame *decode* stays behind
the documented H.264/H.265 NotImplementedError boundary (an
entropy-coded motion-compensated decoder is not a stdlib exercise);
everything a scheduler or sampler needs to plan frame reads (sample
table: stts/stsz/stsc/stco → absolute per-frame byte ranges, per track,
with elst media-time offsets applied to presentation timestamps) is
computed exactly, per ISO/IEC 14496-12.

Reference parity: the reference models video as opaque VARBINARY with
typed metadata (multimodal north star via the VECTOR type,
``pixels-core/.../TypeDescription.java:218``); this module supplies the
metadata extraction a 100 TB video corpus needs before any decode.

Scale notes: ``parse_mp4_meta`` touches only box headers + the moov
sample tables (KBs even for GB-scale files — mdat bytes are never
scanned), so on object storage the same walk runs off two ranged reads
(ftyp probe + moov). The per-sample expansion is O(n_samples) ints per
track; a 2-hour 30 fps track is ~216k samples ≈ a few MB of offsets,
bounded per file, computed inside the Arrow batch that carries the
payload. Every count field read from the payload is bounds-checked
against the payload size BEFORE any allocation sized by it (a flipped
32-bit sample count in a corrupt file must become an err row, not an
executor OOM), and every required box is guarded with a ValueError so
malformed files stay inside the DECODE_ERRORS containment contract.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_mp4_fixture",
    "parse_mp4_meta",
]


# ---------------------------------------------------------------------------
# box writers (fixture encoder)


def _box(typ: bytes, *bodies: bytes) -> bytes:
    body = b"".join(bodies)
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, flags: int, *bodies: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big"), *bodies)


def _frame_bytes(i: int, seed: int) -> bytes:
    """Deterministic pseudo-NAL payload with per-frame varying size."""
    size = 80 + 17 * ((i * i + 3 * seed) % 40)
    return bytes((i * 7 + j * 13 + seed) & 0xFF for j in range(size))


AUDIO_SAMPLE_SIZE = 64  # uniform stsz — exercises the uniform expansion


def _audio_bytes(i: int, seed: int) -> bytes:
    """Deterministic pseudo-AAC frame, uniform size (uniform-stsz path)."""
    return bytes((i * 11 + j * 5 + seed) & 0xFF for j in range(AUDIO_SAMPLE_SIZE))


def _chunk_layout(n: int, first: int, rest: int):
    """Chunk lengths: `first`, then `rest`, last chunk takes remainder."""
    out: list[int] = []
    left = n
    while left:
        take = first if not out else rest
        take = min(take, left)
        out.append(take)
        left -= take
    return out


def _stsc_box(chunk_lens) -> bytes:
    runs = [(1, chunk_lens[0])]
    for ci, cl in enumerate(chunk_lens[1:], start=2):
        if cl != runs[-1][1]:
            runs.append((ci, cl))
    return _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs)),
        b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )


def _stco_box(chunk_offsets) -> bytes:
    return _full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets)),
        b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )


def encode_mp4_fixture(
    n_frames: int = 8,
    width: int = 64,
    height: int = 48,
    fps: int = 25,
    timescale: int = 12800,
    codec: str = "avc1",
    seed: int = 0,
    audio_frames: int = 0,
    audio_timescale: int = 48000,
    audio_codec: str = "mp4a",
    elst_media_time: int | None = None,
    elst_empty_ms: int = 0,
) -> bytes:
    """Minimal spec-shaped MP4: ftyp + mdat + moov(mvhd, trak(tkhd,
    [edts(elst)], mdia(mdhd, hdlr, minf(vmhd, dinf,
    stbl(stsd/stts/stsz/stsc/stco))))[, audio trak]).

    Chunking is deliberately non-trivial — the video track's first chunk
    holds 3 samples, later chunks 2 (last possibly 1) — so the
    stsc→stco→stsz offset expansion in ``parse_mp4_meta`` is exercised
    on real chunk runs, not a 1-sample-per-chunk degenerate layout. mdat
    precedes moov (progressive-download layout) so stco offsets are
    absolute file offsets into already-laid-out data, as written by real
    muxers.

    ``audio_frames > 0`` adds a second trak (handler 'soun', 1024-tick
    AAC-style deltas, UNIFORM stsz — the expansion path real audio hits)
    whose samples follow the video frames in mdat, 4 samples per chunk.
    ``elst_media_time`` / ``elst_empty_ms`` add an edit list to the
    video trak: an optional empty edit (delay) followed by a normal edit
    starting at ``media_time`` track ticks — the two edit shapes real
    muxers emit (14496-12 §8.6.6).
    """
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    frames = [_frame_bytes(i, seed) for i in range(n_frames)]
    sizes = [len(f) for f in frames]
    chunk_lens = _chunk_layout(n_frames, 3, 2)

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isom", b"avc1")
    audio = [_audio_bytes(i, seed) for i in range(audio_frames)]
    mdat_body = b"".join(frames) + b"".join(audio)
    mdat = _box(b"mdat", mdat_body)
    data_at = len(ftyp) + 8  # absolute offset of first sample byte

    chunk_offsets, pos, si = [], data_at, 0
    for cl in chunk_lens:
        chunk_offsets.append(pos)
        pos += sum(sizes[si : si + cl])
        si += cl

    delta = timescale // fps
    track_dur = n_frames * delta
    movie_ts = 1000
    movie_dur = round(n_frames * movie_ts / fps)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_ts, movie_dur),
        struct.pack(">iHHII", 0x00010000, 0x0100, 0, 0, 0),  # rate/vol/rsvd
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        b"\x00" * 24,  # pre_defined
        struct.pack(">I", 3 if audio_frames else 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, movie_dur),
        b"\x00" * 8,
        struct.pack(">hhhH", 0, 0, 0, 0),  # layer/group/volume/rsvd
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, track_dur),
        struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0), b"vide", b"\x00" * 12, b"VideoHandler\x00",
    )
    # 86-byte VisualSampleEntry (14496-12 §12.1.3) — no codec config
    # child (avcC): the metadata tier stops at the sample-entry fourcc.
    entry = _box(
        codec.encode("ascii"),
        b"\x00" * 6,
        struct.pack(">H", 1),  # data_reference_index
        b"\x00" * 16,
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x00480000, 0x00480000),  # 72 dpi
        struct.pack(">I", 0),
        struct.pack(">H", 1),  # frame_count per sample
        b"\x00" * 32,  # compressorname
        struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_frames, delta))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n_frames),
        b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = _stsc_box(chunk_lens)
    stco = _stco_box(chunk_offsets)
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd, dinf, stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)

    trak_children = [tkhd]
    if elst_media_time is not None or elst_empty_ms:
        entries = []
        if elst_empty_ms:
            # empty edit: segment_duration in MOVIE timescale, media_time -1
            entries.append(
                struct.pack(
                    ">IiHH", elst_empty_ms * movie_ts // 1000, -1, 1, 0
                )
            )
        mt = elst_media_time if elst_media_time is not None else 0
        entries.append(struct.pack(">IiHH", movie_dur, mt, 1, 0))
        elst = _full(
            b"elst", 0, 0, struct.pack(">I", len(entries)), *entries
        )
        trak_children.append(_box(b"edts", elst))
    trak_children.append(mdia)
    trak = _box(b"trak", *trak_children)

    traks = [trak]
    if audio_frames:
        a_delta = 1024
        a_dur = audio_frames * a_delta
        a_data_at = data_at + sum(sizes)
        a_chunk_lens = _chunk_layout(audio_frames, 4, 4)
        a_offsets, pos, si = [], a_data_at, 0
        for cl in a_chunk_lens:
            a_offsets.append(pos)
            pos += cl * AUDIO_SAMPLE_SIZE
            si += cl
        a_tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIIII", 0, 0, 2, 0, movie_dur),
            b"\x00" * 8,
            struct.pack(">hhhH", 0, 0, 0x0100, 0),
            struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
            struct.pack(">II", 0, 0),
        )
        a_mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, audio_timescale, a_dur),
            struct.pack(">HH", 0x55C4, 0),
        )
        a_hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0), b"soun", b"\x00" * 12, b"SoundHandler\x00",
        )
        # 36-byte AudioSampleEntry (14496-12 §12.2.3) — no esds child
        a_entry = _box(
            audio_codec.encode("ascii"),
            b"\x00" * 6,
            struct.pack(">H", 1),  # data_reference_index
            b"\x00" * 8,
            struct.pack(">HHHH", 2, 16, 0, 0),  # channels/bits/pre/rsvd
            struct.pack(">I", audio_timescale << 16),  # samplerate 16.16
        )
        a_stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), a_entry)
        a_stts = _full(
            b"stts", 0, 0, struct.pack(">III", 1, audio_frames, a_delta)
        )
        # UNIFORM stsz: sample_size field set, no per-sample table
        a_stsz = _full(
            b"stsz", 0, 0,
            struct.pack(">II", AUDIO_SAMPLE_SIZE, audio_frames),
        )
        a_stbl = _box(
            b"stbl", a_stsd, a_stts, _stsc_box(a_chunk_lens), a_stsz,
            _stco_box(a_offsets),
        )
        smhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        a_minf = _box(b"minf", smhd, dinf, a_stbl)
        a_mdia = _box(b"mdia", a_mdhd, a_hdlr, a_minf)
        traks.append(_box(b"trak", a_tkhd, a_mdia))

    moov = _box(b"moov", mvhd, *traks)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# box walker (parser)


def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end);
    handles 64-bit largesize (size==1) and to-end boxes (size==0)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4 box largesize truncated")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {typ!r} overruns container")
        yield typ, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, typ: bytes):
    for t, b, e in _boxes(buf, start, end):
        if t == typ:
            return b, e
    return None


def _need(buf: bytes, start: int, end: int, typ: bytes, where: str):
    """_find, but a missing required box is a ValueError (containment:
    a malformed file must become an err row, never a TypeError that
    escapes DECODE_ERRORS and kills the Spark task — ADVICE r11)."""
    got = _find(buf, start, end, typ)
    if got is None:
        raise ValueError(f"MP4 {where} missing {typ.decode('ascii', 'replace')}")
    return got


def _fullbox(buf: bytes, body: int):
    """(version, flags, payload_start) of a full box body."""
    if body + 4 > len(buf):
        raise ValueError("MP4 full box truncated")
    return buf[body], int.from_bytes(buf[body + 1 : body + 4], "big"), body + 4


def _parse_elst(payload, tb, te, movie_ts, track_ts):
    """Edit-list presentation offset (14496-12 §8.6.6): leading empty
    edits (media_time == -1) delay presentation by their
    segment_duration (movie timescale); the first normal edit's
    media_time is where playback enters the media timeline, so it is
    subtracted from sample decode times. Returns the net offset in
    TRACK-timescale ticks (what gets added to each sample's stts time).
    """
    edts = _find(payload, tb, te, b"edts")
    if edts is None:
        return 0
    elst = _find(payload, *edts, b"elst")
    if elst is None:
        return 0
    ver, _fl, p = _fullbox(payload, elst[0])
    (n,) = struct.unpack_from(">I", payload, p)
    entry_sz = 20 if ver == 1 else 12
    if p + 4 + n * entry_sz > len(payload):
        raise ValueError("MP4 elst entry count exceeds payload")
    empty_delay = 0  # movie-timescale ticks
    media_time = 0
    q = p + 4
    for _ in range(n):
        if ver == 1:
            seg, mt = struct.unpack_from(">Qq", payload, q)
        else:
            seg, mt = struct.unpack_from(">Ii", payload, q)
        q += entry_sz
        if mt == -1:
            empty_delay += seg
        else:
            media_time = mt
            break  # ranged reads only need the entry playback starts in
    delay_ticks = (empty_delay * track_ts) // movie_ts if movie_ts else 0
    return delay_ticks - media_time


def _parse_track(payload: bytes, tb: int, te: int, movie_ts: int) -> dict:
    """One trak's metadata + exact per-sample byte ranges + timestamps."""
    t: dict = {}
    tkhd = _find(payload, tb, te, b"tkhd")
    if tkhd is not None:
        _v, _fl, p = _fullbox(payload, tkhd[0])
        t["track_id"] = struct.unpack_from(">I", payload, p + 8)[0]
        # width/height are the trailing 16.16 fixed-point 8 bytes
        w16, h16 = struct.unpack_from(">II", payload, tkhd[1] - 8)
        t["track_width"], t["track_height"] = w16 >> 16, h16 >> 16

    mdia = _need(payload, tb, te, b"mdia", "trak")
    hdlr = _find(payload, *mdia, b"hdlr")
    t["handler"] = (
        payload[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
        if hdlr
        else ""
    )

    mdhd = _need(payload, *mdia, b"mdhd", "trak")
    ver, _fl, p = _fullbox(payload, mdhd[0])
    if ver == 1:
        timescale = struct.unpack_from(">I", payload, p + 16)[0]
        track_dur = struct.unpack_from(">Q", payload, p + 20)[0]
    else:
        timescale = struct.unpack_from(">I", payload, p + 8)[0]
        track_dur = struct.unpack_from(">I", payload, p + 12)[0]
    t["timescale"] = timescale
    t["duration_s"] = (track_dur / timescale) if timescale else 0.0

    minf = _need(payload, *mdia, b"minf", "trak")
    stbl = _need(payload, *minf, b"stbl", "trak")

    # stsd → codec fourcc (+ visual dims at VisualSampleEntry offsets)
    stsd = _need(payload, *stbl, b"stsd", "stbl")
    _v, _fl, p = _fullbox(payload, stsd[0])
    (n_entries,) = struct.unpack_from(">I", payload, p)
    if n_entries < 1:
        raise ValueError("MP4 stsd has no sample entries")
    t["codec"] = payload[p + 8 : p + 12].decode("ascii", "replace")
    if t["handler"] == "vide":
        t["width"], t["height"] = struct.unpack_from(
            ">HH", payload, p + 4 + 32
        )

    # stts → per-sample decode deltas (count fields bounds-checked
    # against the payload BEFORE any count-sized allocation)
    stts = _need(payload, *stbl, b"stts", "stbl")
    _v, _fl, p = _fullbox(payload, stts[0])
    (n_runs,) = struct.unpack_from(">I", payload, p)
    if p + 4 + 8 * n_runs > len(payload):
        raise ValueError("MP4 stts run count exceeds payload")
    stts_runs = [
        struct.unpack_from(">II", payload, p + 4 + 8 * i) for i in range(n_runs)
    ]
    stts_samples = sum(cnt for cnt, _ in stts_runs)

    # stsz → per-sample sizes
    stsz = _need(payload, *stbl, b"stsz", "stbl")
    _v, _fl, p = _fullbox(payload, stsz[0])
    uniform, n_samples = struct.unpack_from(">II", payload, p)
    if uniform:
        # a corruption-flipped 32-bit count must not drive a huge
        # allocation: uniform-sized samples can't total more than the
        # file that holds them (ADVICE r11: OOM containment)
        if n_samples * uniform > len(payload):
            raise ValueError(
                f"MP4 uniform stsz claims {n_samples}x{uniform} bytes "
                f"> payload ({len(payload)})"
            )
        sizes = [uniform] * n_samples
    else:
        if p + 8 + 4 * n_samples > len(payload):
            raise ValueError("MP4 stsz sample count exceeds payload")
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, p + 8))
    if stts_samples != n_samples:
        raise ValueError(
            f"MP4 stts/stsz sample counts disagree: {stts_samples} vs {n_samples}"
        )
    t["n_frames"] = n_samples

    # decode times from stts, presentation offset from elst
    pts_off = _parse_elst(payload, tb, te, movie_ts, timescale)
    times: list[int] = []
    at = 0
    for cnt, dlt in stts_runs:
        for _ in range(cnt):
            times.append(at + pts_off)
            at += dlt
    t["sample_times"] = times  # track-timescale ticks, elst-adjusted
    t["pts_offset"] = pts_off
    t["first_pts_s"] = (times[0] / timescale) if times and timescale else 0.0

    # stsc runs + stco/co64 chunk offsets → absolute per-sample offsets
    stsc = _need(payload, *stbl, b"stsc", "stbl")
    _v, _fl, p = _fullbox(payload, stsc[0])
    (n_runs,) = struct.unpack_from(">I", payload, p)
    if p + 4 + 12 * n_runs > len(payload):
        raise ValueError("MP4 stsc run count exceeds payload")
    runs = [
        struct.unpack_from(">III", payload, p + 4 + 12 * i)[:2]
        for i in range(n_runs)
    ]
    stco = _find(payload, *stbl, b"stco")
    if stco is not None:
        _v, _fl, p = _fullbox(payload, stco[0])
        (n_chunks,) = struct.unpack_from(">I", payload, p)
        if p + 4 + 4 * n_chunks > len(payload):
            raise ValueError("MP4 stco chunk count exceeds payload")
        offs = list(struct.unpack_from(f">{n_chunks}I", payload, p + 4))
    else:
        co64 = _need(payload, *stbl, b"co64", "stbl")
        _v, _fl, p = _fullbox(payload, co64[0])
        (n_chunks,) = struct.unpack_from(">I", payload, p)
        if p + 4 + 8 * n_chunks > len(payload):
            raise ValueError("MP4 co64 chunk count exceeds payload")
        offs = list(struct.unpack_from(f">{n_chunks}Q", payload, p + 4))
    t["n_chunks"] = n_chunks

    # §8.7.4 expansion: each stsc run applies from first_chunk until the
    # next run's first_chunk (1-based); samples are contiguous in-chunk.
    sample_offsets: list[int] = []
    si = 0
    for ri, (first_chunk, spc) in enumerate(runs):
        last_chunk = (
            runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        )
        for ci in range(first_chunk, last_chunk + 1):
            if ci > n_chunks:
                raise ValueError("MP4 stsc refers past stco chunk count")
            at = offs[ci - 1]
            for _ in range(spc):
                if si >= n_samples:
                    break
                sample_offsets.append(at)
                at += sizes[si]
                si += 1
    if si != n_samples:
        raise ValueError(
            f"MP4 stsc expansion covers {si} of {n_samples} samples"
        )
    for off, sz in zip(sample_offsets, sizes):
        if off + sz > len(payload):
            raise ValueError("MP4 sample range exceeds payload")
    t["sample_sizes"] = sizes
    t["sample_offsets"] = sample_offsets
    return t


def parse_mp4_meta(payload: bytes) -> dict:
    """Demux MP4 metadata without decoding a single frame.

    Walks EVERY trak (r11 task #7): ``meta["tracks"]`` holds one dict
    per track — handler, codec fourcc, timescale, frame count, duration,
    dims (video), chunk count, exact per-sample absolute byte ranges
    (``sample_offsets`` + ``sample_sizes`` from the stsc/stco/stsz
    expansion, ISO/IEC 14496-12 §8.7.4) and per-sample presentation
    timestamps (``sample_times``, stts decode times shifted by the elst
    edit-list media-time offset per §8.6.6) — i.e. everything needed to
    schedule ranged frame reads for video AND audio. Top-level keys
    mirror the primary (first 'vide', else first) track for
    back-compatibility with ``multimodal.decode_video``. Raises
    ValueError on malformed boxes and NotImplementedError for non-MP4
    bytes — both inside DECODE_ERRORS, so the Spark seam yields err
    rows, never task failures.
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO BMFF (MP4) payload")
    n = len(payload)
    ftyp = _find(payload, 0, n, b"ftyp")
    brand = payload[ftyp[0] : ftyp[0] + 4].decode("ascii", "replace")
    moov = _need(payload, 0, n, b"moov", "file")

    meta: dict = {"brand": brand}
    mvhd = _need(payload, *moov, b"mvhd", "moov")
    ver, _fl, p = _fullbox(payload, mvhd[0])
    if ver == 1:
        movie_ts = struct.unpack_from(">I", payload, p + 16)[0]
        movie_dur = struct.unpack_from(">Q", payload, p + 20)[0]
    else:
        movie_ts = struct.unpack_from(">I", payload, p + 8)[0]
        movie_dur = struct.unpack_from(">I", payload, p + 12)[0]
    meta["movie_timescale"] = movie_ts
    meta["movie_duration"] = movie_dur

    tracks = [
        _parse_track(payload, b, e, movie_ts)
        for t, b, e in _boxes(payload, *moov)
        if t == b"trak"
    ]
    if not tracks:
        raise ValueError("MP4 moov has no trak")
    meta["tracks"] = tracks
    meta["n_tracks"] = len(tracks)

    primary = next((t for t in tracks if t["handler"] == "vide"), tracks[0])
    for k in (
        "handler", "codec", "timescale", "duration_s", "n_frames",
        "n_chunks", "sample_sizes", "sample_offsets", "sample_times",
        "first_pts_s",
    ):
        meta[k] = primary[k]
    for k in ("width", "height", "track_width", "track_height"):
        if k in primary:
            meta[k] = primary[k]
    return meta


def read_frame(payload: bytes, meta: dict, i: int) -> bytes:
    """The ranged read the sample table plans: frame i's exact bytes."""
    off, sz = meta["sample_offsets"][i], meta["sample_sizes"][i]
    return payload[off : off + sz]


# ---------------------------------------------------------------------------
# Spark seam


def synthetic_mp4_media(spark, n: int = 12):
    """Deterministic MP4 MEDIA_SCHEMA fixture: n files with rotating
    frame counts / fps / dimensions / codec fourccs; every i%4==1 row
    carries a second (audio, uniform-stsz) track, row 5 an elst
    media-time edit, row 9 an elst empty-edit delay, and the last TWO
    rows are malformed (a mid-moov truncation; an stts renamed to free)
    so both err-channel shapes are pinned in the golden oracle."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        payload = encode_mp4_fixture(
            n_frames=3 + (i % 5),
            width=32 + 16 * (i % 3),
            height=24 + 8 * (i % 4),
            fps=(24, 25, 30)[i % 3],
            timescale=(12800, 90000, 15360)[i % 3],
            codec=("avc1", "hev1", "av01")[i % 3],
            seed=i,
            audio_frames=(4 + i % 3) if i % 4 == 1 else 0,
            elst_media_time=(12800 // 25) if i == 5 else None,
            elst_empty_ms=200 if i == 9 else 0,
        )
        if i == n - 1:
            payload = payload[: len(payload) // 2]  # mid-moov cut
        elif i == n - 2:
            # required-box-missing shape (ADVICE r11): rename stts→free
            payload = payload.replace(b"stts", b"free", 1)
        rows.append((i, "video", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def mp4_meta(media) -> "object":
    """Arrow-batched MP4 metadata demux over a MEDIA_SCHEMA DataFrame:
    one row per file with codec / timescale / frame count / duration /
    dims / chunk layout, the first+last sample byte ranges, track count,
    the elst-adjusted first presentation timestamp, and the audio
    track's codec/timescale/frame count when present (the full per-frame
    table stays executor-side — at 100 TB you persist it as an index,
    not return it to the driver). Malformed payloads become err rows,
    never task failures."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pixels_spark.functions.multimodal import DECODE_ERRORS

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("brand", StringType()),
            StructField("codec", StringType()),
            StructField("handler", StringType()),
            StructField("timescale", LongType()),
            StructField("n_frames", LongType()),
            StructField("duration_s", DoubleType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("n_chunks", LongType()),
            StructField("first_frame_off", LongType()),
            StructField("last_frame_end", LongType()),
            StructField("frame_bytes", LongType()),
            StructField("n_tracks", LongType()),
            StructField("first_pts_s", DoubleType()),
            StructField("audio_codec", StringType()),
            StructField("audio_timescale", LongType()),
            StructField("audio_n_frames", LongType()),
            StructField("err", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(cols)
                row["media_id"] = mid
                try:
                    m = parse_mp4_meta(bytes(payload))
                    aud = next(
                        (
                            t
                            for t in m["tracks"]
                            if t["handler"] == "soun"
                        ),
                        None,
                    )
                    row.update(
                        brand=m["brand"],
                        codec=m["codec"],
                        handler=m["handler"],
                        timescale=m["timescale"],
                        n_frames=m["n_frames"],
                        duration_s=m["duration_s"],
                        width=m.get("width"),
                        height=m.get("height"),
                        n_chunks=m["n_chunks"],
                        first_frame_off=m["sample_offsets"][0],
                        last_frame_end=m["sample_offsets"][-1]
                        + m["sample_sizes"][-1],
                        frame_bytes=sum(m["sample_sizes"]),
                        n_tracks=m["n_tracks"],
                        first_pts_s=m["first_pts_s"],
                        audio_codec=aud["codec"] if aud else None,
                        audio_timescale=aud["timescale"] if aud else None,
                        audio_n_frames=aud["n_frames"] if aud else None,
                    )
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
