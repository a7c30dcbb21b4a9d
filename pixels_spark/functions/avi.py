"""AVI (RIFF) metadata demux — chunk walk, pure stdlib.

The third video-container tier next to MP4 (``functions/mp4.py``) and
the PVID fixture: AVI metadata is pure RIFF chunk arithmetic — the
``hdrl`` LIST carries the main header (frame count, dims, frame
period) and one ``strl`` LIST per stream (fourcc handler, scale/rate
timing, stream format), and the ``movi`` LIST's ``##dc``/``##db``/
``##wb`` chunks give exact per-frame byte ranges without decoding a
single frame — everything a 100 TB video-corpus scheduler needs to
plan ranged reads. Frame *decode* (the codec inside the ``##dc``
chunks) stays behind the documented NotImplementedError boundary in
``multimodal.decode_video``, the same contract as H.264/MP3 granules.

Handles: avih main header, per-stream strh (vids/auds) with dwScale/
dwRate timing, strf BITMAPINFOHEADER (video dims/codec) and
WAVEFORMATEX (audio tag/channels/rate), movi chunk walk with WORD
padding, idx1 cross-check (entry count vs walked chunks). Every size
and count is bounds-checked before use (the MP4 containment rule:
corrupt bytes become err rows, never task failures or OOMs).

Format follows the public AVI RIFF specification (Microsoft Video for
Windows, documented in the MSDN AVI RIFF File Reference); no reference
code used — the reference engine (pixelsdb/pixels) has no video path,
this extends the multimodal north star (VECTOR type,
``pixels-core/.../TypeDescription.java:218``).

Scale: the walk reads 8 bytes per chunk plus fixed headers — O(n_chunks)
ints inside the Arrow batch that carries the payload; the per-frame
offset table stays executor-side (the mp4_meta convention).
"""

from __future__ import annotations

import struct

__all__ = ["encode_avi_fixture", "parse_avi_meta"]


def _u32(b: bytes, at: int) -> int:
    if at + 4 > len(b):
        raise ValueError("AVI chunk overruns payload")
    return struct.unpack_from("<I", b, at)[0]


def _walk_chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for chunks in [pos, end);
    LIST chunks yield ('LIST:<type>', start_after_type, size-4)."""
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = _u32(payload, pos + 4)
        body = pos + 8
        if body + size > len(payload):
            raise ValueError(
                f"AVI chunk {fourcc!r} size {size} overruns payload"
            )
        if fourcc == b"LIST":
            if size < 4:
                raise ValueError("AVI LIST chunk shorter than its type tag")
            ltype = payload[body : body + 4]
            yield (b"LIST:" + ltype, body + 4, size - 4)
        else:
            yield (fourcc, body, size)
        pos = body + size + (size & 1)  # WORD padding


def parse_avi_meta(payload: bytes) -> dict:
    """AVI metadata + exact frame byte ranges from the RIFF walk.

    Returns main-header fields, per-stream video/audio metadata, the
    movi chunk accounting with first/last video-frame byte ranges and
    total video-frame bytes, and the idx1 entry count when present.
    Raises ValueError on any malformed structure — all contained by
    ``multimodal.DECODE_ERRORS``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")
    riff_size = _u32(payload, 4)
    end = min(8 + riff_size, len(payload))

    avih = None
    streams: list[dict] = []
    movi: tuple[int, int] | None = None
    idx1_entries = None

    for fourcc, body, size in _walk_chunks(payload, 12, end):
        if fourcc == b"LIST:hdrl":
            for f2, b2, s2 in _walk_chunks(payload, body, body + size):
                if f2 == b"avih":
                    if s2 < 40:
                        raise ValueError("AVI avih header too short")
                    (
                        us_per_frame,
                        _maxbps,
                        _pad,
                        _flags,
                        total_frames,
                        _init,
                        n_streams,
                        _bufsz,
                        width,
                        height,
                    ) = struct.unpack_from("<10I", payload, b2)
                    avih = {
                        "us_per_frame": us_per_frame,
                        "total_frames": total_frames,
                        "n_streams": n_streams,
                        "width": width,
                        "height": height,
                    }
                elif f2 == b"LIST:strl":
                    strm: dict = {}
                    for f3, b3, s3 in _walk_chunks(payload, b2, b2 + s2):
                        if f3 == b"strh":
                            if s3 < 40:
                                raise ValueError("AVI strh header too short")
                            strm["type"] = payload[b3 : b3 + 4].decode(
                                "ascii", "replace"
                            )
                            strm["handler"] = (
                                payload[b3 + 4 : b3 + 8]
                                .decode("ascii", "replace")
                                .strip("\x00 ")
                            )
                            scale = _u32(payload, b3 + 20)
                            rate = _u32(payload, b3 + 24)
                            strm["scale"] = scale
                            strm["rate"] = rate
                            strm["length"] = _u32(payload, b3 + 32)
                        elif f3 == b"strf" and strm.get("type") == "vids":
                            if s3 < 16:
                                raise ValueError("AVI video strf too short")
                            strm["width"] = _u32(payload, b3 + 4)
                            strm["height"] = _u32(payload, b3 + 8)
                            strm["codec"] = (
                                payload[b3 + 16 : b3 + 20]
                                .decode("ascii", "replace")
                                .strip("\x00 ")
                                if s3 >= 20
                                else ""
                            )
                        elif f3 == b"strf" and strm.get("type") == "auds":
                            if s3 < 16:
                                raise ValueError("AVI audio strf too short")
                            tag, ch = struct.unpack_from("<HH", payload, b3)
                            strm["audio_tag"] = tag
                            strm["channels"] = ch
                            strm["sample_rate"] = _u32(payload, b3 + 4)
                    if strm:
                        streams.append(strm)
        elif fourcc == b"LIST:movi":
            movi = (body, size)
        elif fourcc == b"idx1":
            if size % 16:
                raise ValueError("AVI idx1 size not a multiple of 16")
            idx1_entries = size // 16

    if avih is None:
        raise ValueError("AVI missing avih main header")
    if not streams:
        raise ValueError("AVI missing stream lists")
    if movi is None:
        raise ValueError("AVI missing movi list")

    # movi walk: exact byte ranges per chunk, video frames = '##dc'/'##db'
    frame_ranges: list[tuple[int, int]] = []
    n_chunks = 0
    for f4, b4, s4 in _walk_chunks(payload, movi[0], movi[0] + movi[1]):
        n_chunks += 1
        if f4[2:4] in (b"dc", b"db"):
            frame_ranges.append((b4, s4))
    if idx1_entries is not None and idx1_entries != n_chunks:
        raise ValueError(
            f"AVI idx1 count {idx1_entries} != movi chunks {n_chunks}"
        )
    vids = next((s for s in streams if s.get("type") == "vids"), None)
    auds = next((s for s in streams if s.get("type") == "auds"), None)
    if vids is None:
        raise ValueError("AVI has no video stream")
    if len(frame_ranges) != avih["total_frames"]:
        raise ValueError(
            f"AVI movi has {len(frame_ranges)} video frames, avih claims "
            f"{avih['total_frames']}"
        )
    fps = (
        vids["rate"] / vids["scale"]
        if vids.get("scale")
        else (1e6 / avih["us_per_frame"] if avih["us_per_frame"] else 0.0)
    )
    return {
        "width": avih["width"],
        "height": avih["height"],
        "n_streams": avih["n_streams"],
        "n_frames": avih["total_frames"],
        "fps": fps,
        "duration_s": (avih["total_frames"] / fps) if fps else 0.0,
        "video_codec": vids.get("codec", ""),
        "handler": vids.get("handler", ""),
        "audio_tag": auds.get("audio_tag") if auds else None,
        "audio_channels": auds.get("channels") if auds else None,
        "audio_rate": auds.get("sample_rate") if auds else None,
        "audio_samples": auds.get("length") if auds else None,
        "n_chunks": n_chunks,
        "idx1_entries": idx1_entries,
        "first_frame_off": frame_ranges[0][0] if frame_ranges else None,
        "last_frame_end": (
            frame_ranges[-1][0] + frame_ranges[-1][1] if frame_ranges else None
        ),
        "frame_bytes": sum(s for _, s in frame_ranges),
        "frame_ranges": frame_ranges,
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_fixture(
    width: int = 32,
    height: int = 24,
    n_frames: int = 5,
    fps: int = 25,
    codec: bytes = b"MJPG",
    with_audio: bool = False,
    audio_rate: int = 8000,
    with_idx1: bool = True,
    seed: int = 0,
) -> bytes:
    """Deterministic AVI payload: avih + vids strl (+ optional auds
    strl), movi with per-frame ``00dc`` chunks of varying sizes (and
    interleaved ``01wb`` audio chunks), optional idx1 index."""
    frame_sizes = [64 + 16 * ((seed + i) % 5) for i in range(n_frames)]
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # us per frame
        0, 0, 0x10,        # maxbps, padding, flags (HASINDEX)
        n_frames, 0,
        2 if with_audio else 1,
        0, width, height, 0, 0, 0, 0,
    )
    strh_v = (
        b"vids" + codec
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n_frames,
                      0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf_v = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, codec,
        width * height * 3, 0, 0, 0, 0,
    )
    strl_v = _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
    strls = strl_v
    if with_audio:
        strh_a = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, audio_rate, 0,
                          audio_rate, 0, 0, 2)
            + struct.pack("<4H", 0, 0, 0, 0)
        )
        strf_a = struct.pack("<HHIIHH", 1, 1, audio_rate, audio_rate * 2, 2, 16)
        strls += _list(
            b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)
        )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)

    movi_body = b""
    idx_entries = []
    off = 4  # idx1 offsets are relative to the 'movi' type tag
    for i, fs in enumerate(frame_sizes):
        frame = bytes(((seed + i + j) % 251) for j in range(fs))
        movi_body += _chunk(b"00dc", frame)
        idx_entries.append((b"00dc", 0x10, off, fs))
        off += 8 + fs + (fs & 1)
        if with_audio:
            ab = bytes(((seed + i * 7 + j) % 253) for j in range(32))
            movi_body += _chunk(b"01wb", ab)
            idx_entries.append((b"01wb", 0x10, off, 32))
            off += 8 + 32
    movi = _list(b"movi", movi_body)
    idx1 = b""
    if with_idx1:
        idx1 = _chunk(
            b"idx1",
            b"".join(
                ck + struct.pack("<III", fl, o, sz)
                for ck, fl, o, sz in idx_entries
            ),
        )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Spark seam (mp4_meta convention)
# ---------------------------------------------------------------------------

def synthetic_avi_media(spark, n: int = 12):
    """Deterministic AVI MEDIA_SCHEMA fixture rotating dims / fps /
    frame counts / codecs, with audio-track and no-idx1 rows, ending
    with a truncated row and an idx1-vs-movi mismatch row so both err
    shapes pin in the golden oracle."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        payload = encode_avi_fixture(
            width=16 + 8 * (i % 4),
            height=12 + 6 * (i % 3),
            n_frames=3 + (i % 5),
            fps=(25, 30, 15)[i % 3],
            codec=(b"MJPG", b"DIB ", b"I420")[i % 3],
            with_audio=(i % 2 == 1),
            audio_rate=8000 * (1 + i % 3),
            with_idx1=(i % 4 != 3),
            seed=i,
        )
        if i == n - 1:
            payload = payload[: len(payload) - 11]  # truncated mid-chunk
        elif i == n - 2:
            b = bytearray(payload)
            at = payload.index(b"avih") + 8 + 16  # dwTotalFrames field
            b[at] ^= 0x01  # claim one frame more/less than movi holds
            payload = bytes(b)
        rows.append((i, "video", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def avi_meta(media) -> "object":
    """Arrow-batched AVI RIFF walk over a MEDIA_SCHEMA DataFrame: one
    row per file with container/stream metadata, chunk accounting and
    the first/last exact frame byte ranges (full per-frame table stays
    executor-side). Malformed payloads become err rows."""
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
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("n_streams", LongType()),
            StructField("n_frames", LongType()),
            StructField("fps", DoubleType()),
            StructField("duration_s", DoubleType()),
            StructField("video_codec", StringType()),
            StructField("audio_tag", LongType()),
            StructField("audio_channels", LongType()),
            StructField("audio_rate", LongType()),
            StructField("n_chunks", LongType()),
            StructField("idx1_entries", LongType()),
            StructField("first_frame_off", LongType()),
            StructField("last_frame_end", LongType()),
            StructField("frame_bytes", LongType()),
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
                    m = parse_avi_meta(bytes(payload))
                    for k in cols:
                        if k in ("media_id", "err"):
                            continue
                        row[k] = m.get(k)
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
