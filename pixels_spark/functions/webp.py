"""WEBP metadata demux — RIFF chunk walk + bitstream headers, pure
stdlib.

Completes the mainstream-image-container set (PNG/JPEG/GIF/BMP/TIFF
decode fully; WEBP joins the metadata tier): dimensions and feature
flags live in fixed-layout headers —

- ``VP8 `` (lossy): 3-byte frame tag + the 0x9D 0x01 0x2A keyframe
  start code, then 14-bit width/height with 2-bit upscale factors;
- ``VP8L`` (lossless): 0x2F signature then 14-bit width-1/height-1,
  alpha bit and version from an LSB-first 32-bit field;
- ``VP8X`` (extended): feature flags (ICC/alpha/EXIF/XMP/animation)
  and the 24-bit canvas dimensions, with ANMF sub-chunks counted for
  animations (frame dims + durations accumulated).

VP8/VP8L *pixel* decode (boolean arithmetic coder / prefix-coded
transforms) stays behind the documented NotImplementedError boundary,
the H.264 contract. Containment: corrupt bytes become err rows —
sizes are bounds-checked, short payloads raise ValueError.

Format follows the public WebP container and bitstream specifications
(RFC 9649 / Google's WebP docs); no reference code used — extends the
multimodal north star (VECTOR type,
``pixels-core/.../TypeDescription.java:218``).
"""

from __future__ import annotations

import struct

__all__ = ["encode_webp_fixture", "parse_webp_meta"]


def _chunks(payload: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > len(payload):
            raise ValueError(f"WEBP chunk {fourcc!r} overruns payload")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def _vp8_dims(payload: bytes, at: int, size: int) -> tuple[int, int]:
    if size < 10:
        raise ValueError("WEBP VP8 chunk too short for a frame header")
    if payload[at + 3 : at + 6] != b"\x9d\x01\x2a":
        raise ValueError("WEBP VP8 keyframe start code missing")
    w_raw, h_raw = struct.unpack_from("<HH", payload, at + 6)
    return w_raw & 0x3FFF, h_raw & 0x3FFF


def _vp8l_dims(payload: bytes, at: int, size: int) -> tuple[int, int, bool]:
    if size < 5:
        raise ValueError("WEBP VP8L chunk too short")
    if payload[at] != 0x2F:
        raise ValueError("WEBP VP8L signature byte missing")
    bits = struct.unpack_from("<I", payload, at + 1)[0]
    width = (bits & 0x3FFF) + 1
    height = ((bits >> 14) & 0x3FFF) + 1
    alpha = bool((bits >> 28) & 1)
    return width, height, alpha


def parse_webp_meta(payload: bytes) -> dict:
    """WEBP RIFF walk: format variant, canvas dims, feature flags,
    animation frame accounting. Raises ValueError on malformed
    structure (contained by ``multimodal.DECODE_ERRORS``)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP payload (missing RIFF/WEBP magic)")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    end = min(8 + riff_size, len(payload))

    fmt = None
    width = height = None
    has_alpha = False
    has_animation = False
    has_icc = has_exif = has_xmp = False
    n_frames = 0
    duration_ms = 0
    n_chunks = 0

    for fourcc, body, size in _chunks(payload, 12, end):
        n_chunks += 1
        if fourcc == b"VP8 " and fmt is None:
            fmt = "lossy"
            width, height = _vp8_dims(payload, body, size)
            n_frames = 1
        elif fourcc == b"VP8L" and fmt is None:
            fmt = "lossless"
            width, height, has_alpha = _vp8l_dims(payload, body, size)
            n_frames = 1
        elif fourcc in (b"VP8 ", b"VP8L") and fmt == "extended":
            # the still-image payload chunk of a non-animated VP8X file
            # (animated files carry their frames inside ANMF instead)
            if fourcc == b"VP8 ":
                _vp8_dims(payload, body, size)  # validate the start code
            n_frames += 1
        elif fourcc == b"VP8X":
            fmt = "extended"
            if size < 10:
                raise ValueError("WEBP VP8X chunk too short")
            flags = payload[body]
            has_icc = bool(flags & 0x20)
            has_alpha = has_alpha or bool(flags & 0x10)
            has_exif = bool(flags & 0x08)
            has_xmp = bool(flags & 0x04)
            has_animation = bool(flags & 0x02)
            width = (
                int.from_bytes(payload[body + 4 : body + 7], "little") + 1
            )
            height = (
                int.from_bytes(payload[body + 7 : body + 10], "little") + 1
            )
        elif fourcc == b"ANMF":
            if size < 16:
                raise ValueError("WEBP ANMF chunk too short")
            n_frames += 1
            duration_ms += (
                int.from_bytes(payload[body + 12 : body + 15], "little")
            )
        elif fourcc == b"ALPH":
            has_alpha = True

    if fmt is None:
        raise ValueError("WEBP has no VP8 /VP8L/VP8X image chunk")
    if width is None or height is None:
        raise ValueError("WEBP dimensions not recoverable")
    return {
        "variant": fmt,
        "width": width,
        "height": height,
        "has_alpha": has_alpha,
        "has_animation": has_animation,
        "has_icc": has_icc,
        "has_exif": has_exif,
        "has_xmp": has_xmp,
        "n_frames": n_frames,
        "duration_s": duration_ms / 1000.0,
        "n_chunks": n_chunks,
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def encode_webp_fixture(
    width: int = 32,
    height: int = 24,
    variant: str = "lossy",
    n_frames: int = 1,
    frame_ms: int = 40,
    with_alpha: bool = False,
    with_exif: bool = False,
    seed: int = 0,
) -> bytes:
    """Deterministic WEBP payload: lossy (VP8), lossless (VP8L) or
    extended (VP8X, optionally animated with ANMF frames / EXIF)."""
    filler = bytes(((seed + i) % 251) for i in range(24))
    if variant == "lossy":
        vp8 = bytes(3) + b"\x9d\x01\x2a" + struct.pack(
            "<HH", width, height
        ) + filler
        body = _chunk(b"VP8 ", vp8)
    elif variant == "lossless":
        bits = (width - 1) | ((height - 1) << 14)
        if with_alpha:
            bits |= 1 << 28
        vp8l = b"\x2f" + struct.pack("<I", bits) + filler
        body = _chunk(b"VP8L", vp8l)
    else:  # extended
        flags = 0x02 if n_frames > 1 else 0
        if with_alpha:
            flags |= 0x10
        if with_exif:
            flags |= 0x08
        vp8x = bytes([flags, 0, 0, 0])
        vp8x += (width - 1).to_bytes(3, "little")
        vp8x += (height - 1).to_bytes(3, "little")
        body = _chunk(b"VP8X", vp8x)
        if n_frames > 1:
            body += _chunk(b"ANIM", struct.pack("<IH", 0xFFFFFFFF, 0))
            for f in range(n_frames):
                anmf = bytes(12) + frame_ms.to_bytes(3, "little") + b"\x00"
                vp8 = bytes(3) + b"\x9d\x01\x2a" + struct.pack(
                    "<HH", width, height
                ) + filler
                anmf += _chunk(b"VP8 ", vp8)
                body += _chunk(b"ANMF", anmf)
        else:
            vp8 = bytes(3) + b"\x9d\x01\x2a" + struct.pack(
                "<HH", width, height
            ) + filler
            body += _chunk(b"VP8 ", vp8)
        if with_exif:
            body += _chunk(b"EXIF", b"Exif\x00\x00" + filler[:8])
    riff_body = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------

def synthetic_webp_media(spark, n: int = 12):
    """Deterministic WEBP MEDIA_SCHEMA fixture rotating lossy/lossless/
    extended (incl. animated + EXIF + alpha rows), ending with a
    missing-start-code row and a truncated row so the err channel
    pins."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        variant = ("lossy", "lossless", "extended")[i % 3]
        payload = encode_webp_fixture(
            width=16 + 8 * (i % 4),
            height=12 + 6 * (i % 3),
            variant=variant,
            n_frames=1 + (i % 4 if variant == "extended" else 0),
            frame_ms=30 + 10 * (i % 3),
            with_alpha=(i % 4 == 1),
            with_exif=(i % 5 == 2 and variant == "extended"),
            seed=i,
        )
        if i == n - 1:
            payload = payload[: len(payload) - 9]  # truncated
        elif i == n - 2:
            b = bytearray(payload)
            if b"\x9d\x01\x2a" in payload:
                at = payload.index(b"\x9d\x01\x2a")
                b[at] ^= 0xFF  # break the keyframe start code
            else:  # lossless row: break the VP8L signature byte
                at = payload.index(b"VP8L") + 8
                b[at] ^= 0xFF
            payload = bytes(b)
        rows.append((i, "image", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def webp_meta(media) -> "object":
    """Arrow-batched WEBP RIFF walk over a MEDIA_SCHEMA DataFrame;
    malformed payloads become err rows."""
    from pyspark.sql.types import (
        BooleanType,
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
            StructField("variant", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("has_alpha", BooleanType()),
            StructField("has_animation", BooleanType()),
            StructField("has_icc", BooleanType()),
            StructField("has_exif", BooleanType()),
            StructField("has_xmp", BooleanType()),
            StructField("n_frames", LongType()),
            StructField("duration_s", DoubleType()),
            StructField("n_chunks", LongType()),
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
                    m = parse_webp_meta(bytes(payload))
                    for k in cols:
                        if k in ("media_id", "err"):
                            continue
                        row[k] = m.get(k)
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
