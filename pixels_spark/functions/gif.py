"""GIF87a/89a decoder — FULL pixel decode (LZW), pure stdlib.

Unlike the H.264 / MP3-granule boundaries (entropy-coded, motion-
compensated — documented NotImplementedError), GIF's compression is
plain variable-width LZW over palette indices, decodable exactly in
~80 lines of stdlib Python. This module therefore joins the *full
decode* tier (PPM/PNG/JPEG/WAV/FLAC), not the metadata-demux tier
(MP4/MP3/OGG): ``decode_gif`` recovers every pixel of every frame —
header + logical-screen descriptor, global/local color tables,
GIF89a extensions (graphic-control delay/transparency/disposal,
NETSCAPE looping, comments), interlaced row reordering (the 8/8-4/8-
2/4-1/2 four-pass scheme) and the LZW stream itself, with clear-code
dictionary resets and the 12-bit code-width ceiling.

Exactness is provable: the returned ``pixel_checksum`` is the sum of
palette-mapped RGB bytes across ALL frames mod 2^31 — one flipped LZW
code, wrong palette slot, or mis-ordered interlace row changes it, so
the golden oracle pins the whole decode path, not just the headers.

Containment (the MP4 rule, ADVICE r11): corrupt bytes become err rows,
never task failures — every length/count is bounds-checked before use,
bad LZW codes raise ValueError, truncation raises ValueError/
struct.error, all inside ``multimodal.DECODE_ERRORS``.

Format follows the public GIF89a specification (CompuServe, 1990; also
W3C's archived copy) — no reference code used; the reference engine
(pixelsdb/pixels) has no image path, this extends the multimodal north
star (VECTOR type, pixels-core/.../TypeDescription.java:218).

Scale: decode is O(total pixels) per payload inside the Arrow batch
that carries it; no global state, embarrassingly parallel across the
corpus. A frame table never leaves the executor (mp4_meta convention).
"""

from __future__ import annotations

import struct

__all__ = ["encode_gif_fixture", "decode_gif", "lzw_decode", "lzw_encode"]

_MAX_CODE_WIDTH = 12
_MAX_PIXELS = 64 << 20  # containment: reject absurd canvas claims pre-alloc


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first bit packing, clear/EOI codes)
# ---------------------------------------------------------------------------

def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (fixture side). Emits an initial clear
    code, grows the code width as the dictionary fills, resets at the
    4096-entry ceiling — the stream any conformant GIF writer produces."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []  # (value, width) flattened as ints for speed
    widths: list[int] = []

    def emit(code: int, width: int) -> None:
        out_bits.append(code)
        widths.append(width)

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        nxt = prefix + bytes([b])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[nxt] = next_code
            next_code += 1
            # mirror the decoder, which appends one code BEHIND the
            # encoder (its first data code adds nothing): it grows width
            # when its table length reaches 2^width, and its length while
            # reading our next emit is next_code - 1
            if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)

    # LSB-first bit packing
    acc = n = 0
    out = bytearray()
    for code, w in zip(out_bits, widths):
        acc |= code << n
        n += w
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF-variant LZW decoder. Raises ValueError on out-of-range codes,
    a first-code that isn't a literal, or output exceeding ``max_pixels``
    (containment: a corrupt stream cannot balloon executor memory)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = n = pos = 0
    while True:
        while n < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated before EOI")
            acc |= data[pos] << n
            n += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the cScSc special case
        else:
            raise ValueError(f"GIF LZW code {code} beyond dictionary")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF LZW output exceeds declared pixel count")
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows_in_stream_order: list[bytes], height: int) -> list[bytes]:
    rows: list[bytes | None] = [None] * height
    it = iter(rows_in_stream_order)
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            rows[y] = next(it)
    return [r for r in rows if r is not None]


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(payload):
            raise ValueError("GIF sub-block overruns payload")
        chunks.append(payload[pos : pos + n])
        pos += n


def decode_gif(payload: bytes) -> dict:
    """Full GIF decode: every frame's pixels via LZW, palette-mapped.

    Returns canvas dims, palette size, frame count, total duration
    (GCE delays, 1/100 s units), NETSCAPE loop count, transparency and
    interlace accounting, a comment flag, and two decode-exactness
    scalars: ``pixel_checksum`` = sum of palette-mapped R+G+B bytes over
    all frames mod 2^31, and ``mean_index`` = mean palette index over
    all decoded pixels. Raises ValueError (or struct.error via the
    fixed-layout reads) on any malformed structure — all contained by
    ``multimodal.DECODE_ERRORS``."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a magic)")
    version = payload[3:6].decode("ascii")
    if len(payload) < 13:
        raise ValueError("GIF truncated in logical screen descriptor")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        end = pos + 3 * n_colors
        if end > len(payload):
            raise ValueError("GIF global color table truncated")
        gct = [tuple(payload[i : i + 3]) for i in range(pos, end, 3)]
        pos = end

    n_frames = 0
    n_interlaced = 0
    total_delay_cs = 0
    loop_count = None
    has_transparency = False
    has_comment = False
    checksum = 0
    index_sum = 0
    n_pixels = 0
    pending_delay = 0
    pending_transparent: int | None = None

    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("GIF graphic control block too short")
                flags = data[0]
                pending_delay = struct.unpack_from("<H", data, 1)[0]
                pending_transparent = data[3] if flags & 0x01 else None
                if flags & 0x01:
                    has_transparency = True
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0":
                if len(data) >= 14 and data[11] == 0x01:
                    loop_count = struct.unpack_from("<H", data, 12)[0]
            elif label == 0xFE:
                has_comment = True
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block introducer 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("GIF image descriptor truncated")
        _fx, _fy, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        fflags = payload[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or fw * fh > _MAX_PIXELS:
            raise ValueError(f"GIF frame dims {fw}x{fh} out of bounds")
        palette = gct
        if fflags & 0x80:  # local color table
            n_local = 2 << (fflags & 0x07)
            end = pos + 3 * n_local
            if end > len(payload):
                raise ValueError("GIF local color table truncated")
            palette = [tuple(payload[i : i + 3]) for i in range(pos, end, 3)]
            pos = end
        if not palette:
            raise ValueError("GIF frame has neither local nor global palette")
        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW min code size")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        indices = lzw_decode(data, mcs, fw * fh)
        if len(indices) < fw * fh:
            raise ValueError(
                f"GIF LZW yielded {len(indices)} pixels, frame needs {fw * fh}"
            )
        indices = indices[: fw * fh]
        if fflags & 0x40:  # interlaced: reorder rows
            stream_rows = [
                indices[y * fw : (y + 1) * fw] for y in range(fh)
            ]
            indices = b"".join(_deinterlace(stream_rows, fh))
        if max(indices) >= len(palette):
            raise ValueError("GIF pixel index beyond palette size")
        for idx in indices:
            r, g, b = palette[idx]
            checksum += r + g + b
        index_sum += sum(indices)
        n_pixels += len(indices)
        n_frames += 1
        if fflags & 0x40:
            n_interlaced += 1
        total_delay_cs += pending_delay
        pending_delay = 0
        pending_transparent = None

    if n_frames == 0:
        raise ValueError("GIF contains no image frames")
    return {
        "version": version,
        "width": width,
        "height": height,
        "n_colors": len(gct),
        "bg_index": bg_index,
        "n_frames": n_frames,
        "n_interlaced": n_interlaced,
        "duration_s": total_delay_cs / 100.0,
        "loop_count": loop_count,
        "has_transparency": has_transparency,
        "has_comment": has_comment,
        "n_pixels": n_pixels,
        "pixel_checksum": checksum % 2147483648,
        "mean_index": (index_sum / n_pixels) if n_pixels else 0.0,
    }


# ---------------------------------------------------------------------------
# fixture encoder (test/golden side)
# ---------------------------------------------------------------------------

def _palette_bytes(n: int, seed: int) -> bytes:
    out = bytearray()
    for i in range(n):
        v = (i * 37 + seed * 11) & 0xFF
        out.append((v * 3) & 0xFF)
        out.append(((v + 85) * 5) & 0xFF)
        out.append(((v + 170) * 7) & 0xFF)
    return bytes(out)


def _frame_indices(w: int, h: int, n_colors: int, seed: int) -> bytes:
    # deterministic banded pattern with runs (so LZW actually compresses)
    return bytes(
        ((x // 3) + y * 2 + seed) % n_colors for y in range(h) for x in range(w)
    )


def encode_gif_fixture(
    width: int = 16,
    height: int = 12,
    n_frames: int = 1,
    n_colors: int = 8,
    seed: int = 0,
    delays_cs: tuple[int, ...] = (),
    interlace_frame: int = -1,
    local_palette_frame: int = -1,
    transparent_index: int | None = None,
    loop_count: int | None = None,
    comment: bytes = b"",
    version: bytes = b"GIF89a",
) -> bytes:
    """Deterministic GIF payload: global palette, optional NETSCAPE loop
    block, comment extension, per-frame GCE (delay/transparency), one
    optionally-interlaced frame, one optionally-local-palette frame,
    real LZW-compressed pixel data."""
    assert n_colors & (n_colors - 1) == 0 and 2 <= n_colors <= 256
    depth = n_colors.bit_length() - 1
    out = bytearray()
    out += version
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag + size, bg, aspect
    out += _palette_bytes(n_colors, seed)
    if loop_count is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop_count) + b"\x00"
    if comment:
        out += b"\x21\xfe" + bytes([len(comment)]) + comment + b"\x00"
    for f in range(n_frames):
        delay = delays_cs[f] if f < len(delays_cs) else 0
        if delay or transparent_index is not None:
            flags = 0x01 if transparent_index is not None else 0x00
            out += b"\x21\xf9\x04" + bytes([flags])
            out += struct.pack("<H", delay)
            out += bytes([transparent_index or 0, 0])
        fflags = 0
        local = f == local_palette_frame
        if local:
            fflags |= 0x80 | (depth - 1)
        if f == interlace_frame:
            fflags |= 0x40
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([fflags])
        if local:
            out += _palette_bytes(n_colors, seed + 100 + f)
        indices = _frame_indices(width, height, n_colors, seed + f)
        if f == interlace_frame:
            # encoder writes rows in interlace stream order
            rows = [indices[y * width : (y + 1) * width] for y in range(height)]
            ordered = []
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    ordered.append(rows[y])
            indices = b"".join(ordered)
        mcs = max(2, depth)
        out += bytes([mcs])
        data = lzw_encode(indices, mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark seam (mp3_meta / mp4_meta convention)
# ---------------------------------------------------------------------------

def synthetic_gif_media(spark, n: int = 12):
    """Deterministic GIF MEDIA_SCHEMA fixture rotating dims / palette
    sizes / frame counts, with interlaced, local-palette, transparent,
    looping-animation and comment rows, a GIF87a row, and two malformed
    tails (truncated mid-LZW; corrupt LZW code) so the err channel pins
    in the golden oracle."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        payload = encode_gif_fixture(
            width=8 + 4 * (i % 4),
            height=6 + 3 * (i % 3),
            n_frames=1 + (i % 3),
            n_colors=(4, 8, 16, 64)[i % 4],
            seed=i,
            delays_cs=(5 * (i + 1), 10, 3),
            interlace_frame=0 if i % 3 == 1 else -1,
            local_palette_frame=1 if i % 4 == 2 else -1,
            transparent_index=(i % 4) if i % 5 == 3 else None,
            loop_count=i if i % 2 == 0 else None,
            comment=b"pixels-spark fixture" if i % 3 == 0 else b"",
            version=b"GIF87a" if i == 4 else b"GIF89a",
        )
        if i == n - 1:
            payload = payload[: len(payload) - 9]  # truncated mid-stream
        elif i == n - 2:
            b = bytearray(payload)
            b[-12] ^= 0xFF  # corrupt an LZW byte near the tail
            payload = bytes(b)
        rows.append((i, "image", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def gif_meta(media) -> "object":
    """Arrow-batched full-GIF decode over a MEDIA_SCHEMA DataFrame: one
    row per file with canvas/palette/frame metadata plus the decode-
    exactness scalars (pixel_checksum over palette-mapped RGB, mean
    palette index). Malformed payloads become err rows (never task
    failures)."""
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
            StructField("version", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("n_colors", LongType()),
            StructField("n_frames", LongType()),
            StructField("n_interlaced", LongType()),
            StructField("duration_s", DoubleType()),
            StructField("loop_count", LongType()),
            StructField("has_transparency", BooleanType()),
            StructField("has_comment", BooleanType()),
            StructField("n_pixels", LongType()),
            StructField("pixel_checksum", LongType()),
            StructField("mean_index", DoubleType()),
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
                    m = decode_gif(bytes(payload))
                    row.update(
                        version=m["version"],
                        width=m["width"],
                        height=m["height"],
                        n_colors=m["n_colors"],
                        n_frames=m["n_frames"],
                        n_interlaced=m["n_interlaced"],
                        duration_s=m["duration_s"],
                        loop_count=m["loop_count"],
                        has_transparency=m["has_transparency"],
                        has_comment=m["has_comment"],
                        n_pixels=m["n_pixels"],
                        pixel_checksum=m["pixel_checksum"],
                        mean_index=m["mean_index"],
                    )
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
