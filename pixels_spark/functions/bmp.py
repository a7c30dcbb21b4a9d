"""BMP decoder — FULL pixel decode including RLE8 decompression, pure
stdlib.

Joins the full-decode tier (PPM/PNG/JPEG/GIF/WAV/FLAC): ``decode_bmp``
recovers every pixel of 24-bit BI_RGB, 8-bit palettized BI_RGB and
8-bit BI_RLE8 bitmaps — file header, BITMAPINFOHEADER, BGRA palette,
4-byte row padding, bottom-up vs top-down row order (negative height),
and the RLE8 escape protocol (end-of-line, end-of-bitmap, delta skips,
word-aligned absolute runs). Skipped pixels in RLE deltas take palette
index 0, the de-facto convention.

Exactness is provable the GIF way: ``pixel_checksum`` is the sum of
RGB bytes over the full normalized top-down image mod 2^31 — a wrong
run length, palette slot, padding byte, or row order flips it, so the
golden oracle pins the whole decode path.

Containment (the MP4 rule): corrupt bytes become err rows, never task
failures — dims are bounds-checked before allocation, RLE output is
capped at the declared pixel count, truncation raises ValueError or
struct.error, all inside ``multimodal.DECODE_ERRORS``.

Format follows the public Windows BMP specification (BITMAPINFOHEADER,
documented by Microsoft and in every graphics text); no reference code
used — the reference engine (pixelsdb/pixels) has no image path, this
extends the multimodal north star (VECTOR type,
``pixels-core/.../TypeDescription.java:218``).
"""

from __future__ import annotations

import struct

__all__ = ["encode_bmp_fixture", "decode_bmp", "rle8_decode", "rle8_encode"]

_MAX_PIXELS = 64 << 20


# ---------------------------------------------------------------------------
# RLE8
# ---------------------------------------------------------------------------

def rle8_encode(rows: list[bytes], absolute_every: int = 0) -> bytes:
    """BI_RLE8 encoder (fixture side): run-length pairs, an optional
    absolute-mode block per row (exercises the word-padding path), EOL
    after each row, EOB at the end."""
    out = bytearray()
    for y, row in enumerate(rows):
        x = 0
        emitted_abs = False
        while x < len(row):
            if (
                absolute_every
                and not emitted_abs
                and y % absolute_every == 0
                and len(row) - x >= 3
            ):
                n = min(5, len(row) - x)
                if n >= 3:
                    out += bytes([0, n]) + row[x : x + n]
                    if n & 1:
                        out += b"\x00"  # absolute runs pad to WORD
                    x += n
                    emitted_abs = True
                    continue
            run = 1
            while (
                x + run < len(row) and row[x + run] == row[x] and run < 255
            ):
                run += 1
            out += bytes([run, row[x]])
            x += run
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def rle8_decode(data: bytes, width: int, height: int) -> list[bytes]:
    """BI_RLE8 decoder → ``height`` rows of ``width`` palette indices
    (bitmap coordinate order, bottom-up handled by the caller). Handles
    encoded runs, absolute mode (word-aligned), EOL (0,0), EOB (0,1)
    and delta (0,2,dx,dy) — skipped cells stay index 0. Raises
    ValueError on overruns."""
    rows = [bytearray(width) for _ in range(height)]
    x = y = pos = 0
    while pos + 1 < len(data) + 1:
        if pos + 2 > len(data):
            raise ValueError("BMP RLE8 stream truncated")
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            if y >= height or x + n > width:
                raise ValueError("BMP RLE8 run overruns row")
            rows[y][x : x + n] = bytes([v]) * n
            x += n
            continue
        if v == 0:  # EOL
            x, y = 0, y + 1
            if y > height:
                raise ValueError("BMP RLE8 EOL beyond last row")
            continue
        if v == 1:  # EOB
            return [bytes(r) for r in rows]
        if v == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("BMP RLE8 delta truncated")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > width or y >= height:
                raise ValueError("BMP RLE8 delta jumps out of bitmap")
            continue
        # absolute mode: v literal bytes, word-aligned
        if y >= height or x + v > width:
            raise ValueError("BMP RLE8 absolute run overruns row")
        if pos + v > len(data):
            raise ValueError("BMP RLE8 absolute run truncated")
        rows[y][x : x + v] = data[pos : pos + v]
        pos += v + (v & 1)
        x += v
    raise ValueError("BMP RLE8 stream ended without EOB")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> dict:
    """Full BMP decode: 24-bit BI_RGB, 8-bit palettized BI_RGB, 8-bit
    BI_RLE8. Returns dims/bpp/compression/palette accounting plus the
    decode-exactness scalars (pixel_checksum = RGB byte sum over the
    normalized top-down image mod 2^31; mean_byte). Raises ValueError
    (or struct.error) on malformed structure."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    if len(payload) < 54:
        raise ValueError("BMP truncated in headers")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported (< 40)")
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression, _img_size = struct.unpack_from("<II", payload, 30)
    colors_used = struct.unpack_from("<I", payload, 46)[0]
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise ValueError(f"BMP dims {width}x{height} out of bounds")
    if planes != 1:
        raise ValueError(f"BMP planes {planes} != 1")

    palette: list[tuple[int, int, int]] = []
    if bpp == 8:
        n_colors = colors_used or 256
        pal_at = 14 + hdr_size
        pal_end = pal_at + 4 * n_colors
        if pal_end > len(payload):
            raise ValueError("BMP palette truncated")
        palette = [
            (payload[i + 2], payload[i + 1], payload[i])  # BGRA -> RGB
            for i in range(pal_at, pal_end, 4)
        ]

    if data_off > len(payload):
        raise ValueError("BMP pixel data offset beyond payload")

    rows_rgb: list[list[int]] = []
    if bpp == 24 and compression == 0:
        stride = (width * 3 + 3) & ~3
        need = data_off + stride * height
        if need > len(payload):
            raise ValueError("BMP 24-bit pixel data truncated")
        for yy in range(height):
            at = data_off + yy * stride
            row = []
            for xx in range(width):
                b, g, r = payload[at + 3 * xx : at + 3 * xx + 3]
                row += [r, g, b]
            rows_rgb.append(row)
    elif bpp == 8 and compression == 0:
        stride = (width + 3) & ~3
        need = data_off + stride * height
        if need > len(payload):
            raise ValueError("BMP 8-bit pixel data truncated")
        for yy in range(height):
            at = data_off + yy * stride
            row = []
            for xx in range(width):
                idx = payload[at + xx]
                if idx >= len(palette):
                    raise ValueError("BMP pixel index beyond palette")
                row += list(palette[idx])
            rows_rgb.append(row)
    elif bpp == 8 and compression == 1:  # BI_RLE8
        idx_rows = rle8_decode(payload[data_off:], width, height)
        for row_idx in idx_rows:
            row = []
            for idx in row_idx:
                if idx >= len(palette):
                    raise ValueError("BMP RLE8 index beyond palette")
                row += list(palette[idx])
            rows_rgb.append(row)
    else:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} not supported "
            "(24-bit BI_RGB, 8-bit BI_RGB, 8-bit BI_RLE8 decode natively)"
        )

    if not top_down:
        rows_rgb.reverse()  # normalize to top-down
    checksum = sum(sum(r) for r in rows_rgb)
    n_bytes = width * height * 3
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "compression": compression,
        "n_colors": len(palette),
        "top_down": top_down,
        "n_pixels": width * height,
        "pixel_checksum": checksum % 2147483648,
        "mean_byte": checksum / n_bytes if n_bytes else 0.0,
        # decode_image dict shape compatibility
        "maxval": 255,
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def _headers(
    width: int, height: int, bpp: int, compression: int, pal: bytes,
    data_size: int, top_down: bool,
) -> bytes:
    data_off = 14 + 40 + len(pal)
    file_hdr = b"BM" + struct.pack(
        "<IHHI", data_off + data_size, 0, 0, data_off
    )
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, (-height if top_down else height), 1, bpp,
        compression, data_size, 2835, 2835,
        len(pal) // 4, 0,
    )
    return file_hdr + info + pal


def _palette4(n: int, seed: int) -> bytes:
    out = bytearray()
    for i in range(n):
        v = (i * 53 + seed * 17) & 0xFF
        out += bytes([(v * 7) & 0xFF, (v * 5 + 64) & 0xFF,
                      (v * 3 + 128) & 0xFF, 0])  # B G R A
    return bytes(out)


def _index_rows(w: int, h: int, n_colors: int, seed: int) -> list[bytes]:
    return [
        bytes(((x // 4) + y * 3 + seed) % n_colors for x in range(w))
        for y in range(h)
    ]


def encode_bmp_fixture(
    width: int = 16,
    height: int = 12,
    bpp: int = 24,
    rle: bool = False,
    top_down: bool = False,
    n_colors: int = 64,
    seed: int = 0,
) -> bytes:
    """Deterministic BMP payload: 24-bit BI_RGB, 8-bit palettized, or
    8-bit BI_RLE8 (with absolute-mode blocks on every other row)."""
    if bpp == 24:
        stride = (width * 3 + 3) & ~3
        body = bytearray()
        for y in range(height):
            row = bytearray()
            for x in range(width):
                r = (x * 11 + y * 7 + seed) & 0xFF
                g = (x * 5 + y * 13 + seed * 3) & 0xFF
                b = (x * 3 + y * 17 + seed * 5) & 0xFF
                row += bytes([b, g, r])
            row += b"\x00" * (stride - len(row))
            body += row
        return _headers(width, height, 24, 0, b"", len(body), top_down) + bytes(body)
    assert bpp == 8
    pal = _palette4(n_colors, seed)
    rows = _index_rows(width, height, n_colors, seed)
    if rle:
        data = rle8_encode(rows, absolute_every=2)
        return _headers(width, height, 8, 1, pal, len(data), top_down) + data
    stride = (width + 3) & ~3
    body = b"".join(r + b"\x00" * (stride - width) for r in rows)
    return _headers(width, height, 8, 0, pal, len(body), top_down) + body


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------

def synthetic_bmp_media(spark, n: int = 12):
    """Deterministic BMP MEDIA_SCHEMA fixture rotating 24-bit / 8-bit /
    RLE8 forms, top-down and bottom-up, with two malformed tails
    (truncated pixel data; RLE run overrun) so the err channel pins."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        form = i % 3
        payload = encode_bmp_fixture(
            width=8 + 4 * (i % 4),
            height=6 + 3 * (i % 3),
            bpp=24 if form == 0 else 8,
            rle=(form == 2),
            top_down=(i % 4 == 1),
            n_colors=(16, 64, 256)[i % 3],
            seed=i,
        )
        if i == n - 1:
            payload = payload[: len(payload) - 9]  # truncated
        elif i == n - 2 and form == 2:
            b = bytearray(payload)
            b[-6] = 0xFF  # blow a run length past the row edge
            payload = bytes(b)
        elif i == n - 2:
            b = bytearray(payload)
            struct.pack_into("<i", b, 18, 1 << 24)  # absurd width
            payload = bytes(b)
        rows.append((i, "image", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def bmp_meta(media) -> "object":
    """Arrow-batched full-BMP decode over a MEDIA_SCHEMA DataFrame with
    the decode-exactness scalars; malformed payloads become err rows."""
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
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("bpp", LongType()),
            StructField("compression", LongType()),
            StructField("n_colors", LongType()),
            StructField("top_down", BooleanType()),
            StructField("n_pixels", LongType()),
            StructField("pixel_checksum", LongType()),
            StructField("mean_byte", DoubleType()),
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
                    m = decode_bmp(bytes(payload))
                    for k in cols:
                        if k in ("media_id", "err"):
                            continue
                        row[k] = m.get(k)
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
