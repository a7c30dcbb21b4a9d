"""TIFF decoder — IFD metadata walk for every file, FULL pixel decode
for uncompressed and LZW strips, pure stdlib.

TIFF 6.0 is the archival/scan workhorse of real document corpora. This
module walks the IFD chain in both byte orders (II little / MM big),
recovers per-page dimensions, bits-per-sample, photometric, strip
layout — with EXACT strip byte ranges from StripOffsets/StripByteCounts,
what a 100 TB scheduler needs for ranged reads — and counts pages. For
Compression=1 (none) and Compression=5 (LZW) with 8-bit samples it
additionally decodes every pixel: TIFF-variant LZW differs from GIF's
(``functions/gif.py``) in bit order (MSB-first) and the "early change"
rule (code width grows one code sooner), and Predictor=2 horizontal
differencing is undone per row per sample plane. JPEG-in-TIFF and other
codecs stay behind the documented NotImplementedError boundary — the
metadata walk still succeeds for them, only the pixel fields stay NULL.

``pixel_checksum`` (sample byte sum mod 2^31 over all decoded pages)
pins decode exactness in the golden oracle, the GIF/BMP convention.
Containment (the MP4 rule): corrupt bytes become err rows, never task
failures — counts and offsets are bounds-checked before use.

Format follows the public TIFF 6.0 specification (Adobe, 1992); no
reference code used — the reference engine (pixelsdb/pixels) has no
image path, this extends the multimodal north star (VECTOR type,
``pixels-core/.../TypeDescription.java:218``).
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_tiff_fixture",
    "decode_tiff",
    "tiff_lzw_decode",
    "tiff_lzw_encode",
]

_MAX_PIXELS = 64 << 20
_CLEAR, _EOI = 256, 257


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, early change)
# ---------------------------------------------------------------------------

def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW encoder (fixture side): MSB-first packing,
    ClearCode=256/EOI=257, width grows EARLY (at table size 2^w - 1),
    table reset at 4094."""
    out_codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_codes.append((_CLEAR, width))
    prefix = b""
    for b in data:
        nxt = prefix + bytes([b])
        if nxt in table:
            prefix = nxt
            continue
        out_codes.append((table[prefix], width))
        table[nxt] = next_code
        next_code += 1
        # mirror the decoder, which appends one code behind: its early-
        # change check (len == 2^w - 1) fires for our next emit when
        # next_code - 1 == 2^w - 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            out_codes.append((_CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([b])
    if prefix:
        out_codes.append((table[prefix], width))
    out_codes.append((_EOI, width))

    acc = n = 0
    out = bytearray()
    for code, w in out_codes:
        acc = (acc << w) | code
        n += w
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF 6.0 §13 LZW decoder: MSB-first, early change, bounded output
    (containment). Raises ValueError on malformed streams."""
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = n = pos = 0
    while True:
        while n < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated before EOI")
            acc = (acc << 8) | data[pos]
            n += 8
            pos += 1
        code = (acc >> (n - width)) & ((1 << width) - 1)
        n -= width
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} beyond dictionary")
        out += entry
        if len(out) > max_out:
            raise ValueError("TIFF LZW output exceeds declared strip size")
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out)


# ---------------------------------------------------------------------------
# IFD walk + decode
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_entry(payload: bytes, at: int, eb: str):
    tag, typ = struct.unpack_from(eb + "HH", payload, at)
    count = struct.unpack_from(eb + "I", payload, at + 4)[0]
    size = _TYPE_SIZE.get(typ, 1) * count
    if size <= 4:
        raw = payload[at + 8 : at + 8 + size]
    else:
        off = struct.unpack_from(eb + "I", payload, at + 8)[0]
        if off + size > len(payload):
            raise ValueError(f"TIFF tag {tag} value overruns payload")
        raw = payload[off : off + size]
    if typ == 3:
        vals = list(struct.unpack(eb + "H" * count, raw))
    elif typ == 4:
        vals = list(struct.unpack(eb + "I" * count, raw))
    elif typ == 1:
        vals = list(raw)
    elif typ == 2:
        vals = [raw.rstrip(b"\x00").decode("ascii", "replace")]
    elif typ == 5:
        vals = [
            struct.unpack_from(eb + "II", raw, 8 * i) for i in range(count)
        ]
    else:
        vals = [raw]
    return tag, vals


def _undo_predictor(rows: list[bytearray], spp: int) -> None:
    for row in rows:
        for i in range(spp, len(row)):
            row[i] = (row[i] + row[i - spp]) & 0xFF


def decode_tiff(payload: bytes) -> dict:
    """IFD metadata for every page; full pixel decode for none/LZW
    8-bit pages (pixel fields None for other codecs). Returns first-page
    metadata, page count, strip accounting with exact byte ranges, and
    the decode-exactness scalars."""
    if payload[:4] == b"II*\x00":
        eb = "<"
    elif payload[:4] == b"MM\x00*":
        eb = ">"
    else:
        raise ValueError("not a TIFF payload (missing II*/MM* magic)")
    ifd_off = struct.unpack_from(eb + "I", payload, 4)[0]

    pages = []
    n_strips_total = 0
    strip_bytes_total = 0
    checksum = 0
    n_pixels = 0
    decoded_pages = 0
    seen = set()
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("TIFF IFD chain loops")
        seen.add(ifd_off)
        if ifd_off + 2 > len(payload):
            raise ValueError("TIFF IFD offset beyond payload")
        n_entries = struct.unpack_from(eb + "H", payload, ifd_off)[0]
        end = ifd_off + 2 + 12 * n_entries
        if end + 4 > len(payload):
            raise ValueError("TIFF IFD entries overrun payload")
        tags = {}
        for i in range(n_entries):
            tag, vals = _read_entry(payload, ifd_off + 2 + 12 * i, eb)
            tags[tag] = vals
        ifd_off = struct.unpack_from(eb + "I", payload, end)[0]

        width = tags.get(256, [0])[0]
        height = tags.get(257, [0])[0]
        if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
            raise ValueError(f"TIFF dims {width}x{height} out of bounds")
        bps = tags.get(258, [1])
        spp = tags.get(277, [1])[0]
        compression = tags.get(259, [1])[0]
        predictor = tags.get(317, [1])[0]
        photometric = tags.get(262, [0])[0]
        offsets = tags.get(273, [])
        counts = tags.get(279, [])
        if len(offsets) != len(counts):
            raise ValueError("TIFF strip offsets/counts length mismatch")
        rows_per_strip = tags.get(278, [height])[0]
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(payload):
                raise ValueError("TIFF strip overruns payload")
        n_strips_total += len(offsets)
        strip_bytes_total += sum(counts)

        page = {
            "width": width,
            "height": height,
            "bits_per_sample": bps[0],
            "samples_per_pixel": spp,
            "compression": compression,
            "photometric": photometric,
            "predictor": predictor,
            "n_strips": len(offsets),
            "strip_ranges": list(zip(offsets, counts)),
        }
        pages.append(page)

        if compression in (1, 5) and all(b == 8 for b in bps):
            row_bytes = width * spp
            raw = bytearray()
            rows_done = 0
            for si, (off, cnt) in enumerate(zip(offsets, counts)):
                strip = payload[off : off + cnt]
                n_rows = min(rows_per_strip, height - rows_done)
                expect = n_rows * row_bytes
                if compression == 5:
                    strip = tiff_lzw_decode(strip, expect)
                if len(strip) < expect:
                    raise ValueError(
                        f"TIFF strip {si} yields {len(strip)} bytes, "
                        f"needs {expect}"
                    )
                strip = strip[:expect]
                if predictor == 2:
                    rows = [
                        bytearray(strip[r * row_bytes : (r + 1) * row_bytes])
                        for r in range(n_rows)
                    ]
                    _undo_predictor(rows, spp)
                    strip = b"".join(bytes(r) for r in rows)
                raw += strip
                rows_done += n_rows
            if rows_done < height:
                raise ValueError("TIFF strips cover fewer rows than height")
            checksum += sum(raw)
            n_pixels += width * height
            decoded_pages += 1

    if not pages:
        raise ValueError("TIFF contains no IFD pages")
    first = pages[0]
    return {
        "byte_order": "II" if eb == "<" else "MM",
        "n_pages": len(pages),
        "width": first["width"],
        "height": first["height"],
        "bits_per_sample": first["bits_per_sample"],
        "samples_per_pixel": first["samples_per_pixel"],
        "compression": first["compression"],
        "photometric": first["photometric"],
        "predictor": first["predictor"],
        "n_strips": n_strips_total,
        "strip_bytes": strip_bytes_total,
        "decoded_pages": decoded_pages,
        "n_pixels": n_pixels if decoded_pages else None,
        "pixel_checksum": checksum % 2147483648 if decoded_pages else None,
        "mean_byte": (
            checksum / (n_pixels * first["samples_per_pixel"])
            if decoded_pages and n_pixels
            else None
        ),
        "pages": pages,
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

def _page_samples(w: int, h: int, spp: int, seed: int) -> bytes:
    return bytes(
        ((x * 7 + y * 11 + c * 29 + seed) & 0xFF)
        for y in range(h)
        for x in range(w)
        for c in range(spp)
    )


def encode_tiff_fixture(
    width: int = 16,
    height: int = 12,
    spp: int = 1,
    compression: int = 1,
    predictor: int = 1,
    big_endian: bool = False,
    n_pages: int = 1,
    rows_per_strip: int = 0,
    seed: int = 0,
) -> bytes:
    """Deterministic TIFF payload: none/LZW compression, optional
    horizontal-differencing predictor, II/MM byte orders, multi-strip
    and multi-page forms."""
    eb = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or height
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00") + b"\x00" * 4

    ifd_offsets = []
    for p in range(n_pages):
        samples = _page_samples(width, height, spp, seed + p)
        row_bytes = width * spp
        strips = []
        y = 0
        while y < height:
            n_rows = min(rows_per_strip, height - y)
            chunk = samples[y * row_bytes : (y + n_rows) * row_bytes]
            if predictor == 2:
                rows = [
                    bytearray(chunk[r * row_bytes : (r + 1) * row_bytes])
                    for r in range(n_rows)
                ]
                for row in rows:  # forward-difference
                    for i in range(len(row) - 1, spp - 1, -1):
                        row[i] = (row[i] - row[i - spp]) & 0xFF
                chunk = b"".join(bytes(r) for r in rows)
            if compression == 5:
                chunk = tiff_lzw_encode(chunk)
            strips.append(chunk)
            y += n_rows

        strip_offs = []
        for s in strips:
            strip_offs.append(len(out))
            out += s
        if len(out) & 1:
            out += b"\x00"

        entries = [
            (256, 4, [width]),
            (257, 4, [height]),
            (258, 3, [8] * spp),
            (259, 3, [compression]),
            (262, 3, [2 if spp == 3 else 1]),
            (273, 4, strip_offs),
            (277, 3, [spp]),
            (278, 4, [rows_per_strip]),
            (279, 4, [len(s) for s in strips]),
        ]
        if predictor == 2:
            entries.append((317, 3, [predictor]))
        entries.sort()

        # out-of-line value blocks first
        value_blocks = {}
        for tag, typ, vals in entries:
            size = _TYPE_SIZE[typ] * len(vals)
            if size > 4:
                value_blocks[tag] = len(out)
                fmt = {3: "H", 4: "I"}[typ]
                out += struct.pack(eb + fmt * len(vals), *vals)
        if len(out) & 1:
            out += b"\x00"

        ifd_offsets.append(len(out))
        out += struct.pack(eb + "H", len(entries))
        for tag, typ, vals in entries:
            size = _TYPE_SIZE[typ] * len(vals)
            out += struct.pack(eb + "HH", tag, typ)
            out += struct.pack(eb + "I", len(vals))
            if size <= 4:
                fmt = {3: "H", 4: "I"}[typ]
                packed = struct.pack(eb + fmt * len(vals), *vals)
                out += packed + b"\x00" * (4 - len(packed))
            else:
                out += struct.pack(eb + "I", value_blocks[tag])
        out += b"\x00" * 4  # next-IFD placeholder

    # stitch the IFD chain
    struct.pack_into(eb + "I", out, 4, ifd_offsets[0])
    for p in range(n_pages - 1):
        # next-IFD field sits right after page p's entry table
        n_entries = struct.unpack_from(eb + "H", out, ifd_offsets[p])[0]
        at = ifd_offsets[p] + 2 + 12 * n_entries
        struct.pack_into(eb + "I", out, at, ifd_offsets[p + 1])
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------

def synthetic_tiff_media(spark, n: int = 12):
    """Deterministic TIFF MEDIA_SCHEMA fixture rotating byte orders /
    compression / predictor / gray-vs-RGB / multi-strip / multi-page,
    with a JPEG-in-TIFF metadata-only row, ending with a strip-overrun
    row and a truncated row so the err channel pins."""
    from pixels_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        if i == 9:
            # JPEG-in-TIFF: metadata walks, pixels stay NULL — build a
            # valid IFD whose compression tag says 7 and whose strip is
            # opaque bytes
            payload = encode_tiff_fixture(width=8, height=6, seed=i)
            b = bytearray(payload)
            at = payload.index(struct.pack("<HH", 259, 3))
            struct.pack_into("<I", b, at + 8, 7)
            payload = bytes(b)
        else:
            payload = encode_tiff_fixture(
                width=8 + 4 * (i % 4),
                height=6 + 3 * (i % 3),
                spp=3 if i % 2 else 1,
                compression=5 if i % 3 == 1 else 1,
                predictor=2 if i % 4 == 2 else 1,
                big_endian=(i % 3 == 2),
                n_pages=1 + (i % 3),
                rows_per_strip=4 if i % 2 else 0,
                seed=i,
            )
        if i == n - 1:
            payload = payload[: len(payload) - 13]  # truncated
        elif i == n - 2:
            b = bytearray(payload)
            at = payload.index(struct.pack("<HH", 273, 4))
            struct.pack_into("<I", b, at + 8, len(payload) + 1000)
            payload = bytes(b)  # strip offset beyond payload
        rows.append((i, "image", payload, "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def tiff_meta(media) -> "object":
    """Arrow-batched TIFF IFD walk + none/LZW pixel decode over a
    MEDIA_SCHEMA DataFrame; other codecs report metadata with NULL
    pixel fields; malformed payloads become err rows."""
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
            StructField("byte_order", StringType()),
            StructField("n_pages", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("bits_per_sample", LongType()),
            StructField("samples_per_pixel", LongType()),
            StructField("compression", LongType()),
            StructField("photometric", LongType()),
            StructField("predictor", LongType()),
            StructField("n_strips", LongType()),
            StructField("strip_bytes", LongType()),
            StructField("decoded_pages", LongType()),
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
                    m = decode_tiff(bytes(payload))
                    for k in cols:
                        if k in ("media_id", "err"):
                            continue
                        row[k] = m.get(k)
                except DECODE_ERRORS as e:
                    row["err"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=schema)
