"""Tests for multimodal binary-column plumbing (decode stubbed)."""

from __future__ import annotations

import pytest

from pixels_spark.catalog import load_table
from pixels_spark.functions import multimodal as M


def test_decode_stubs_raise():
    # JPEG now decodes natively — a truncated one fails loudly instead
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0JFIF")
    # GIF and BMP decode natively now (r12) — truncated ones fail loudly
    # through the same contained-error channel
    with pytest.raises(ValueError):
        M.decode_image(b"GIF89a......")
    with pytest.raises(ValueError):
        M.decode_image(b"BM......")
    # TIFF routes natively too (r12) — a truncated one fails loudly
    with pytest.raises(ValueError):
        M.decode_image(b"II*\x00\x08\x00\x00\x00")
    if M._pil_image() is None:
        with pytest.raises(NotImplementedError):
            M.decode_image(b"8BPS....")  # PSD still needs PIL
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"RIFF")


def test_media_schema_and_feature_extraction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = M.documents_as_media(docs)
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA
    ]
    feats = M.extract_features(media)
    assert [(f.name, f.dataType) for f in feats.schema] == [
        (f.name, f.dataType) for f in M.FEATURE_SCHEMA
    ]
    rows = {r.media_id: r for r in feats.collect()}
    # spot-check against the same extractor run driver-side
    for r in docs.collect():
        payload = r.text.encode("utf-8")
        n, checksum, mean = M.fake_feature_extractor(payload)
        got = rows[r.doc_id]
        assert got.n_bytes == n
        assert got.checksum == checksum
        assert got.feat_mean == pytest.approx(mean)


def test_mixed_kinds_and_decode_dispatch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = M.documents_as_media(docs, kind="mixed")
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # feature extraction is kind-agnostic plumbing — runs over all kinds
    feats = M.extract_features(media)
    assert feats.count() == 30
    # decode dispatch: registered kinds raise the stub error, unknown kinds
    # a clear ValueError
    with pytest.raises(NotImplementedError):
        M.decode("image", b"x")
    with pytest.raises(NotImplementedError):
        M.decode("audio", b"x")
    with pytest.raises(ValueError):
        M.decode("hologram", b"x")


def test_ppm_decoder_roundtrip():
    p = M.synthesize_ppm(7, 5, seed=3)
    d = M.decode_ppm(p)
    assert (d["width"], d["height"], d["maxval"], d["n_pixels"]) == (7, 5, 255, 35)
    # comments + arbitrary whitespace in header parse too
    p2 = b"P6 # c\n# another\n 3\t2\n255\n" + bytes(18)
    d2 = M.decode_ppm(p2)
    assert (d2["width"], d2["height"]) == (3, 2)
    with pytest.raises(ValueError):
        M.decode_ppm(b"P6\n3 2\n255\n\x00\x00")  # truncated body


def test_wav_decoder_roundtrip():
    p = M.synthesize_wav(sample_rate=16000, n_samples=1600, channels=2)
    d = M.decode_wav(p)
    assert d["sample_rate"] == 16000
    assert d["channels"] == 2
    assert d["bits_per_sample"] == 16
    assert d["n_samples"] == 1600
    assert d["duration_s"] == pytest.approx(0.1)
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks


def test_media_features_real_decode_distributed(spark):
    """The mapInPandas seam must run the REAL WAV/PPM decoders and surface
    undecodable payloads as err rows, not task failures."""
    media = M.synthetic_media(spark, n=32)
    bad = spark.createDataFrame(
        [(999, "image", b"\x89PNG not a ppm", "{}"),
         (998, "hologram", b"??", "{}")],
        M.MEDIA_SCHEMA,
    )
    feats = {r.media_id: r for r in M.media_features(media.union(bad)).collect()}
    assert len(feats) == 34
    for i in range(32):
        r = feats[i]
        assert r.err is None, r
        if i % 3 == 0:
            assert r.width == 4 + (i % 8) and r.height == 3 + (i % 5)
            assert r.sample_rate is None and r.n_frames is None
        elif i % 3 == 1:
            assert r.sample_rate == 8000 * (1 + i % 3)
            assert r.duration_s == pytest.approx(0.1)
            assert r.width is None
        else:
            assert r.n_frames == 2 + i % 4
            assert r.width == 8 and r.height == 6  # first-frame dims
    assert "NotImplementedError" in feats[999].err
    assert "ValueError" in feats[998].err


def test_resize_ppm_dims_and_content():
    src = M.synthesize_ppm(8, 6, seed=3)
    out = M.decode_ppm(M.resize_ppm(src, 2))
    assert (out["width"], out["height"]) == (4, 3)
    # factor 1 is identity
    assert M.resize_ppm(src, 1) == src
    # non-integer-divisible dims round up (ceil)
    out = M.decode_ppm(M.resize_ppm(M.synthesize_ppm(7, 5), 2))
    assert (out["width"], out["height"]) == (4, 3)


def test_video_container_roundtrip():
    v = M.synthesize_video(5, width=8, height=6)
    meta = M.decode_video(v)
    assert meta == {"n_frames": 5, "width": 8, "height": 6}
    frames = M.sample_video_frames(v, 2)
    assert len(frames) == 3  # frames 0, 2, 4
    for fr in frames:
        d = M.decode_ppm(fr)
        assert (d["width"], d["height"]) == (8, 6)


def test_resize_images_operator(spark):
    media = M.synthetic_media(spark, n=12)
    resized = M.resize_images(media, 2)
    feats = {r.media_id: r for r in M.media_features(resized).collect()}
    assert len(feats) == 12
    for i in range(12):
        if i % 3 == 0:  # images halved (ceil)
            w, h = 4 + (i % 8), 3 + (i % 5)
            assert (feats[i].width, feats[i].height) == ((w + 1) // 2, (h + 1) // 2)
        elif i % 3 == 1:  # audio untouched
            assert feats[i].sample_rate == 8000 * (1 + i % 3)
        else:  # video untouched
            assert feats[i].n_frames == 2 + i % 4


def test_explode_video_frames_operator(spark):
    media = M.synthetic_media(spark, n=12)
    frames = M.explode_video_frames(media, every_n=2)
    rows = {r.media_id: r for r in frames.collect()}
    # videos are ids 2,5,8,11 with 2+i%4 frames -> ceil(n/2) sampled each
    expect_ids = set()
    for i in (2, 5, 8, 11):
        n = 2 + i % 4
        expect_ids |= {i * 1000 + j * 2 for j in range((n + 1) // 2)}
    assert set(rows) == expect_ids
    assert all(r.kind == "image" for r in rows.values())
    feats = M.media_features(frames).collect()
    assert all(f.err is None and f.width == 8 for f in feats)
    # composes with resize: frames -> half-size images
    half = {r.media_id: r for r in M.media_features(M.resize_images(frames, 2)).collect()}
    assert all(r.width == 4 and r.height == 3 for r in half.values())


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_png_decodes_and_resizes_without_pil():
    """Real PNG payloads decode and resize through the pure-Python codec
    (stdlib zlib + spec §9 unfiltering) — no Pillow needed (VERDICT r7
    task #8; this was the PIL-gated skip test)."""
    png = M.encode_png(8, 6, bytes([10, 20, 30]) * 48)
    info = M.decode_image(png)
    assert (info["width"], info["height"]) == (8, 6)
    assert abs(info["mean_byte"] - 20.0) < 1e-9  # mean of (10,20,30)

    half = M.resize_image(png, 2)
    info2 = M.decode_image(half)
    assert (info2["width"], info2["height"]) == (4, 3)
    assert abs(info2["mean_byte"] - 20.0) < 1e-9


def test_png_all_filter_types_roundtrip():
    """encode(filters cycling None/Sub/Up/Average/Paeth) → decode must be
    the identity on the pixel bytes — every unfilter branch exercised,
    and the synthesized fixture matches the PPM twin's stats."""
    for w, h, seed in ((7, 5, 3), (4, 8, 0), (16, 16, 9)):
        rgb = bytes(
            (x * 3 + ch + seed) % 256
            for x in range(w * h)
            for ch in range(3)
        )
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            png = M.encode_png(w, h, rgb, filters=filters)
            gw, gh, got = M._png_to_rgb(png)
            assert (gw, gh) == (w, h)
            assert got == rgb, f"filters={filters}"
        # decode_png and decode_ppm agree on the shared pixel pattern
        dp = M.decode_png(M.synthesize_png(w, h, seed=seed))
        dm = M.decode_ppm(M.synthesize_ppm(w, h, seed=seed))
        assert dp == dm


def test_png_gray_palette_alpha_color_types():
    """Color types 0 (gray), 3 (palette), 4 (gray+alpha), 6 (RGBA) all
    normalize to RGB exactly like PIL convert('RGB') would."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def png(colortype, scanlines, plte=None):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, colortype, 0, 0, 0)
        out = M.PNG_SIG + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        out += chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")
        return out

    # gray 2x2: values 1,2 / 3,4 -> each replicates to RGB
    g = png(0, b"\x00\x01\x02" + b"\x00\x03\x04")
    assert M._png_to_rgb(g)[2] == bytes([1] * 3 + [2] * 3 + [3] * 3 + [4] * 3)
    # gray+alpha: alpha dropped
    ga = png(4, b"\x00\x01\xff\x02\x80" + b"\x00\x03\x00\x04\x10")
    assert M._png_to_rgb(ga)[2] == bytes([1] * 3 + [2] * 3 + [3] * 3 + [4] * 3)
    # RGBA: alpha dropped
    rgba = png(
        6,
        b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0])
        + b"\x00" + bytes([7, 8, 9, 128, 10, 11, 12, 64]),
    )
    assert M._png_to_rgb(rgba)[2] == bytes(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    )
    # palette: indexes resolve through PLTE
    plte = bytes([9, 9, 9, 1, 2, 3])
    pal = png(3, b"\x00\x00\x01" + b"\x00\x01\x00", plte=plte)
    assert M._png_to_rgb(pal)[2] == bytes(
        [9, 9, 9, 1, 2, 3, 1, 2, 3, 9, 9, 9]
    )


def test_png_corrupt_payloads_fail_loudly():
    png = bytearray(M.synthesize_png(4, 4, seed=1))
    png[30] ^= 0xFF  # flip a byte inside IHDR/IDAT territory
    with pytest.raises(ValueError):
        M.decode_png(bytes(png))
    with pytest.raises(ValueError):
        M.decode_png(M.PNG_SIG + b"\x00\x00\x00\x04AAAA")
    # truncated JPEG fails loudly through the native decoder (no PIL needed)
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0JFIF")
    with pytest.raises(ValueError):
        M.resize_image(b"\xff\xd8\xff\xe0JFIF", 2)


def _png_chunk(typ, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def test_png_16bit_decodes_high_byte():
    """16-bit RGB PNGs decode without PIL (r8 VERDICT task #4): each
    16-bit big-endian sample reduces to its high byte."""
    import struct
    import zlib

    # 2x2 RGB, 16-bit: sample value v*256+0x7f -> high byte v
    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    rows = []
    for y in range(2):
        row = b"\x00"  # filter None
        for x in range(2):
            for v in px[y * 2 + x]:
                row += struct.pack(">H", v * 256 + 0x7F)
        rows.append(row)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png = (
        M.PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    w, h, rgb = M._png_to_rgb(png)
    assert (w, h) == (2, 2)
    assert rgb == bytes(v for p in px for v in p)
    # 16-bit Sub filter: bpp is 6 bytes, not 3 — the filter offset must
    # track bytes-per-pixel, not channels
    sub_rows = []
    for y in range(2):
        raw = b"".join(
            struct.pack(">H", v * 256) for v in px[y * 2] + px[y * 2 + 1]
        )
        line = bytearray(raw)
        for x in range(len(line) - 1, 5, -1):
            line[x] = (line[x] - line[x - 6]) & 0xFF
        sub_rows.append(b"\x01" + bytes(line))
    png_sub = (
        M.PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(sub_rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert M._png_to_rgb(png_sub)[2] == bytes(v for p in px for v in p)


def _adam7_interlaced_png(w, h, rgb):
    """Re-encode an RGB8 image as an Adam7-interlaced PNG (filter-None
    rows per pass) — the fixture generator for the interlace decoder."""
    import struct
    import zlib

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for py in range(ph):
            raw.append(0)  # filter None
            y = y0 + py * dy
            for px_i in range(pw):
                x = x0 + px_i * dx
                raw += rgb[(y * w + x) * 3 : (y * w + x) * 3 + 3]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        M.PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_adam7_interlace_decodes():
    """Adam7-interlaced PNGs decode without PIL (r8 VERDICT task #4):
    the 7 sub-images scatter back to the exact progressive-free pixels,
    including edge shapes where late passes are empty."""
    for w, h in [(8, 8), (9, 7), (3, 3), (1, 1), (2, 5)]:
        rgb = bytes((x * 7 + c * 3) % 256 for x in range(w * h) for c in range(3))
        got = M._png_to_rgb(_adam7_interlaced_png(w, h, rgb))
        assert got == (w, h, rgb), f"{w}x{h}"
    # decode_image routes interlaced payloads too
    rgb = bytes(range(8 * 8 * 3 % 256)) * 0 + bytes(
        (i * 5) % 256 for i in range(8 * 8 * 3)
    )
    d = M.decode_image(_adam7_interlaced_png(8, 8, rgb))
    assert d["width"] == 8 and d["n_pixels"] == 64


def _packed_png(w, h, depth, colortype, samples, plte=None, filters=None):
    """Encode left-packed depth-bit samples (MSB-first, row-padded) as a
    non-interlaced PNG; ``filters`` optionally cycles per-row filter
    types (applied byte-wise with bpp=1, exactly what the decoder must
    reverse)."""
    import struct
    import zlib

    stride = (w * depth + 7) // 8
    prev = bytes(stride)
    raw = bytearray()
    for y in range(h):
        row = bytearray(stride)
        for x in range(w):
            v = samples[y * w + x]
            row[(x * depth) // 8] |= v << (8 - depth - (x * depth) % 8)
        ftype = filters[y % len(filters)] if filters else 0
        raw.append(ftype)
        if ftype == 0:
            raw += row
        elif ftype == 1:  # Sub with bpp=1
            raw += bytes(
                (row[x] - (row[x - 1] if x >= 1 else 0)) & 0xFF
                for x in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        else:
            raise ValueError("unsupported fixture filter")
        prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, colortype, 0, 0, 0)
    chunks = M.PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _png_chunk(b"PLTE", plte)
    return (
        chunks
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_packed_gray_depths_decode():
    """1/2/4-bit grayscale PNGs decode without PIL: MSB-first unpacking,
    row-end pad bits ignored, samples rescaled v*255//(2^d-1)."""
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        w, h = 11, 3  # 11 samples/row → padded final byte at every depth
        samples = [(x * 3 + y) % (maxv + 1) for y in range(h) for x in range(w)]
        got = M._png_to_rgb(_packed_png(w, h, depth, 0, samples))
        want = bytes(b for v in samples for b in ((v * 255) // maxv,) * 3)
        assert got == (w, h, want), f"depth {depth}"


def test_png_packed_filters_and_palette():
    """Packed rows unfilter byte-wise (bpp=1) — Sub/Up on a 2-bit palette
    image reverse exactly; palette indexes resolve through PLTE."""
    w, h = 9, 4
    samples = [(x + y) % 4 for y in range(h) for x in range(w)]
    plte = bytes(range(12))  # 4 RGB entries: (0,1,2),(3,4,5),...
    png = _packed_png(w, h, 2, 3, samples, plte=plte, filters=[0, 1, 2])
    got = M._png_to_rgb(png)
    want = bytes(plte[3 * v + c] for v in samples for c in range(3))
    assert got == (w, h, want)
    # decode_image routes packed payloads end-to-end
    d = M.decode_image(png)
    assert d["width"] == w and d["n_pixels"] == w * h


def test_png_packed_adam7_decodes():
    """Adam7-interlaced 1-bit PNG: each pass's scanlines are packed at the
    PASS width (pstride = ceil(pw*depth/8)), then scattered to the grid."""
    import struct
    import zlib

    w, h = 10, 9
    samples = [(x ^ y) & 1 for y in range(h) for x in range(w)]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        pstride = (pw + 7) // 8
        for py in range(ph):
            raw.append(0)
            row = bytearray(pstride)
            for px in range(pw):
                v = samples[(y0 + py * dy) * w + (x0 + px * dx)]
                row[px // 8] |= v << (7 - px % 8)
            raw += row
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)
    png = (
        M.PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    got = M._png_to_rgb(png)
    want = bytes(b for v in samples for b in (v * 255,) * 3)
    assert got == (w, h, want)


def test_png_packed_rgb_is_invalid():
    """Packed depths with a truecolor type are spec-invalid → ValueError,
    not a wrong decode."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    png = (
        M.PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x00\x01"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        M.decode_png(png)


def test_truncated_payloads_become_err_rows_not_task_failures(spark):
    """Malformed bytes that raise IndexError/struct.error inside a decoder
    (out-of-bounds segment reads) must land in the err channel like the
    typed decode errors do (ADVICE r10 #3)."""
    from pixels_spark.functions import flac as FL
    from pixels_spark.functions import jpeg as J

    # truncated Adobe APP14 (length-checked → ValueError, not IndexError)
    app14 = bytes.fromhex("ffd8") + b"\xff\xee\x00\x07Adobe" + bytes.fromhex("ffd9")
    with pytest.raises(ValueError, match="APP14"):
        J.decode_jpeg(app14)
    # byte-truncated FLAC metadata / JPEG segments raise whatever the
    # index math hits; the seam must convert ALL of them to err rows
    flac = FL.synthesize_flac(n_samples=256, block_size=256)
    jpg = next(
        bytes(r.payload)
        for r in M.synthetic_media(spark, n=3).collect()
        if r.kind == "image"
    )
    bad = spark.createDataFrame(
        [
            (1, "audio", flac[:20], "{}"),   # mid-STREAMINFO cut
            (2, "image", app14, "{}"),
            (3, "image", jpg[: len(jpg) // 2], "{}"),
            (4, "audio", flac, "{}"),        # control: still decodes
        ],
        M.MEDIA_SCHEMA,
    )
    feats = {r.media_id: r for r in M.media_features(bad).collect()}
    assert len(feats) == 4
    assert feats[1].err is not None
    assert feats[2].err is not None
    assert feats[3].err is not None
    assert feats[4].err is None and feats[4].sample_rate == 16000
