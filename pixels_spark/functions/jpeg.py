"""JPEG (JFIF, SOF0 baseline + SOF2 progressive) codec — pure Python +
numpy, no PIL.

The multimodal seam's image decoders were PPM and PNG (pure-Python);
JPEG — the dominant real-world format — previously raised
NotImplementedError without PIL (VERDICT r8 task #3 added baseline,
r9 task #2 added progressive). Architecture: every scan decodes into a
per-component zigzag coefficient store; dequantize → inverse zigzag →
IDCT → chroma upsample → YCbCr→RGB happen once at EOI. Baseline is the
degenerate single full-band scan of that model, so both frame types
share one decode path. The fixture encoder (the ``encode_png``
precedent) emits both frame types, including a full progressive scan
script (spectral selection + successive approximation), so tests
round-trip through both directions without any media library.

Supported: baseline DCT (SOF0/1) and progressive DCT (SOF2: spectral
selection, successive approximation, EOB runs), 8- AND 12-bit sample
precision (12-bit reduces to 8-bit RGB by dropping the extra bits — the
PNG 16-bit high-byte precedent), 1/3/4 components (4-component =
Adobe CMYK and YCCK via the APP14 transform marker), any sampling
factors (4:4:4 / 4:2:2 / 4:2:0 decode via replication upsample),
restart intervals. Not supported (documented NotImplementedError):
arithmetic coding, lossless (SOF3), hierarchical, 4-component streams
without an Adobe APP14 marker.

Reference surface: the reference stores media as VARBINARY and leaves
codec work to the pipeline (``pixels-core/.../TypeDescription.java:218``
VECTOR/multimodal north star); decode math follows ITU-T T.81 §A.3/§F.2
and the JFIF 1.02 color transform.

Scale note: this runs INSIDE ``mapInPandas`` batches (see
``multimodal.media_features``) — per-row Python decode cost is the same
trade the PNG path makes; the Spark-side contract (Arrow batching,
O(batch) executor memory, error-channel rows) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag index -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: C[u, x] = a(u) cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _HuffTable:
    """Canonical JPEG Huffman table from DHT (BITS[16] + HUFFVAL)."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker (restart handled by caller
    via ``sync_restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # hit a marker — per spec, pad with 1-bits (the block
                    # loop should have consumed everything; be lenient)
                    self.pos -= 1
                    b = 0xFF
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    """ITU-T T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_to_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to
    (width, height, raw RGB bytes). Grayscale replicates to 3 channels
    (PIL ``convert("RGB")`` parity).

    Both frame types share one path: every scan decodes into a per-
    component ZIGZAG-order coefficient store (baseline is simply the
    single full-band Ss=0..Se=63 Ah=Al=0 scan), and dequantize/IDCT/
    upsample/color happen once at EOI — exactly T.81's model, where
    progressive scans successively refine the same coefficient arrays."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, comps) ; comps: [(cid, hs, vs, tq)]
    coefs: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag order
    restart_interval = 0
    adobe_transform = None  # APP14: 0=CMYK-direct, 1=YCbCr, 2=YCCK
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                nat = np.empty(64)
                nat[ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec not in (8, 12):
                raise NotImplementedError(
                    "only 8- and 12-bit JPEG precision decode"
                )
            if nc not in (1, 3, 4):
                raise NotImplementedError(
                    f"{nc}-component JPEG does not decode without PIL"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps, prec)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = {
                cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                for cid, hs, vs, _tq in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline (SOF0/1) and "
                "progressive (SOF2) decode without PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            if len(seg) < 12:
                raise ValueError("JPEG APP14 Adobe segment truncated")
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_scan_into(
                payload, pos + seglen, frame, scan,
                (ss, se, ahal >> 4, ahal & 0x0F),
                coefs, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen
    if frame is None or not coefs:
        raise ValueError("JPEG missing SOS scan")
    return _coefs_to_rgb(frame, coefs, qt, adobe_transform)


def _decode_dc_first(br, dc_tbl, zz, pred_box, al):
    t = dc_tbl.decode(br)
    diff = _extend(br.receive(t), t)
    pred_box[0] += diff
    zz[0] = pred_box[0] << al


def _decode_ac_first(br, ac_tbl, zz, ss, se, al, eobrun):
    """T.81 §G.1.2.2 (degenerates to §F.2.2 baseline AC when ss=1, se=63,
    al=0: an EOB symbol sets eobrun = 1-1 = 0). Returns the new eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac_tbl.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.receive(r)
            return eobrun - 1  # current block is one of them
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(br, ac_tbl, zz, ss, se, al, eobrun):
    """T.81 §G.1.2.3 successive-approximation AC refinement: each known-
    nonzero coefficient traversed reads one correction bit; runs count
    only zero-history positions; EOB runs carry the tail's correction
    bits. Returns the new eobrun."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_tbl.decode(br)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # ZRL: skip 16 zero-history positions (correcting en route)
            else:
                if s != 1:
                    raise ValueError(
                        "JPEG AC refinement magnitude must be 1"
                    )
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and not (zz[k] & p1):
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read_bit() and not (zz[k] & p1):
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_into(
    data, pos, frame, scan, params, coefs, huff_dc, huff_ac, restart_interval
):
    """Decode one scan's entropy-coded data into the zigzag coefficient
    store; returns the stream position of the next marker."""
    w, h, comps = frame[:3]
    ss, se, ah, al = params
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {cid: (cid, hs, vs, tq) for cid, hs, vs, tq in comps}
    dc_of = {cs: huff_dc.get(td) for cs, td, _ta in scan}
    ac_of = {cs: huff_ac.get(ta) for cs, _td, ta in scan}
    br = _BitReader(data, pos)
    pred = {cid: [0] for cid, *_ in comps}
    eobrun = 0
    unit = 0  # restart counter: MCUs (interleaved) or blocks (single-comp)

    def maybe_restart():
        nonlocal pred, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            br.sync_restart()
            pred = {cid: [0] for cid, *_ in comps}
            eobrun = 0

    def decode_block(cs, zz):
        nonlocal eobrun
        if ss == 0:
            if ah == 0:
                _decode_dc_first(br, dc_of[cs], zz, pred[cs], al)
                if se > 0:  # baseline: full-band scan continues with AC
                    eobrun = _decode_ac_first(
                        br, ac_of[cs], zz, 1, se, al, eobrun
                    )
            else:  # DC refinement: one raw bit per block
                if br.read_bit():
                    zz[0] |= 1 << al
        elif ah == 0:
            eobrun = _decode_ac_first(br, ac_of[cs], zz, ss, se, al, eobrun)
        else:
            eobrun = _decode_ac_refine(br, ac_of[cs], zz, ss, se, al, eobrun)

    if len(scan) > 1:  # interleaved: MCU order across the scan's components
        order = [by_id[cs] for cs, *_ in scan]
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for cid, hs, vs, _tq in order:
                    arr = coefs[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            decode_block(
                                cid, arr[my * vs + by, mx * hs + bx]
                            )
                unit += 1
    else:  # single-component scan: raster over the component's own blocks
        cid, hs, vs, _tq = by_id[scan[0][0]]
        comp_w = -(-(w * hs) // hmax)  # ceil(w*hs/hmax): T.81 A.1.1
        comp_h = -(-(h * vs) // vmax)
        nbx = -(-comp_w // 8)
        nby = -(-comp_h // 8)
        arr = coefs[cid]
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                decode_block(cid, arr[by, bx])
                unit += 1

    # advance past any trailing bits/RSTn to the next marker
    p = br.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _coefs_to_rgb(frame, coefs, qt, adobe_transform=None):
    """Dequantize + inverse-zigzag + IDCT every stored block (vectorized),
    upsample by replication, color-convert — the shared finish for both
    baseline and progressive frames. 12-bit frames run the same math at
    the 0..4095 range (level shift 2048) and reduce to 8-bit RGB by
    dropping the 4 extra bits — the PNG 16-bit high-byte precedent.
    4-component frames follow the Adobe APP14 convention (values stored
    inverted): transform 2 = YCCK (YCbCr→inverted-CMY first), else
    direct CMYK; RGB = channel·K/max — PIL's quick CMYK merge."""
    w, h, comps, prec = frame
    mid = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, tq in comps:
        zz = coefs[cid].astype(np.float64)  # (by, bx, 64) zigzag
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        nby, nbx = nat.shape[:2]
        blocks = nat.reshape(nby, nbx, 8, 8) * qt[tq]
        # batched IDCT: C.T @ B @ C over every block
        px = np.einsum("ab,ijbc,cd->ijad", _C.T, blocks, _C) + mid
        plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, maxv)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    elif len(full) == 4:
        if adobe_transform is None:
            raise NotImplementedError(
                "4-component JPEG without an Adobe APP14 marker"
            )
        if adobe_transform == 2:  # YCCK
            y, cb, cr = full[0], full[1] - mid, full[2] - mid
            c = y + 1.402 * cr
            m = y - 0.344136 * cb - 0.714136 * cr
            ye = y + 1.772 * cb
        else:  # CMYK stored directly
            c, m, ye = full[0], full[1], full[2]
        k = np.clip(full[3], 0, maxv)
        r = np.clip(c, 0, maxv) * k / maxv
        g = np.clip(m, 0, maxv) * k / maxv
        b = np.clip(ye, 0, maxv) * k / maxv
        rgb = np.stack([r, g, b], axis=2)
    else:
        y, cb, cr = full[0], full[1] - mid, full[2] - mid
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
    out = np.clip(np.rint(rgb), 0, maxv).astype(np.int64)
    if prec > 8:
        out >>= prec - 8
    return w, h, out.astype(np.uint8).tobytes()


def decode_jpeg(payload: bytes) -> dict:
    """JPEG decode without PIL — same dict shape as ``decode_ppm`` /
    ``decode_png`` so every downstream seam is codec-agnostic."""
    w, h, rgb = _jpeg_to_rgb(payload)
    return {
        "width": w,
        "height": h,
        "maxval": 255,
        "n_pixels": w * h,
        "mean_byte": (sum(rgb) / len(rgb)) if rgb else 0.0,
    }


# ---------------------------------------------------------------------------
# Fixture encoder — baseline sequential, flat quant (quality-controlled),
# simple valid Huffman tables written into DHT (the decoder reads whatever
# the file declares, so fixture tables need not be the Annex-K ones).

# DC: all 12 categories as 4-bit codes (BITS[4] = 12). AC: all 162
# run/size symbols as 8-bit codes (BITS[8] = 162) — canonical, valid,
# deliberately simple.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]

# Progressive AC table additionally needs the EOBn symbols (r<<4, r=1..14)
# for EOB-run lengths 2..32767 — 176 8-bit codes, still canonical-valid
# (baseline keeps the original table so its bitstreams stay bit-stable).
_AC_SYMBOLS_PROG = bytes(
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]

# 12-bit precision needs wider code alphabets: DC categories to 15
# (diff range ±4095) and AC sizes to 14 (T.81 table F.2) — 226 baseline
# / 240 progressive 8-bit codes, still canonical-valid (< 255).
_DC_BITS12 = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS12 = bytes(range(16))
_AC_SYMBOLS12 = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_AC_BITS12 = [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS12_PROG = bytes(
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_AC_BITS12_PROG = [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0]


def _fixture_tables(precision: int, progressive: bool):
    """(dc_bits, dc_vals, ac_bits, ac_syms) for the fixture encoders —
    the 8-bit baseline alphabet is unchanged so its bitstreams (and the
    golden pins on them) stay bit-stable."""
    if precision == 8:
        if progressive:
            return _DC_BITS, _DC_VALS, _AC_BITS_PROG, _AC_SYMBOLS_PROG
        return _DC_BITS, _DC_VALS, _AC_BITS, _AC_SYMBOLS
    if progressive:
        return _DC_BITS12, _DC_VALS12, _AC_BITS12_PROG, _AC_SYMBOLS12_PROG
    return _DC_BITS12, _DC_VALS12, _AC_BITS12, _AC_SYMBOLS12


def _encode_table(bits, values):
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1-bits
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
    diff = int(coef_zz[0]) - pred
    t = _category(diff)
    bw.write(*dc_codes[t])
    if t:
        bw.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last = k
            break
    for k in range(1, last + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = _category(v)
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if last < 63:
        bw.write(*ac_codes[0x00])  # EOB
    return int(coef_zz[0])


def _enc_dc_first(bw, zz, pred: int, al: int, dc_codes) -> int:
    """Encode one block's DC at precision Al (arithmetic shift — T.81
    G.1.2.1 point transform for DC); returns the new predictor."""
    v = int(zz[0]) >> al
    diff = v - pred
    t = _category(diff)
    bw.write(*dc_codes[t])
    if t:
        bw.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
    return v


def _flush_eobrun(bw, eobrun: int, ac_codes, pending=None) -> int:
    if eobrun:
        r = eobrun.bit_length() - 1
        bw.write(*ac_codes[r << 4])
        if r:
            bw.write(r, eobrun - (1 << r))
    if pending:
        for b in pending:
            bw.write(1, b)
        pending.clear()
    return 0


def _enc_ac_first_scan(bw, blocks, ss, se, al, ac_codes) -> None:
    """First AC scan of a band at precision Al (truncate-toward-zero
    point transform — T.81 G.1.2.2), with cross-block EOB runs."""
    eobrun = 0
    for zz in blocks:
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            av = abs(v) >> al
            if av == 0:
                run += 1
                continue
            eobrun = _flush_eobrun(bw, eobrun, ac_codes)
            while run > 15:
                bw.write(*ac_codes[0xF0])
                run -= 16
            sv = av if v >= 0 else -av
            s = _category(sv)
            bw.write(*ac_codes[(run << 4) | s])
            bw.write(s, sv if sv >= 0 else sv + (1 << s) - 1)
            run = 0
        if run:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, ac_codes)
    _flush_eobrun(bw, eobrun, ac_codes)


def _enc_ac_refine_scan(bw, blocks, ss, se, al, ac_codes) -> None:
    """Successive-approximation AC refinement scan (T.81 G.1.2.3):
    newly-significant coefficients emit (run|1)+sign with runs counting
    zero-history positions only; known-nonzero coefficients contribute
    correction bits buffered until the next emitted symbol (incl. the
    EOB run covering a block's tail)."""
    eobrun = 0
    pending: list[int] = []  # correction bits riding the open EOB run
    for zz in blocks:
        av = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob_pos = 0  # index AFTER the last newly-significant coefficient
        for i, a in enumerate(av):
            if a == 1:
                eob_pos = i + 1
        run = 0
        bits: list[int] = []  # correction bits since the last symbol
        for i in range(eob_pos):
            a = av[i]
            if a == 0:
                run += 1
                continue
            # ZRL check precedes buffering this position's own bit, so a
            # ZRL's buffered bits lie within its 16-zero span (G.1.2.3)
            while run > 15:
                eobrun = _flush_eobrun(bw, eobrun, ac_codes, pending)
                bw.write(*ac_codes[0xF0])
                run -= 16
                for b in bits:
                    bw.write(1, b)
                bits = []
            if a > 1:
                bits.append(a & 1)
                continue
            eobrun = _flush_eobrun(bw, eobrun, ac_codes, pending)
            bw.write(*ac_codes[(run << 4) | 1])
            bw.write(1, 1 if int(zz[ss + i]) > 0 else 0)
            for b in bits:
                bw.write(1, b)
            bits = []
            run = 0
        if eob_pos <= se - ss:  # block tail exists → folds into the EOB run
            eobrun += 1
            pending.extend(a & 1 for a in av[eob_pos:] if a > 1)
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, ac_codes, pending)
    _flush_eobrun(bw, eobrun, ac_codes, pending)


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quant: int = 4,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
    progressive: bool = False,
    precision: int = 8,
    cmyk: str | None = None,
) -> bytes:
    """Minimal baseline JFIF encoder (numpy FDCT + flat quantization).
    ``subsample=True`` emits 4:2:0 (2×2-mean chroma downsample);
    ``restart_interval`` (in MCUs) emits DRI + RSTn markers so the
    decoder's restart path is testable; ``grayscale=True`` emits a
    1-component scan (luma only); ``progressive=True`` emits SOF2 with
    a full spectral-selection + successive-approximation scan script
    (DC first Al=1 → per-band AC first Al=1 → DC refine → per-band AC
    refine), exercising every progressive decode path;
    ``precision=12`` scales the 8-bit input to the 0..4095 sample range
    (×16, level shift 2048) with the wider Huffman alphabets 12-bit
    streams need. Fixture-grade by design — the decoder must handle any
    SPEC-VALID stream, this produces one."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if cmyk is not None:
        # ``cmyk='cmyk'`` stores the Adobe-inverted channels directly
        # (C=R, M=G, Y=B, K=255 i.e. no black ink — decodes back to the
        # source RGB); ``'ycck'`` routes them through the YCbCr
        # transform first (Adobe transform 2). Baseline 4:4:4 8-bit.
        if cmyk not in ("cmyk", "ycck"):
            raise ValueError("cmyk must be None, 'cmyk' or 'ycck'")
        if progressive or subsample or grayscale or precision != 8:
            raise ValueError(
                "cmyk fixture encoder is baseline 4:4:4 8-bit only"
            )
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if precision == 12:
        # ×16 scales the whole YCbCr transform linearly: 16·cb8 =
        # 2048 + 16·(chroma part) — exactly the 12-bit representation
        y, cb, cr = y * 16.0, cb * 16.0, cr * 16.0
    mid = float(1 << (precision - 1))

    hs = vs = 2 if (subsample and not grayscale) else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux, mcuy = -(-width // mcu_w), -(-height // mcu_h)

    def pad(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    y = pad(y, mcuy * mcu_h, mcux * mcu_w)
    if subsample:
        cbp = pad(cb, mcuy * mcu_h, mcux * mcu_w)
        crp = pad(cr, mcuy * mcu_h, mcux * mcu_w)
        cb = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        cr = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cb = pad(cb, mcuy * 8, mcux * 8)
        cr = pad(cr, mcuy * 8, mcux * 8)

    q = np.full((8, 8), float(quant))
    if progressive:
        if restart_interval:
            raise ValueError(
                "progressive fixture encoder does not emit restart markers"
            )
        return _encode_progressive(
            width, height, y, cb, cr, q, hs, vs, mcux, mcuy, grayscale,
            precision,
        )
    dc_bits, dc_vals, ac_bits, ac_syms = _fixture_tables(precision, False)
    dc_codes = _encode_table(dc_bits, dc_vals)
    ac_codes = _encode_table(ac_bits, ac_syms)

    def block_zz(plane, y0, x0):
        blk = plane[y0 : y0 + 8, x0 : x0 + 8] - mid
        coef = np.rint(_fdct2(blk) / q).astype(np.int64).reshape(64)
        return coef[ZIGZAG]  # natural order -> zigzag scan order

    if cmyk is not None:
        kpl = pad(np.full((height, width), 255.0), mcuy * 8, mcux * 8)
        if cmyk == "cmyk":
            comp_list = [
                (1, pad(r, mcuy * 8, mcux * 8), 1, 1),
                (2, pad(g, mcuy * 8, mcux * 8), 1, 1),
                (3, pad(b, mcuy * 8, mcux * 8), 1, 1),
                (4, kpl, 1, 1),
            ]
        else:  # ycck: the YCbCr planes of the inverted-CMY channels
            comp_list = [(1, y, 1, 1), (2, cb, 1, 1), (3, cr, 1, 1), (4, kpl, 1, 1)]
    elif grayscale:
        comp_list = [(1, y, hs, vs)]
    else:
        comp_list = [(1, y, hs, vs), (2, cb, 1, 1), (3, cr, 1, 1)]

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comp_list}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = {cid: 0 for cid, *_ in comp_list}
            for cid, plane, chs, cvs in comp_list:
                for by in range(cvs):
                    for bx in range(chs):
                        zz = block_zz(
                            plane, (my * cvs + by) * 8, (mx * chs + bx) * 8
                        )
                        pred[cid] = _encode_block(
                            bw, zz, pred[cid], dc_codes, ac_codes
                        )
            mcu_count += 1
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_q = q.reshape(64)[ZIGZAG]  # natural -> zigzag order for DQT
    dqt = seg(0xDB, b"\x00" + bytes(int(v) for v in zz_q))
    nc = len(comp_list)
    sof_body = (
        bytes([precision])
        + struct.pack(">HH", height, width)
        + bytes([nc])
        + b"".join(
            bytes([cid, (chs << 4) | cvs, 0])
            for cid, _p, chs, cvs in comp_list
        )
    )
    sos_body = (
        bytes([nc])
        + b"".join(bytes([cid, 0x00]) for cid, *_ in comp_list)
        + b"\x00\x3f\x00"
    )
    sof = seg(0xC0, sof_body)
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_bits) + dc_vals
        + b"\x10" + bytes(ac_bits) + ac_syms,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, sos_body)
    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    app14 = (
        seg(
            0xEE,
            b"Adobe\x00\x64\x00\x00\x00\x00"
            + bytes([0 if cmyk == "cmyk" else 2]),
        )
        if cmyk
        else b""
    )
    return (
        b"\xff\xd8" + app0 + app14 + dqt + dht + sof + dri + sos
        + bytes(bw.out) + b"\xff\xd9"
    )


def _encode_progressive(
    width, height, y, cb, cr, q, hs, vs, mcux, mcuy, grayscale,
    precision=8,
):
    """SOF2 scan script: interleaved DC first (Al=1) → per-component
    AC first over bands 1-5 and 6-63 (Al=1) → interleaved DC refine →
    per-component AC refine per band (Ah=1, Al=0). Covers spectral
    selection, successive approximation, EOB runs, and both interleaved
    and single-component scan geometries."""
    dc_bits, dc_vals, ac_bits, ac_syms = _fixture_tables(precision, True)
    dc_codes = _encode_table(dc_bits, dc_vals)
    ac_codes = _encode_table(ac_bits, ac_syms)
    mid = float(1 << (precision - 1))

    def blocks_of(plane):
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - mid
                coef = np.rint(_fdct2(blk) / q).astype(np.int64).reshape(64)
                arr[by, bx] = coef[ZIGZAG]
        return arr

    comps = [(1, blocks_of(y), hs, vs)]
    if not grayscale:
        comps += [(2, blocks_of(cb), 1, 1), (3, blocks_of(cr), 1, 1)]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(cids, ss, se, ah, al):
        body = bytes([len(cids)])
        for cid in cids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, arr, chs, cvs in comps:
                    for by in range(cvs):
                        for bx in range(chs):
                            yield cid, arr[my * cvs + by, mx * chs + bx]

    def used_blocks(arr, chs, cvs):
        # non-interleaved scans cover only the component's own block grid
        # (T.81 A.1.1), which can be narrower than the padded MCU grid
        comp_w = -(-(width * chs) // hmax)
        comp_h = -(-(height * cvs) // vmax)
        nbx = -(-comp_w // 8)
        nby = -(-comp_h // 8)
        return [arr[by, bx] for by in range(nby) for bx in range(nbx)]

    out = bytearray()
    all_cids = [cid for cid, *_ in comps]
    bands = [(1, 5), (6, 63)]

    bw = _BitWriter()
    pred = {cid: 0 for cid in all_cids}
    for cid, zz in mcu_blocks():
        pred[cid] = _enc_dc_first(bw, zz, pred[cid], 1, dc_codes)
    bw.flush()
    out += sos(all_cids, 0, 0, 0, 1) + bytes(bw.out)

    for cid, arr, chs, cvs in comps:
        blks = used_blocks(arr, chs, cvs)
        for ss, se in bands:
            bw = _BitWriter()
            _enc_ac_first_scan(bw, blks, ss, se, 1, ac_codes)
            bw.flush()
            out += sos([cid], ss, se, 0, 1) + bytes(bw.out)

    bw = _BitWriter()
    for _cid, zz in mcu_blocks():
        bw.write(1, int(zz[0]) & 1)  # Al=0 refinement bit of the DC
    bw.flush()
    out += sos(all_cids, 0, 0, 1, 0) + bytes(bw.out)

    for cid, arr, chs, cvs in comps:
        blks = used_blocks(arr, chs, cvs)
        for ss, se in bands:
            bw = _BitWriter()
            _enc_ac_refine_scan(bw, blks, ss, se, 0, ac_codes)
            bw.flush()
            out += sos([cid], ss, se, 1, 0) + bytes(bw.out)

    zz_q = q.reshape(64)[ZIGZAG]
    dqt = seg(0xDB, b"\x00" + bytes(int(v) for v in zz_q))
    hv_y = (hs << 4) | vs
    if grayscale:
        sof_body = (
            bytes([precision]) + struct.pack(">HH", height, width) + b"\x01"
            + bytes([1, hv_y, 0])
        )
    else:
        sof_body = (
            bytes([precision]) + struct.pack(">HH", height, width) + b"\x03"
            + bytes([1, hv_y, 0, 2, 0x11, 0, 3, 0x11, 0])
        )
    sof = seg(0xC2, sof_body)
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_bits) + dc_vals
        + b"\x10" + bytes(ac_bits) + ac_syms,
    )
    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + dqt + dht + sof + bytes(out) + b"\xff\xd9"
    )


def synthesize_jpeg(width: int, height: int, seed: int = 0, **kw) -> bytes:
    """Deterministic JPEG fixture with the shared synthetic pixel
    pattern (see ``synthesize_ppm``/``synthesize_png``)."""
    rgb = bytes(
        (x * 3 + ch + seed) % 256
        for x in range(width * height)
        for ch in range(3)
    )
    return encode_jpeg(width, height, rgb, **kw)
