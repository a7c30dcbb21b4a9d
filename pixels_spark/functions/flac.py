"""FLAC codec — pure Python, stdlib only (no soundfile/librosa).

The audio seam decoded WAV only; MP3/OGG genuinely need ffmpeg-class
libraries, but FLAC is a lossless container whose decode is pure integer
math — Rice-coded residuals of fixed or LPC predictors — making it
stdlib-feasible the way PNG and JPEG were (VERDICT r9 task #3). This
module implements:

- a REAL decoder: fLaC magic → metadata blocks (STREAMINFO parsed, rest
  skipped) → frames (header with UTF-8-coded frame number, CRC-8) →
  subframes (CONSTANT / VERBATIM / FIXED orders 0-4 / LPC any order,
  wasted-bits), partitioned Rice residuals (4- and 5-bit parameters,
  escape-to-raw partitions), stereo decorrelation (left-side /
  right-side / mid-side), frame CRC-16 verification, and the STREAMINFO
  MD5 check over the reassembled little-endian sample stream — a full
  end-to-end integrity proof, not a header skim.
- a fixture encoder (the ``encode_png``/``encode_jpeg`` precedent):
  fixed-predictor selection per channel, exact-cost Rice parameter
  search, optional Rice partitioning, escape partitions, and all four
  stereo modes — so tests round-trip sample-exactly through both
  directions without any media library.

Format follows the public FLAC format specification (RFC 9639 /
xiph.org); CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0.

Scale note: runs INSIDE ``mapInPandas`` batches (multimodal seam) —
same Arrow-batched, O(batch)-memory contract as the image codecs.
"""

from __future__ import annotations

import hashlib
import struct

_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                    4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                    2048: 0b1011, 4096: 0b1100, 8192: 0b1101,
                    16384: 0b1110, 32768: 0b1111}
_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (
                (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the NEXT byte to load
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, n: int, v: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(32, 0)
            q -= 32
        self.write(q + 1, 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(8 - self.nbits, 0)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                         (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
            out = [lead | (n >> (6 * (nbytes - 1)))] if nbytes < 7 else [0xFE]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for mask, val, nb in ((0xE0, 0xC0, 2), (0xF0, 0xE0, 3), (0xF8, 0xF0, 4),
                          (0xFC, 0xF8, 5), (0xFE, 0xFC, 6), (0xFF, 0xFE, 7)):
        if b0 & mask == val:
            nbytes = nb
            break
    if not nbytes:
        raise ValueError("bad FLAC frame-number coding")
    n = b0 & (0x7F >> nbytes) if nbytes < 7 else 0
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC frame-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _rice_read(br: _Bits, param: int) -> int:
    q = br.read_unary()
    z = (q << param) | br.read(param) if param else q
    return (z >> 1) ^ -(z & 1)  # zigzag decode


def _rice_write(bw: _BitsW, v: int, param: int) -> None:
    z = (v << 1) if v >= 0 else ((-v) << 1) - 1
    bw.write_unary(z >> param)
    if param:
        bw.write(param, z & ((1 << param) - 1))


def _read_residuals(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    if (blocksize >> po) <= order and po:
        raise ValueError("FLAC first partition would have no samples")
    res: list[int] = []
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            res.extend(
                br.read_signed(width) if width else 0 for _ in range(count)
            )
        else:
            res.extend(_rice_read(br, param) for _ in range(count))
    return res


def _decode_subframe(
    br: _Bits, blocksize: int, bps: int, types: list | None = None
) -> list[int]:
    if br.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    st = br.read(6)
    if types is not None:
        types.append(st)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count-1 follows
        wasted = br.read_unary() + 1
        bps -= wasted
    if st == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * blocksize
    elif st == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= st <= 12:  # FIXED, order st-8
        order = st - 8
        out = [br.read_signed(bps) for _ in range(order)]
        res = _read_residuals(br, blocksize, order)
        coef = _FIXED_COEF[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coef))
            out.append(pred + r)
    elif st >= 32:  # LPC, order (st & 31) + 1
        order = (st & 31) + 1
        out = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _read_residuals(br, blocksize, order)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coef)) >> shift
            out.append(pred + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {st}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> dict:
    """Full FLAC decode: returns channels / sample_rate / bits /
    n_samples / duration_s plus the decoded ``samples`` (list per
    channel). Verifies frame-header CRC-8, frame CRC-16 and, when the
    encoder stamped one, the STREAMINFO MD5 of the sample stream."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while pos + 4 <= len(payload):  # metadata blocks
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            ch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | struct.unpack(
                ">I", body[14:18]
            )[0]
            md5 = body[18:34]
            info = (sr, ch, bps, total, md5)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    sr, nch, bps, total, md5 = info

    channels: list[list[int]] = [[] for _ in range(nch)]
    sub_types: list[int] = []  # raw 6-bit subframe type codes seen
    ns = 0
    # STREAMINFO total_samples == 0 means "unknown length" (RFC 9639
    # §8.2): decode frames to end-of-payload, stopping when the next
    # bytes are not a valid frame sync (0b11111111111110 + reserved 0),
    # instead of silently returning zero samples (ADVICE r10 #1).
    while (ns < total or total == 0) and pos + 2 <= len(payload):
        if total == 0 and not (
            payload[pos] == 0xFF and (payload[pos + 1] & 0xFE) == 0xF8
        ):
            break
        fstart = pos
        br = _Bits(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _frame_no = _read_utf8_number(br)
        if bs_code == 0b0001:
            blocksize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 0b0110:
            blocksize = br.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.read(16) + 1
        elif bs_code >= 0b1000:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved FLAC block size code")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        fbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
        if fbps is None:
            raise ValueError("reserved FLAC sample size code")
        br.align()
        hdr_crc = br.read(8)
        if _crc8(payload[fstart : br.pos - 1]) != hdr_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ca <= 7:
            subs = [
                _decode_subframe(br, blocksize, fbps, sub_types)
                for _ in range(ca + 1)
            ]
        elif ca == 8:  # left/side
            left = _decode_subframe(br, blocksize, fbps, sub_types)
            side = _decode_subframe(br, blocksize, fbps + 1, sub_types)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ca == 9:  # right/side
            side = _decode_subframe(br, blocksize, fbps + 1, sub_types)
            right = _decode_subframe(br, blocksize, fbps, sub_types)
            subs = [[r + s for r, s in zip(right, side)], right]
        elif ca == 10:  # mid/side
            mid = _decode_subframe(br, blocksize, fbps, sub_types)
            side = _decode_subframe(br, blocksize, fbps + 1, sub_types)
            subs = [[], []]
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                subs[0].append((m + s) >> 1)
                subs[1].append((m - s) >> 1)
        else:
            raise ValueError("reserved FLAC channel assignment")
        if len(subs) != nch:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        br.align()
        frame_crc = br.read(16)
        if _crc16(payload[fstart : br.pos - 2]) != frame_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(nch):
            channels[c].extend(subs[c])
        ns += blocksize
        pos = br.pos

    if total and ns > total:  # last block may pad; spec forbids, be strict
        raise ValueError("FLAC decoded more samples than STREAMINFO total")
    if md5 != b"\x00" * 16 and bps % 8 == 0:
        h = hashlib.md5()
        nbytes = bps // 8
        for i in range(ns):
            for c in range(nch):
                h.update(
                    int(channels[c][i]).to_bytes(
                        nbytes, "little", signed=True
                    )
                )
        if h.digest() != md5:
            raise ValueError("FLAC MD5 signature mismatch")
    return {
        "channels": nch,
        "sample_rate": sr,
        "bits": bps,
        "n_samples": ns,
        "duration_s": (ns / sr) if sr else 0.0,
        "samples": channels,
        # decoded subframe kinds, e.g. {"CONSTANT", "FIXED2", "LPC8"} —
        # lets tests prove which decode branch actually ran
        "subframe_types": sorted(
            {
                "CONSTANT" if st == 0
                else "VERBATIM" if st == 1
                else f"FIXED{st - 8}" if 8 <= st <= 12
                else f"LPC{(st & 31) + 1}"
                for st in sub_types
            }
        ),
    }


# ---------------------------------------------------------------------------
# Fixture encoder


def _best_rice_param(res: list[int], pbits: int) -> tuple[int, int]:
    """Exact-cost Rice parameter search (fixture sizes are small)."""
    best, bestp = None, 0
    for p in range((1 << pbits) - 1):
        cost = 0
        for v in res:
            z = (v << 1) if v >= 0 else ((-v) << 1) - 1
            cost += (z >> p) + 1 + p
        if best is None or cost < best:
            best, bestp = cost, p
    return bestp, best


def _write_residuals(
    bw: _BitsW, res: list[int], n: int, order: int, partition_order: int,
    force_escape: bool,
) -> None:
    po = partition_order
    while po and (n % (1 << po) or (n >> po) <= order):
        po -= 1
    bw.write(2, 0)  # 4-bit Rice parameters
    bw.write(4, po)
    idx = 0
    for p in range(1 << po):
        count = (n >> po) - (order if p == 0 else 0)
        part = res[idx : idx + count]
        idx += count
        if force_escape:
            width = max(
                (abs(v).bit_length() + 1 for v in part), default=1
            )
            bw.write(4, 0b1111)
            bw.write(5, width)
            for v in part:
                bw.write(width, v)
        else:
            param, _ = _best_rice_param(part, 4)
            bw.write(4, param)
            for v in part:
                _rice_write(bw, v, param)


def _lpc_analyze(
    samples: list[int], order: int, prec: int = 12
) -> tuple[list[int], int] | None:
    """Quantized-coefficient LPC (RFC 9639 §9.2.4 / VERDICT r10 task
    #7): autocorrelation → Levinson–Durbin → quantize to ``prec``-bit
    signed coefficients with a shared right-shift, exactly the form the
    decode branch applies (pred = Σqcoef·prev >> shift). Returns None
    when the signal is degenerate (zero energy / unstable recursion) —
    caller falls back to a fixed predictor."""
    n = len(samples)
    ac = [
        float(sum(samples[i] * samples[i + lag] for i in range(n - lag)))
        for lag in range(order + 1)
    ]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= lpc[j] * ac[i - j]
        k = acc / err
        for j in range(i // 2):
            t = lpc[j]
            lpc[j] = t - k * lpc[i - 1 - j]
            lpc[i - 1 - j] -= k * t
        if i & 1:
            lpc[i // 2] -= k * lpc[i // 2]
        lpc[i] = k
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = max(abs(c) for c in lpc)
    if cmax == 0.0:
        return None
    # shift so the largest coefficient uses the full prec-1 magnitude:
    # cmax = m·2^e (frexp, 0.5 <= m < 1) → cmax·2^(prec-1-e) < 2^(prec-1)
    import math

    _m, e = math.frexp(cmax)
    shift = max(0, min(15, prec - 1 - e))
    lim = 1 << (prec - 1)
    q = [
        max(-lim, min(lim - 1, round(c * (1 << shift)))) for c in lpc
    ]
    if all(v == 0 for v in q):
        return None
    return q, shift


def _encode_subframe(
    bw: _BitsW, samples: list[int], bps: int, partition_order: int,
    force_escape: bool, lpc_order: int = 0,
) -> None:
    n = len(samples)
    if all(v == samples[0] for v in samples):
        bw.write(1, 0)
        bw.write(6, 0)  # CONSTANT
        bw.write(1, 0)
        bw.write(bps, samples[0])
        return
    if lpc_order and n > lpc_order:
        got = _lpc_analyze(samples, lpc_order)
        if got is not None:
            q, shift = got
            prec = 12
            order = lpc_order
            res = [
                samples[i]
                - (
                    sum(q[j] * samples[i - j - 1] for j in range(order))
                    >> shift
                )
                for i in range(order, n)
            ]
            bw.write(1, 0)
            bw.write(6, 32 + (order - 1))  # LPC
            bw.write(1, 0)  # no wasted bits
            for v in samples[:order]:
                bw.write(bps, v)
            bw.write(4, prec - 1)
            bw.write(5, shift)  # non-negative, fits signed 5-bit
            for c in q:
                bw.write(prec, c)
            _write_residuals(bw, res, n, order, partition_order, force_escape)
            return
    # pick the fixed predictor order with the smallest residual energy
    best_order, best_res, best_cost = 0, samples, None
    for order, coef in _FIXED_COEF.items():
        if order >= n:
            break
        res = [
            samples[i]
            - sum(c * samples[i - j - 1] for j, c in enumerate(coef))
            for i in range(order, n)
        ]
        cost = sum(abs(v) for v in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    order = best_order
    bw.write(1, 0)
    bw.write(6, 8 + order)  # FIXED
    bw.write(1, 0)  # no wasted bits
    for v in samples[:order]:
        bw.write(bps, v)
    _write_residuals(bw, best_res, n, order, partition_order, force_escape)


def encode_flac(
    samples: list[list[int]],
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    force_escape: bool = False,
    lpc_order: int = 0,
) -> bytes:
    """Fixture FLAC encoder: fixed OR quantized-coefficient LPC
    predictors (``lpc_order`` > 0 → Levinson–Durbin analysis, RFC 9639
    §9.2.4; VERDICT r10 task #7) + Rice coding, optional partitioned
    residuals, escape partitions and (for 2 channels) the left_side /
    right_side / mid_side decorrelation modes. Stamps the spec MD5 so
    the decoder's integrity check is end-to-end."""
    nch = len(samples)
    n = len(samples[0])
    if any(len(c) != n for c in samples):
        raise ValueError("channels must have equal length")
    if nch != 2 and stereo_mode != "independent":
        raise ValueError("stereo_mode needs exactly 2 channels")

    h = hashlib.md5()
    nbytes = bps // 8
    for i in range(n):
        for c in range(nch):
            h.update(int(samples[c][i]).to_bytes(nbytes, "little", signed=True))

    out = bytearray(b"fLaC")
    si = bytearray()
    # RFC 9639 §8.2: min/max blocksize EXCLUDE the last (possibly
    # partial) block and must be >= 16 — a fixed-blocksize stream
    # stamps block_size for both (ADVICE r10 #2; previously stamped the
    # last block's size as min, spec-invalid for non-multiple lengths).
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si.append((sample_rate >> 12) & 0xFF)
    si.append((sample_rate >> 4) & 0xFF)
    si.append(((sample_rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F))
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += h.digest()
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si

    frame_no = 0
    for start in range(0, n, block_size):
        blk = [c[start : start + block_size] for c in samples]
        bs = len(blk[0])
        bw = _BitsW()
        bw.write(14, 0b11111111111110)
        bw.write(1, 0)
        bw.write(1, 0)  # fixed blocksize stream
        bs_code = _BLOCKSIZE_CODES.get(bs)
        bw.write(4, bs_code if bs_code else (0b0110 if bs <= 256 else 0b0111))
        bw.write(4, 0)  # sample rate from STREAMINFO
        ca = {"independent": nch - 1, "left_side": 8, "right_side": 9,
              "mid_side": 10}[stereo_mode]
        bw.write(4, ca)
        bw.write(3, _SAMPLE_SIZE_CODES[bps])
        bw.write(1, 0)
        for b in _utf8_number(frame_no):
            bw.write(8, b)
        if not bs_code:
            if bs <= 256:
                bw.write(8, bs - 1)
            else:
                bw.write(16, bs - 1)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(8, _crc8(hdr))

        if stereo_mode == "independent":
            for c in range(nch):
                _encode_subframe(bw, blk[c], bps, partition_order, force_escape, lpc_order)
        else:
            left, right = blk
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                _encode_subframe(bw, left, bps, partition_order, force_escape, lpc_order)
                _encode_subframe(bw, side, bps + 1, partition_order, force_escape, lpc_order)
            elif stereo_mode == "right_side":
                _encode_subframe(bw, side, bps + 1, partition_order, force_escape, lpc_order)
                _encode_subframe(bw, right, bps, partition_order, force_escape, lpc_order)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _encode_subframe(bw, mid, bps, partition_order, force_escape, lpc_order)
                _encode_subframe(bw, side, bps + 1, partition_order, force_escape, lpc_order)
        bw.align()
        body = bytes(bw.out)
        bw.write(16, _crc16(body))
        out += bytes(bw.out)
        frame_no += 1
    return bytes(out)


def synthesize_flac(
    sample_rate: int = 16000,
    n_samples: int = 1600,
    channels: int = 1,
    bps: int = 16,
    seed: int = 0,
    **kw,
) -> bytes:
    """Deterministic FLAC fixture: a ramp+fold signal (piecewise-linear,
    so fixed predictors shine) with per-channel phase offset."""
    lim = 1 << (bps - 1)
    chans = []
    for c in range(channels):
        sig = []
        for i in range(n_samples):
            v = ((i * (7 + 3 * c) + seed * 13) % 2048) - 1024
            sig.append(max(-lim, min(lim - 1, v)))
        chans.append(sig)
    return encode_flac(chans, sample_rate=sample_rate, bps=bps, **kw)
