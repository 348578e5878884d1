"""REAL FLAC codec, stdlib+numpy only — the lossless half of the
compressed-audio seam (mp3/ogg stay at the soundfile/librosa seam).

Decoder (:func:`decode_flac`): full native-FLAC frame machinery per the
public xiph.org format spec — STREAMINFO parse, frame sync + header
(block-size/sample-rate/sample-size codes, UTF-8-coded frame number,
CRC-8-verified header), subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (any order, quantized coefficients + shift), Rice
residual decode (both 4- and 5-bit parameter methods, partition orders,
escape-to-raw), wasted-bits shift, and the three stereo decorrelation
modes (left/side, right/side, mid/side). FLAC is lossless, so a correct
decode is BIT-EXACT — which is what makes the declared query's DuckDB
oracle replay closed-form (see ``ext_audio_flac``).

Encoder (:func:`encode_flac`): fixture-side inverse — mono 16-bit,
fixed-predictor order-2 subframes with real Rice-coded residuals (or
CONSTANT when a block is flat), correct CRC-8/CRC-16; every byte the
decoder's hot path consumes (unary+Rice bitstream, UTF-8 frame numbers,
block-size codes) is genuinely exercised.

Scale note: pure-python bit-reading decodes ~1e6 samples/s/core — fine
for metadata/QA passes at corpus scale because the kernel is
partition-local mapInPandas (audio bytes never cross executors); a
production fleet drops libFLAC/soundfile into the same seam.
"""

from __future__ import annotations

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8+x^2+x+1 (0x07), init 0 — FLAC frame
    header CRC."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16+x^15+x^2+1 (0x8005), init 0 — FLAC
    whole-frame CRC."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.d = data
        self.pos = pos_bytes * 8

    def bits(self, n: int) -> int:
        v = 0
        d, p = self.d, self.pos
        if p + n > len(d) * 8:
            raise EOFError
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        # FLAC unary: q zero-bits terminated by a one-bit
        d, p = self.d, self.pos
        q = 0
        limit = len(d) * 8
        while True:
            if p >= limit:
                raise EOFError
            if (d[p >> 3] >> (7 - (p & 7))) & 1:
                p += 1
                break
            q += 1
            p += 1
        self.pos = p
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def unary(self, q: int) -> None:
        while q > 32:
            self.bits(0, 32)
            q -= 32
        self.bits(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def data(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _utf8_number(bw: _BitWriter, v: int) -> None:
    """FLAC's UTF-8-style frame-number coding (extends to 36 bits)."""
    if v < 0x80:
        bw.bits(v, 8)
        return
    for nbytes in range(2, 8):
        if v < (1 << (1 + 5 * nbytes)):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    bw.bits(lead | (v >> (6 * (nbytes - 1))), 8)
    for k in range(nbytes - 2, -1, -1):
        bw.bits(0x80 | ((v >> (6 * k)) & 0x3F), 8)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad utf8 frame number")
    v = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        cont = br.bits(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad utf8 continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _decode_residual(br: _BitReader, blocksize: int, order: int):
    method = br.bits(2)
    if method > 1:
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    res = []
    for part in range(nparts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("partition underflow")
        param = br.bits(plen)
        if param == escape:
            nbits = br.bits(5)
            res.extend(br.sbits(nbits) if nbits else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                low = br.bits(param) if param else 0
                res.append(_unzigzag((q << param) | low))
    return res


def _decode_subframe(br: _BitReader, blocksize: int, bps: int):
    if br.bits(1):
        raise ValueError("subframe padding bit set")
    ftype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = br.sbits(bps)
        out = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        out = [br.sbits(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [br.sbits(bps) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            v = r + pred
            if v > (1 << 35) or v < -(1 << 35):
                raise ValueError("runaway prediction (corrupt stream)")
            out.append(v)
    elif ftype >= 32:  # LPC, order = ftype - 31
        order = ftype - 31
        warm = [br.sbits(bps) for _ in range(order)]
        prec = br.bits(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = br.sbits(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            v = r + pred
            if v > (1 << 35) or v < -(1 << 35):
                raise ValueError("runaway prediction (corrupt stream)")
            out.append(v)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(blob: bytes):
    """Decode a native-FLAC stream. Returns (samples_float64 in [-1, 1)
    with channels interleaved, sample_rate, n_frames) or None for
    non-FLAC / corrupt / CRC-failing input. Lossless: int samples are
    reconstructed bit-exactly, then normalized by 2^(bps-1)."""
    import numpy as np

    if blob is None or len(blob) < 42 or bytes(blob[:4]) != b"fLaC":
        return None
    b = bytes(blob)
    pos = 4
    streaminfo = None
    try:
        while pos + 4 <= len(b):
            hdr = b[pos]
            btype = hdr & 0x7F
            (blen,) = (int.from_bytes(b[pos + 1 : pos + 4], "big"),)
            if btype == 0:
                streaminfo = b[pos + 4 : pos + 4 + blen]
            pos += 4 + blen
            if hdr & 0x80:
                break
        if streaminfo is None or len(streaminfo) < 34:
            return None
        si = _BitReader(streaminfo)
        si.bits(16)  # min blocksize
        si.bits(16)  # max blocksize
        si.bits(24)  # min framesize
        si.bits(24)  # max framesize
        rate_si = si.bits(20)
        nch_si = si.bits(3) + 1
        bps_si = si.bits(5) + 1
        total = si.bits(36)
        if rate_si <= 0:
            return None

        out_ch: list[list[int]] = [[] for _ in range(nch_si)]
        while pos < len(b) - 2:
            frame_start = pos
            br = _BitReader(b, pos)
            sync = br.bits(14)
            if sync != 0b11111111111110:
                break  # no more frames (or junk tail)
            br.bits(1)  # reserved
            br.bits(1)  # blocking strategy
            bs_code = br.bits(4)
            sr_code = br.bits(4)
            ch_code = br.bits(4)
            ss_code = br.bits(3)
            br.bits(1)  # reserved
            _read_utf8_number(br)
            if bs_code == 6:
                blocksize = br.bits(8) + 1
            elif bs_code == 7:
                blocksize = br.bits(16) + 1
            elif bs_code in _BLOCKSIZE_CODE:
                blocksize = _BLOCKSIZE_CODE[bs_code]
            else:
                return None
            if sr_code == 12:
                br.bits(8)
            elif sr_code in (13, 14):
                br.bits(16)
            elif sr_code == 15:
                return None
            header_end = br.byte_pos()
            if _crc8(b[frame_start:header_end]) != br.bits(8):
                return None
            bps = _SAMPLE_SIZE_CODE.get(ss_code, bps_si) if ss_code else bps_si
            if ch_code < 8:
                nch = ch_code + 1
                chans = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
            elif ch_code in (8, 9, 10):
                nch = 2
                # side channel carries one extra bit of range
                if ch_code == 8:  # left/side
                    left = _decode_subframe(br, blocksize, bps)
                    side = _decode_subframe(br, blocksize, bps + 1)
                    chans = [left, [l - s for l, s in zip(left, side)]]
                elif ch_code == 9:  # right/side
                    side = _decode_subframe(br, blocksize, bps + 1)
                    right = _decode_subframe(br, blocksize, bps)
                    chans = [[r + s for r, s in zip(right, side)], right]
                else:  # mid/side
                    mid = _decode_subframe(br, blocksize, bps)
                    side = _decode_subframe(br, blocksize, bps + 1)
                    chans = [
                        [(2 * m + (s & 1) + s) >> 1 for m, s in zip(mid, side)],
                        [(2 * m + (s & 1) - s) >> 1 for m, s in zip(mid, side)],
                    ]
            else:
                return None
            if nch != nch_si:
                return None
            br.align()
            frame_end = br.byte_pos()
            if _crc16(b[frame_start:frame_end]) != br.bits(16):
                return None
            for ci in range(nch):
                out_ch[ci].extend(chans[ci])
            pos = br.byte_pos()

        if not out_ch[0]:
            return None
        n = len(out_ch[0])
        if total and n > total:
            out_ch = [ch[:total] for ch in out_ch]
            n = total
        inter = np.empty(n * nch_si, dtype="float64")
        scale = float(1 << (bps_si - 1))
        for ci, ch in enumerate(out_ch):
            inter[ci::nch_si] = np.asarray(ch, dtype="float64") / scale
        return inter, int(rate_si), n
    except (EOFError, ValueError, IndexError):
        return None


def encode_flac(samples, rate: int = 16_000, blocksize: int = 4096) -> bytes:
    """Encode mono int16-range samples as a real native-FLAC stream:
    STREAMINFO + per-block frames using a FIXED order-2 predictor with
    Rice-coded residuals (CONSTANT subframe when a block is flat),
    correct CRC-8/CRC-16 and UTF-8 frame numbers. Lossless — the
    fixture-side inverse of :func:`decode_flac`."""
    samples = [int(v) for v in samples]
    n = len(samples)

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.bits(blocksize, 16)
    si.bits(blocksize, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(rate, 20)
    si.bits(0, 3)  # channels - 1
    si.bits(15, 5)  # bps - 1 = 15
    si.bits(n, 36)
    si.bits(0, 64)  # md5 (0 = unknown), two 64-bit halves
    si.bits(0, 64)
    body = si.data()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = samples[start : start + blocksize]
        bs = len(blk)
        bw = _BitWriter()
        bw.bits(0b11111111111110, 14)
        bw.bits(0, 1)
        bw.bits(0, 1)  # fixed blocksize strategy
        bw.bits(7, 4)  # blocksize: 16-bit value - 1 follows
        bw.bits(0, 4)  # sample rate: from STREAMINFO
        bw.bits(0, 4)  # 1 channel
        bw.bits(4, 3)  # 16 bps
        bw.bits(0, 1)
        _utf8_number(bw, fi)
        bw.bits(bs - 1, 16)
        bw.align()
        hdr = bw.data()
        hdr += bytes([_crc8(hdr)])

        sw = _BitWriter()
        if all(v == blk[0] for v in blk):
            sw.bits(0, 1)
            sw.bits(0, 6)  # CONSTANT
            sw.bits(0, 1)
            sw.bits(blk[0], 16)
        else:
            order = 2 if bs > 2 else 0
            sw.bits(0, 1)
            sw.bits(8 + order, 6)  # FIXED
            sw.bits(0, 1)
            for v in blk[:order]:
                sw.bits(v, 16)
            coefs = _FIXED_COEFS[order]
            res = [
                blk[i] - sum(c * blk[i - 1 - j] for j, c in enumerate(coefs))
                for i in range(order, bs)
            ]
            mags = [_zigzag(r) for r in res]
            mean = (sum(mags) // max(len(mags), 1)) or 1
            param = min(mean.bit_length(), 14)
            sw.bits(0, 2)  # 4-bit rice method
            sw.bits(0, 4)  # partition order 0
            sw.bits(param, 4)
            for u in mags:
                sw.unary(u >> param)
                if param:
                    sw.bits(u & ((1 << param) - 1), param)
        sw.align()
        frame = hdr + sw.data()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
