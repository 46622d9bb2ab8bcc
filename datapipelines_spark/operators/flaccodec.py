"""Pure-Python FLAC codec (subset) — lossless compressed audio, no
third-party libraries.

FLAC (public spec, RFC 9639) is the standard lossless interchange for
speech/music corpora. Decoder: STREAMINFO parsing, frame sync + header
(UTF-8 frame numbers, CRC-8), subframe types CONSTANT / VERBATIM /
FIXED(0-4) / LPC (any order, integer arithmetic), Rice-coded residual
partitions (methods 0 and 1, escape code), stereo decorrelation
(left-side / right-side / mid-side), wasted bits, frame CRC-16. Encoder
(for round-trip tests and shard fixtures): FIXED-predictor frames with a
per-frame order and Rice-parameter search — a real, self-consistent
compressor for 8/16-bit mono/stereo PCM.

Out of scope, rejected with named errors: sample sizes other than 8/16
(the fixtures' range), variable-blocksize streams from other encoders are
handled, but Ogg-encapsulated FLAC is not.

Bit I/O is plain Python — the decode path runs inside the Arrow decode
stage where clips are seconds long; clarity and spec fidelity over
throughput, like the other in-repo codecs.
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC: truncated bitstream")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # choose the shortest multi-byte form
    for n in range(2, 8):
        if v < (1 << (1 + 5 * n)):
            break
    lead = (0xFF00 >> n) & 0xFF
    shifts = 6 * (n - 1)
    bw.write(lead | (v >> shifts), 8)
    for i in range(n - 1):
        shifts -= 6
        bw.write(0x80 | ((v >> shifts) & 0x3F), 8)


def _read_rice_partition(br: _BitReader, n: int, order: int, predictor_order: int,
                         out: list[int]) -> None:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    part_order = br.read(4)
    parts = 1 << part_order
    if n % parts:
        raise ValueError("FLAC: block size not divisible by partitions")
    for p in range(parts):
        cnt = n // parts - (predictor_order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag


def _decode_subframe(br: _BitReader, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        samples = [br.read_signed(eff)] * n
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid: list[int] = []
        _read_rice_partition(br, n, order, order, resid)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4)
        if precision == 0xF:
            raise ValueError("FLAC: invalid LPC precision")
        precision += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = []
        _read_rice_partition(br, n, order, order, resid)
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int32 samples (n, ch), sample_rate). Verifies frame
    CRC-8/CRC-16 and the STREAMINFO total-sample count."""
    if payload[:4] != b"fLaC":
        raise ValueError("not FLAC: missing fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if bps not in (8, 16):
        raise ValueError(f"FLAC: unsupported bit depth {bps} (8/16 implemented)")

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _utf8_number(br)
        if bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            n = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError("FLAC: reserved block size code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        header_end = br.byte + (1 if br.bit else 0)
        crc8 = br.read(8)
        if _crc8(payload[frame_start:header_end]) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC: frame/STREAMINFO channel mismatch")
            subs = [_decode_subframe(br, n, bps) for _ in range(nch)]
        elif ch_code == 8:  # left-side
            left = _decode_subframe(br, n, bps)
            side = _decode_subframe(br, n, bps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right-side
            side = _decode_subframe(br, n, bps + 1)
            right = _decode_subframe(br, n, bps)
            subs = [[r + s for r, s in zip(right, side)], right]
        elif ch_code == 10:  # mid-side
            mid = _decode_subframe(br, n, bps)
            side = _decode_subframe(br, n, bps + 1)
            subs = [[], []]
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                subs[0].append((m + s) >> 1)
                subs[1].append((m - s) >> 1)
        else:
            raise ValueError("FLAC: reserved channel assignment")
        br.align()
        crc16 = br.read(16)
        if _crc16(payload[frame_start : br.byte - 2]) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        pos = br.byte
    arr = np.array(chans, dtype=np.int64).T
    if total and len(arr) < total:
        raise ValueError("FLAC: stream shorter than STREAMINFO total")
    if total:
        arr = arr[:total]
    return arr.astype(np.int32), sample_rate


# --- encoder (FIXED predictors + Rice residuals) -----------------------------


def _rice_cost(resid: list[int], param: int) -> int:
    cost = 0
    for r in resid:
        z = (abs(r) << 1) - (1 if r < 0 else 0)  # FLAC zigzag
        cost += (z >> param) + 1 + param
    return cost


def _best_rice(resid: list[int]) -> int:
    best, best_cost = 0, None
    for p in range(15):
        c = _rice_cost(resid, p)
        if best_cost is None or c < best_cost:
            best, best_cost = p, c
    return best


def _write_rice(bw: _BitWriter, resid: list[int], param: int) -> None:
    bw.write(0, 2)  # method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for r in resid:
        z = (abs(r) << 1) - (1 if r < 0 else 0)
        bw.write_unary(z >> param)
        bw.write(z & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    n = len(samples)
    if all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0] & ((1 << bps) - 1), bps)
        return
    # pick the fixed order with the smallest residual magnitude sum
    best_order, best_resid, best_cost = 0, None, None
    for order, coefs in _FIXED_COEFS.items():
        if n <= order:
            continue
        resid = [
            samples[i] - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        cost = sum(abs(r) for r in resid)
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    bw.write(0, 1)
    bw.write(8 + best_order, 6)  # FIXED(order)
    bw.write(0, 1)  # no wasted bits
    for s in samples[:best_order]:
        bw.write(s & ((1 << bps) - 1), bps)
    _write_rice(bw, best_resid, _best_rice(best_resid))


def encode_flac(
    samples: np.ndarray, sample_rate: int = 16000, block_size: int = 4096
) -> bytes:
    """Encode int16 (or int8-range) samples — (n,) mono or (n, ch) — as a
    FLAC stream using FIXED predictors; independent channels."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if ch > 8:
        raise ValueError("FLAC supports at most 8 channels")
    bps = 16
    # STREAMINFO
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.write(0, 128)  # md5 unset (all zero = unknown, per spec)
    out = bytearray(b"fLaC")
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bn = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # 16-bit block size follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(ch - 1, 4)  # independent channels
        bw.write(4, 3)  # 16 bits per sample
        bw.write(0, 1)
        _write_utf8_number(bw, fi)
        bw.write(bn - 1, 16)
        bw.align()
        header = bw.bytes()
        header += bytes([_crc8(header)])
        fw = _BitWriter()
        for c in range(ch):
            _encode_subframe(fw, [int(x) for x in blk[:, c]], bps)
        fw.align()
        frame = header + fw.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
