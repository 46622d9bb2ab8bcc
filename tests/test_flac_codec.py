"""Pure-Python FLAC subset codec (operators/flaccodec.py): lossless
round-trips across signal shapes, CRC/structure validation, a golden
hand-assembled stream, and the audio-router integration."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.operators.flaccodec import decode_flac, encode_flac


def test_roundtrip_sine_mono_and_stereo():
    t = np.arange(5000)
    sig = (6000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)
    for ch in (1, 2):
        s = np.stack([sig, sig // 2 + 100], axis=1)[:, :ch]
        data = encode_flac(s, 16000, block_size=1024)
        dec, sr = decode_flac(data)
        assert sr == 16000
        assert np.array_equal(dec, s.astype(np.int32))
        assert len(data) < s.size * 2 * 0.5  # actually compresses tonal audio


def test_roundtrip_edge_signals():
    rng = np.random.default_rng(0)
    for s in (
        rng.integers(-32768, 32768, 700).astype(np.int16),  # white noise
        np.full(1000, -123, dtype=np.int16),                # constant
        np.array([1, -1, 5], dtype=np.int16),               # tiny clip
        np.array([32767, -32768, 32767, -32768] * 50, dtype=np.int16),
    ):
        dec, _ = decode_flac(encode_flac(s, 8000, block_size=256))
        assert np.array_equal(dec[:, 0], s.astype(np.int64))


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 2),
    block=st.sampled_from([192, 256, 1024]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(n, ch, block, seed):
    rng = np.random.default_rng(seed)
    # mix of smooth + noisy content exercises all fixed orders
    t = np.arange(n)
    smooth = 3000 * np.sin(2 * np.pi * t / max(n, 2))
    s = (smooth[:, None] + rng.normal(0, 200, (n, ch))).astype(np.int16)
    dec, _ = decode_flac(encode_flac(s, 16000, block_size=block))
    assert np.array_equal(dec, s.astype(np.int32))


def test_corruption_detected():
    s = (1000 * np.sin(np.arange(1000) / 7)).astype(np.int16)
    data = bytearray(encode_flac(s, 8000, block_size=256))
    data[-40] ^= 0xFF  # flip a residual byte: derails rice decode or CRC
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
    data = bytearray(encode_flac(s, 8000, block_size=256))
    data[-1] ^= 0xFF  # flip the final CRC-16 byte itself
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"notflac")


def test_audio_router_decodes_flac():
    from datapipelines_spark.operators.audio import real_audio_decode

    s = np.full(1600, 8192, dtype=np.int16)
    feats = real_audio_decode(encode_flac(s, 16000))
    assert feats["sample_rate"] == 16000
    assert feats["n_channels"] == 1
    assert feats["duration_s"] == pytest.approx(0.1)
    assert feats["envelope"][0] == pytest.approx(8192 / 32768.0)


# --- golden: hand-assembled minimal stream -----------------------------------
# mono, 8kHz declared via STREAMINFO, 16-bit, total 4 samples; ONE frame with
# a CONSTANT subframe of value 5. Every byte below is laid out by hand from
# RFC 9639 field widths; CRCs computed from the definitions (poly 0x07 /
# 0x8005) over the literal header bytes.


def _crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def test_golden_hand_assembled_constant_frame():
    # STREAMINFO: min/max block 4, rate 8000, 1 ch, 16 bps, total 4
    si = bytearray()
    si += (4).to_bytes(2, "big") + (4).to_bytes(2, "big")
    si += (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
    # 20 bits rate | 3 bits ch-1 | 5 bits bps-1 | 36 bits total, packed:
    # 8000 = 0x01F40; ch-1=0; bps-1=15 (0b01111); total=4
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | 4
    si += packed.to_bytes(8, "big")
    si += bytes(16)  # md5 zero
    header = bytes([0x80, 0, 0, len(si)]) + bytes(si)
    # frame header: sync 11111111111110 | 0 | 0 -> FF F8; bs code 6 (8-bit
    # follows), sr code 0 -> 0x60; ch 0, bps 100, reserved 0 -> 0x08;
    # frame number 0 -> 0x00; block size byte 3 (n-1)
    fh = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])
    fh += bytes([_crc8(fh)])
    # subframe: 0 | 000000 (constant) | 0 wasted -> 0x00, value 5 as 16 bits
    body = bytes([0x00, 0x00, 0x05])
    frame = fh + body
    frame += _crc16(frame).to_bytes(2, "big")
    data = b"fLaC" + header + frame
    dec, sr = decode_flac(data)
    assert sr == 8000
    assert dec.shape == (4, 1)
    assert dec[:, 0].tolist() == [5, 5, 5, 5]


# --- decoder-only paths: LPC subframes and stereo decorrelation --------------
# Our encoder emits only FIXED/independent frames, so these paths are fed
# with streams assembled directly from spec field layouts via _BitWriter,
# with expectations computed independently in the test.

from datapipelines_spark.operators.flaccodec import (
    _BitWriter,
    _crc8,
    _crc16,
)


def _streaminfo(n, ch, rate=8000, bps=16):
    si = _BitWriter()
    si.write(4, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.write(0, 128)
    body = si.bytes()
    return b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body


def _frame(ch_code, n, subframes_bits):
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)      # 16-bit block size follows
    bw.write(0, 4)      # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(4, 3)      # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)      # frame number 0 (UTF-8 single byte)
    bw.write(n - 1, 16)
    bw.align()
    header = bw.bytes() + bytes([_crc8(bw.bytes())])
    fw = _BitWriter()
    subframes_bits(fw)
    fw.align()
    frame = header + fw.bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def _verbatim_subframe(fw, samples, bps):
    fw.write(0, 1)
    fw.write(1, 6)
    fw.write(0, 1)
    for s in samples:
        fw.write(s & ((1 << bps) - 1), bps)


def test_lpc_subframe_decodes_per_spec():
    # order-2 LPC: coefs [3, -1], shift 1, warmup [100, 103], residuals
    # [2, -4]. pred_i = (3*s[i-1] - 1*s[i-2]) >> 1 (arithmetic shift).
    warm = [100, 103]
    coefs = [3, -1]
    shift = 1
    resid = [2, -4]
    expect = list(warm)
    for r in resid:
        pred = (coefs[0] * expect[-1] + coefs[1] * expect[-2]) >> shift
        expect.append(r + pred)

    def sub(fw):
        fw.write(0, 1)
        fw.write(32 + (2 - 1), 6)  # LPC, order 2
        fw.write(0, 1)
        for s in warm:
            fw.write(s & 0xFFFF, 16)
        fw.write(4 - 1, 4)   # precision 4 bits
        fw.write(shift, 5)
        for c in coefs:
            fw.write(c & 0xF, 4)
        fw.write(0, 2)       # rice method 0
        fw.write(0, 4)       # partition order 0
        fw.write(1, 4)       # rice param 1
        for r in resid:
            z = (abs(r) << 1) - (1 if r < 0 else 0)
            fw.write_unary(z >> 1)
            fw.write(z & 1, 1)

    data = _streaminfo(4, 1) + _frame(0, 4, sub)
    dec, _ = decode_flac(data)
    assert dec[:, 0].tolist() == expect


@pytest.mark.parametrize(
    "ch_code", [8, 9, 10], ids=["left-side", "right-side", "mid-side"]
)
def test_stereo_decorrelation_modes(ch_code):
    left = [100, -50, 7, 0]
    right = [90, -55, 10, 3]
    side = [l - r for l, r in zip(left, right)]

    def sub(fw):
        if ch_code == 8:      # left-side: left(16) then side(17)
            _verbatim_subframe(fw, left, 16)
            _verbatim_subframe(fw, side, 17)
        elif ch_code == 9:    # right-side: side(17) then right(16)
            _verbatim_subframe(fw, side, 17)
            _verbatim_subframe(fw, right, 16)
        else:                 # mid-side: mid(16) then side(17)
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            _verbatim_subframe(fw, mid, 16)
            _verbatim_subframe(fw, side, 17)

    data = _streaminfo(4, 2) + _frame(ch_code, 4, sub)
    dec, _ = decode_flac(data)
    assert dec[:, 0].tolist() == left
    assert dec[:, 1].tolist() == right


def test_rice_escape_partition_decodes_raw():
    # method 0, escape param 0xF: residuals stored raw at 6 bits
    resid = [5, -9, 0]

    def sub(fw):
        fw.write(0, 1)
        fw.write(8, 6)  # FIXED order 0 -> residuals ARE the samples
        fw.write(0, 1)
        fw.write(0, 2)
        fw.write(0, 4)
        fw.write(0xF, 4)  # escape
        fw.write(6, 5)    # 6 raw bits per residual
        for r in resid:
            fw.write(r & 0x3F, 6)

    data = _streaminfo(3, 1) + _frame(0, 3, sub)
    dec, _ = decode_flac(data)
    assert dec[:, 0].tolist() == resid
