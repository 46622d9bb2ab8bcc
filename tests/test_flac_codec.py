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
