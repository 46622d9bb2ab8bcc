"""Real WAV codec + MJPEG frame sampling (operators/audio.py)."""

import numpy as np
import pytest

from datapipelines_spark.operators.audio import (
    decode_wav,
    encode_wav,
    real_audio_decode,
    sample_mjpeg_frames,
    split_mjpeg,
)
from datapipelines_spark.operators.jpegcodec import decode_jpeg, encode_jpeg


def test_wav_roundtrip_mono_16bit():
    t = np.arange(1600)
    s = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    dec, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000
    assert dec.shape == (1600, 1)
    assert np.allclose(dec[:, 0], s / 32768.0, atol=1e-9)


def test_wav_roundtrip_stereo():
    s = np.stack([np.full(800, 8192, np.int16), np.full(800, -8192, np.int16)], axis=1)
    dec, sr = decode_wav(encode_wav(s, 8000))
    assert dec.shape == (800, 2)
    assert np.allclose(dec[:, 0], 0.25) and np.allclose(dec[:, 1], -0.25)


def test_wav_skips_unknown_chunks():
    s = np.full(100, 1000, np.int16)
    raw = bytearray(encode_wav(s, 8000))
    # splice a LIST chunk between fmt and data
    insert = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    fmt_end = 12 + 8 + 16
    patched = bytes(raw[:fmt_end]) + insert + bytes(raw[fmt_end:])
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    dec, sr = decode_wav(patched)
    assert dec.shape == (100, 1)


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\xff\xd8\xff\xe0 not audio")


def test_real_audio_decode_features():
    s = np.full(1600, 16384, np.int16)  # DC at half scale
    feats = real_audio_decode(encode_wav(s, 16000))
    assert feats["sample_rate"] == 16000
    assert feats["n_channels"] == 1
    assert abs(feats["duration_s"] - 0.1) < 1e-9
    assert len(feats["envelope"]) == 8
    assert all(abs(e - 0.5) < 1e-6 for e in feats["envelope"])


def _frames(colors, size=16):
    return b"".join(
        encode_jpeg(np.full((size, size, 3), c, np.uint8), quality=90) for c in colors
    )


def test_split_mjpeg_counts_and_decodes():
    stream = _frames([40, 120, 200, 90])
    frames = split_mjpeg(stream)
    assert len(frames) == 4
    for c, f in zip([40, 120, 200, 90], frames):
        arr = decode_jpeg(f)
        assert arr.shape == (16, 16, 3)
        assert abs(float(arr.mean()) - c) < 2.0


def test_sample_every_second_frame():
    stream = _frames([10, 50, 90, 130, 170])
    picks = sample_mjpeg_frames(stream, every_n=2)
    assert [i for i, _ in picks] == [0, 2, 4]


def test_frame_sample_operator_spark(spark):
    import pandas as pd

    from datapipelines_spark.operators.multimodal import frame_sample_mjpeg

    rows = [(str(i), _frames([(i * 30) % 200 + 10, (i * 30) % 200 + 40])) for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["__key__", "mjpeg"]))
    out = frame_sample_mjpeg(df, payload_col="mjpeg", on_error="fail").collect()
    assert len(out) == 12
    by_key = {}
    for r in out:
        by_key.setdefault(r["__key__"], []).append(r)
    for i in range(6):
        frames = sorted(by_key[str(i)], key=lambda r: r["frame_idx"])
        assert [f["frame_idx"] for f in frames] == [0, 1]
        expect0 = (i * 30) % 200 + 10
        assert abs(frames[0]["mean_pixel"] * 255.0 - expect0) < 2.0
        assert frames[0]["width"] == 16 and frames[0]["height"] == 16


def test_decode_audio_stage_with_real_codec(spark):
    import pandas as pd

    from datapipelines_spark.operators.multimodal import decode_audio

    rows = []
    for i in range(8):
        amp = 1000 * (i + 1)
        s = np.full(400 * (i + 1), amp, np.int16)
        rows.append((str(i), encode_wav(s, 8000), amp))
    df = spark.createDataFrame(
        pd.DataFrame([(k, p) for k, p, _ in rows], columns=["__key__", "wav"])
    )
    out = {
        r["__key__"]: r
        for r in decode_audio(
            df, payload_col="wav", decode_fn=real_audio_decode, on_error="fail"
        ).collect()
    }
    for k, _, amp in rows:
        r = out[k]
        assert r["sample_rate"] == 8000
        assert abs(r["envelope"][0] - amp / 32768.0) < 1e-6


# --- property tests --------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 2),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_exact_property(n, ch, sr, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
    dec, got_sr = decode_wav(encode_wav(s, sr))
    assert got_sr == sr and dec.shape == (n, ch)
    assert np.array_equal((dec * 32768.0).astype(np.int16), s)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=120))
def test_wav_garbage_raises_valueerror(data):
    from hypothesis import assume

    # a synthesized fully-valid RIFF would legitimately decode; the contract
    # under test is clean rejection of NON-wav bytes
    assume(not data.startswith(b"RIFF"))
    with pytest.raises(ValueError):
        decode_wav(data)


def test_mjpeg_split_handles_progressive_frames():
    """The structure-aware splitter must walk multi-scan (progressive)
    frames too — several SOS segments per frame."""
    from datapipelines_spark.operators.jpegcodec import encode_jpeg_progressive

    frames_src = [30, 90, 150]
    stream = b"".join(
        encode_jpeg_progressive(np.full((16, 16, 3), c, np.uint8), quality=90)
        for c in frames_src
    )
    frames = split_mjpeg(stream)
    assert len(frames) == 3
    for c, f in zip(frames_src, frames):
        arr = decode_jpeg(f)
        assert arr.shape == (16, 16, 3)
        assert abs(float(arr.mean()) - c) < 2.0


def test_g711_expansion_known_values():
    """G.711 A-law / mu-law expansion checked against spec-known points."""
    from datapipelines_spark.operators.audio import _alaw_expand, _mulaw_expand

    mu = _mulaw_expand(np.array([0xFF, 0x7F, 0x80, 0x00], dtype=np.uint8))
    assert mu[0] == 0 and mu[1] == 0          # +0 / -0
    assert mu[2] == 32124                      # max positive
    assert mu[3] == -32124                     # max negative
    al = _alaw_expand(np.array([0xD5, 0x55, 0xAA, 0x2A], dtype=np.uint8))
    assert al[0] == 8 and al[1] == -8          # smallest +/-
    assert al[2] == 32256 and al[3] == -32256  # max +/-


def test_g711_wav_decode_end_to_end():
    """Hand-built mu-law WAV (format 7) decodes through decode_wav."""
    n = 64
    payload = bytes([0xFF] * n)  # all +0 samples
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(payload).to_bytes(4, "little") + payload
    wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    dec, sr = decode_wav(wav)
    assert sr == 8000 and dec.shape == (n, 1)
    assert np.all(dec == 0.0)


# --- IMA/DVI ADPCM (WAV format 0x11) -----------------------------------------


def test_ima_adpcm_roundtrip_snr():
    import numpy as np

    from datapipelines_spark.operators.audio import decode_wav, encode_wav_ima_adpcm

    t = np.arange(3000)
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t / 16000)
        + 2000 * np.sin(2 * np.pi * 97 * t / 16000)
    ).astype(np.int16)
    for ch in (1, 2):
        s = np.stack([sig, np.roll(sig, 7)], axis=1)[:, :ch]
        dec, sr = decode_wav(encode_wav_ima_adpcm(s, 16000))
        assert sr == 16000 and dec.shape == (3000, ch)
        err = np.sqrt(np.mean((dec * 32768 - s) ** 2))
        snr = 20 * np.log10(np.std(s) / err)
        assert snr > 20  # 4:1 coding keeps >20 dB on band-limited signals


def test_ima_adpcm_constant_signal_is_bit_exact():
    # constant input: first sample is the block header predictor; every
    # nibble is 0 and step 7>>3 == 0, so the signal round-trips EXACTLY —
    # the property the oracle-checked catalog query relies on
    import numpy as np

    from datapipelines_spark.operators.audio import decode_wav, encode_wav_ima_adpcm

    s = np.full((1313, 2), 1234, dtype=np.int16)
    dec, _ = decode_wav(encode_wav_ima_adpcm(s, 8000))
    assert dec.shape == (1313, 2)
    assert np.array_equal((dec * 32768).astype(np.int64), s.astype(np.int64))


def test_ima_adpcm_golden_nibble_sequence():
    """Hand-stepped golden: predictor 0, index 0 (step 7), samples
    [0, 10, 2]. diff=10 -> nib 5 (4:+7 rem 3, 1:+1) -> decode 0+7+1(+0?)
    computed via the spec tables; verifies encoder/decoder agree with a
    BY-HAND trace, not just with each other."""
    import numpy as np

    from datapipelines_spark.operators.audio import (
        _ima_step_nibble,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    # by hand: step=7; sample 10 vs pred 0: diff=10 >= 7 -> bit4, rem 3;
    # 3 >= 3 (7>>1) -> bit2, rem 0; 0 >= 1 (7>>2)? no -> nib=6;
    # decode: d = 7>>3 + 7>>1 + 7 = 0+3+7 = 10 -> pred 10, index 0+6adj=+6
    assert _ima_step_nibble(6, 0, 0) == (10, 6)
    s = np.array([0, 10, 2], dtype=np.int16)
    wav = encode_wav_ima_adpcm(s, 8000, samples_per_block=9)
    dec, _ = decode_wav(wav)
    got = (dec[:, 0] * 32768).astype(np.int64).tolist()
    # sample 2: pred 10, index 6 (step 13): diff=-8 -> sign bit; 8 not >= 13,
    # 8 >= 6 (13>>1) -> bit2 rem 2, 2 >= 3 (13>>2)? no -> nib = 8|2 = 10;
    # decode: d = 13>>3 + 13>>1 = 1 + 6 = 7 -> pred 10-7 = 3, index 6+4=10
    assert got == [0, 10, 3]


def test_ima_adpcm_rejects_corrupt_index():
    import numpy as np

    from datapipelines_spark.operators.audio import decode_wav, encode_wav_ima_adpcm

    wav = bytearray(encode_wav_ima_adpcm(np.zeros(9, dtype=np.int16), 8000))
    i = wav.index(b"data") + 8
    wav[i + 2] = 200  # step index byte out of [0, 88]
    import pytest

    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(wav))
