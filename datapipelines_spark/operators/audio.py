"""Pure-numpy WAV (RIFF PCM) codec + real audio feature extraction.

The audio analogue of the image codecs: the reference's decode stage hands
audio members to codec libraries this container doesn't ship; WAV/PCM needs
none — the RIFF container and PCM frames are simple enough to parse with
numpy directly (public Microsoft/IBM RIFF spec). This upgrades the engine's
``decode_audio`` stage from the deterministic fake to a REAL decoder for the
most common uncompressed interchange format; compressed audio (mp3/ogg/flac)
remains gated on external codecs, stated plainly.

``encode_wav`` exists so tests and oracle queries can synthesize payloads
in-process — same pattern as the JPEG codec (operators/jpegcodec.py).
"""

from __future__ import annotations

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — as a WAV file."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")           # bits per sample
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes -> (float64 samples in [-1, 1] of shape (n, ch),
    sample_rate). Supports PCM 8/16/32-bit and IEEE float32; walks unknown
    RIFF chunks (LIST/INFO/fact/...) by their declared length."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt = (audio_format, ch, sr, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, sr, bits = fmt
    if ch < 1:
        raise ValueError("WAV with zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:  # 8-bit WAV is unsigned
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif audio_format == 6 and bits == 8:  # A-law (G.711)
        arr = _alaw_expand(np.frombuffer(data, dtype=np.uint8)) / 32768.0
    elif audio_format == 7 and bits == 8:  # mu-law (G.711)
        arr = _mulaw_expand(np.frombuffer(data, dtype=np.uint8)) / 32768.0
    else:
        raise ValueError(
            f"unsupported WAV format {audio_format}/{bits}-bit; PCM, float32 "
            "and G.711 A-law/mu-law are implemented (other compressed audio "
            "needs external codecs)"
        )
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), sr


def _mulaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear PCM16 (public spec formula)."""
    u = (~u.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = ((mantissa << 3) + 0x84) << exponent
    magnitude -= 0x84
    return np.where(sign, -magnitude, magnitude).astype(np.float64)


def _alaw_expand(a: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> linear PCM16 (public spec formula)."""
    a = a.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    magnitude = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
    )
    # A-law sign convention is inverted vs mu-law: bit SET means positive
    return np.where(sign, magnitude, -magnitude).astype(np.float64)


def real_audio_decode(payload: bytes, envelope_bins: int = 8) -> dict:
    """REAL feature extraction for ``decode_audio``: parse the WAV, return
    rate/channels/duration plus a per-bin RMS loudness envelope — drop-in
    replacement for ``fake_audio_decode`` with the same feature schema."""
    samples, sr = decode_wav(payload)
    n = samples.shape[0]
    mono = samples.mean(axis=1)
    bins = np.array_split(mono, envelope_bins) if n else []
    env = [float(np.sqrt(np.mean(b * b))) if len(b) else 0.0 for b in bins]
    return {
        "sample_rate": int(sr),
        "n_channels": int(samples.shape[1]),
        "duration_s": float(n / sr) if sr else 0.0,
        "envelope": env,
    }


# --- MJPEG (concatenated-JPEG) video frame handling --------------------------


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Split a concatenated-JPEG (MJPEG-style) stream into per-frame JPEGs.

    Walks real JPEG structure rather than byte-scanning: marker segments are
    skipped by their length fields (their payloads may contain FF D9 bytes),
    and the entropy-coded scan is walked respecting byte stuffing and RSTn
    until the true EOI."""
    frames = []
    pos = 0
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF or payload[pos + 1] != 0xD8:
            pos += 1
            continue
        start = pos
        pos += 2
        in_scan = False
        while pos + 1 < n:
            if not in_scan:
                if payload[pos] != 0xFF:
                    pos += 1
                    continue
                marker = payload[pos + 1]
                pos += 2
                if marker == 0xD9:
                    break
                if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                    continue
                seg_len = int.from_bytes(payload[pos:pos + 2], "big")
                if marker == 0xDA:
                    in_scan = True
                pos += seg_len
            else:
                if payload[pos] != 0xFF:
                    pos += 1
                    continue
                nxt = payload[pos + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:  # stuffing / restart
                    pos += 2
                    continue
                if nxt == 0xD9:
                    pos += 2
                    break
                in_scan = False  # next scan header segment
        frames.append(payload[start:pos])
    return frames


def sample_mjpeg_frames(payload: bytes, every_n: int = 1) -> list[tuple[int, bytes]]:
    """(frame_idx, jpeg_bytes) for every ``every_n``-th frame."""
    return [
        (i, f) for i, f in enumerate(split_mjpeg(payload)) if i % max(every_n, 1) == 0
    ]


def spectral_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Spectral summary of a mono float signal via the numpy real FFT:
    centroid (power-weighted mean frequency), bandwidth (power-weighted
    stddev around the centroid), 85% rolloff, and flatness (geometric /
    arithmetic mean of the power spectrum — 1.0 is white noise, → 0 pure
    tones). The per-clip feature vector audio corpus curation filters on
    (speech/music/noise triage) without any external DSP library."""
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    if len(x) == 0:
        raise ValueError("empty signal")
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sample_rate)
    total = spec.sum()
    if total <= 0:
        return {
            "centroid_hz": 0.0, "bandwidth_hz": 0.0,
            "rolloff_hz": 0.0, "flatness": 1.0,
        }
    p = spec / total
    centroid = float((freqs * p).sum())
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * p).sum()))
    cum = np.cumsum(p)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85))])
    eps = 1e-12
    flatness = float(
        np.exp(np.mean(np.log(spec + eps))) / (np.mean(spec) + eps)
    )
    return {
        "centroid_hz": centroid, "bandwidth_hz": bandwidth,
        "rolloff_hz": rolloff, "flatness": flatness,
    }


def spectral_decode(payload: bytes) -> dict:
    """WAV bytes -> spectral feature dict (first channel); composes with the
    multimodal decode stages the same way real_audio_decode does."""
    samples, sr = decode_wav(payload)
    return spectral_features(samples[:, 0], sr)
