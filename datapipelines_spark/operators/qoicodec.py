"""QOI ("Quite OK Image") codec — pure Python/numpy, from the public spec.

QOI (Dominic Szablewski, 2021; qoiformat.org — spec released into the
public domain) is a lossless byte-oriented image format built from six ops
over a running previous-pixel state and a 64-slot seen-pixel index:

    QOI_OP_RGB    0xFE r g b           full RGB literal (alpha carried over)
    QOI_OP_RGBA   0xFF r g b a         full RGBA literal
    QOI_OP_INDEX  0b00iiiiii           seen-pixel table hit
    QOI_OP_DIFF   0b01drdgdb           per-channel delta in [-2, 1] (bias 2)
    QOI_OP_LUMA   0b10gggggg 0brrrrbbbb dg in [-32, 31] (bias 32),
                                        dr-dg / db-dg in [-8, 7] (bias 8)
    QOI_OP_RUN    0b11rrrrrr           run of 1..62 previous pixels (bias -1;
                                        tags 0xFE/0xFF shadow runs 63/64)

Header: magic ``qoif``, width/height as big-endian u32, channels (3|4),
colorspace byte. Stream ends with seven 0x00 bytes then 0x01. The index
hash is ``(r*3 + g*5 + b*7 + a*11) % 64``; EVERY decoded/encoded pixel
updates its slot; deltas are wrapping (mod 256).

The decoder is the product path (routed from multimodal.decode_array by
the ``qoif`` magic); the encoder exists so fixtures and the driver-gated
query can synthesize QOI payloads in-repo — QOI is lossless, so
decode(encode(x)) == x exactly and the catalog oracle can predict decoded
statistics from the raster formula alone. Golden byte streams for every op
are hand-assembled in tests/test_qoi_codec.py.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode an (h, w, 3|4) uint8 array to QOI bytes."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_qoi expects an (h, w, 3|4) array")
    if img.dtype != np.uint8:
        raise ValueError("encode_qoi expects uint8 pixels")
    h, w, ch = img.shape
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">II", w, h)
    out.append(ch)
    out.append(colorspace)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, ch)
    for px in flat:
        if ch == 4:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), int(px[3])
        else:
            r, g, b, a = int(px[0]), int(px[1]), int(px[2]), pa
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        k = _hash(r, g, b, a)
        if index[k] == (r, g, b, a):
            out.append(k)
        else:
            index[k] = (r, g, b, a)
            if a == pa:
                dr = (r - pr) & 0xFF
                dg = (g - pg) & 0xFF
                db = (b - pb) & 0xFF
                # signed interpretation of the wrapped deltas
                sdr = dr - 256 if dr > 127 else dr
                sdg = dg - 256 if dg > 127 else dg
                sdb = db - 256 if db > 127 else db
                if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                    out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2) | (sdb + 2))
                elif (
                    -32 <= sdg <= 31
                    and -8 <= sdr - sdg <= 7
                    and -8 <= sdb - sdg <= 7
                ):
                    out.append(0x80 | (sdg + 32))
                    out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(payload: bytes) -> np.ndarray:
    """Decode QOI bytes to an (h, w, channels) uint8 array. Raises
    ValueError on bad magic, truncated streams, pixel overflow, or a
    missing/has-wrong end marker — loud failures, never silent pixels."""
    if len(payload) < 14 or payload[:4] != _MAGIC:
        raise ValueError("not a QOI payload")
    w, h = struct.unpack_from(">II", payload, 4)
    ch = payload[12]
    if ch not in (3, 4):
        raise ValueError(f"unsupported QOI channels {ch}")
    if payload[13] not in (0, 1):
        raise ValueError(f"unsupported QOI colorspace {payload[13]}")
    n = w * h
    # Plausibility gate BEFORE the allocation: a corrupt/hostile header
    # with w=h=2^32-1 would otherwise attempt a ~64 GB np.empty. Cap at
    # the reference decoder's bound (qoi.h QOI_PIXELS_MAX = 400M) AND at
    # what the stream could possibly encode — each data byte expands to at
    # most 62 pixels (a QOI_OP_RUN byte).
    _QOI_PIXELS_MAX = 400_000_000
    if n > _QOI_PIXELS_MAX:
        raise ValueError(
            f"implausible QOI dimensions {w}x{h}: exceeds the "
            f"{_QOI_PIXELS_MAX} pixel cap"
        )
    max_encodable = max(0, len(payload) - 14 - 8) * 62
    if n > max_encodable:
        raise ValueError(
            f"truncated QOI stream: {n} pixels cannot be encoded in "
            f"{max(0, len(payload) - 22)} data bytes"
        )
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    data_end = len(payload) - 8  # exclusive: the end marker is not data
    while i < n:
        if pos >= data_end:
            raise ValueError("truncated QOI stream")
        tag = payload[pos]
        pos += 1
        if tag == 0xFE:  # RGB
            if pos + 3 > data_end:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif tag == 0xFF:  # RGBA
            if pos + 4 > data_end:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = (
                payload[pos],
                payload[pos + 1],
                payload[pos + 2],
                payload[pos + 3],
            )
            pos += 4
        else:
            top = tag >> 6
            if top == 0:  # INDEX
                r, g, b, a = index[tag & 0x3F]
            elif top == 1:  # DIFF
                r = (r + ((tag >> 4) & 3) - 2) & 0xFF
                g = (g + ((tag >> 2) & 3) - 2) & 0xFF
                b = (b + (tag & 3) - 2) & 0xFF
            elif top == 2:  # LUMA
                if pos >= data_end:
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (tag & 0x3F) - 32
                nxt = payload[pos]
                pos += 1
                dr = dg + ((nxt >> 4) & 0x0F) - 8
                db = dg + (nxt & 0x0F) - 8
                r = (r + dr) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + db) & 0xFF
            else:  # RUN
                run = (tag & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows pixel count")
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if payload[pos : pos + 8] != _END:
        raise ValueError("missing QOI end marker")
    arr = out.reshape(h, w, 4)
    return arr[:, :, :3].copy() if ch == 3 else arr
