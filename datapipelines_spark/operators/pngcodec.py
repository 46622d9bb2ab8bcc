"""Pure-Python PNG codec (RFC 2083 / W3C PNG spec) on stdlib zlib + numpy.

Companion to the JPEG codec (operators/jpegcodec.py): PNG needs no external
compression library — DEFLATE is stdlib ``zlib`` — so both of the formats the
reference decodes constantly (jpg/png via PIL-backed webdataset handlers)
now decode in-container with zero third-party media libraries.

Coverage: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA); all five filter types; multiple IDAT chunks;
ancillary chunks skipped by declared length. Adam7 interlacing and 16-bit
depth are rejected with a clear ValueError naming the limitation. The
encoder can apply any single filter type to every scanline, which gives the
decoder's five defilter paths spec-defined forward counterparts to
round-trip against (PNG is lossless, so round-trips are exact)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec 6.6): nearest of a/left, b/up,
    c/up-left to p = a + b - c, ties broken a, b, c."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (H, W), (H, W, 1/2/3/4) uint8 as PNG, one filter for all rows."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = img.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]]) if w * ch > bpp \
            else np.zeros(w * ch, np.uint8)
        up = prev
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]]) if w * ch > bpp \
            else np.zeros(w * ch, np.uint8)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - up
        elif filter_type == 3:
            filt = row - ((left.astype(np.uint16) + up.astype(np.uint16)) // 2).astype(np.uint8)
        elif filter_type == 4:
            filt = row - _paeth(left, up, upleft)
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (H, W, C) uint8 (palette expanded to RGB)."""
    try:
        return _decode_png(data)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt or truncated PNG stream: {type(e).__name__}") from e


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color_type, compression, filt_method, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}; only 8-bit")
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG not supported")
            if compression != 0 or filt_method != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            ihdr = (w, h, color_type)
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    w, h, color_type = ihdr
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data shorter than geometry requires")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch
    p = 0
    for y in range(h):
        ftype = raw[p]
        filt = np.frombuffer(raw[p + 1:p + 1 + stride], dtype=np.uint8)
        p += 1 + stride
        if ftype == 0:
            recon = filt.copy()
        elif ftype == 2:
            recon = filt + prev  # uint8 wraparound == mod 256
        elif ftype == 1:
            # sub is linear mod 256: per-byte-lane cumulative sum — exact
            # and fully vectorized (recon[x] = sum of filt[x-k*bpp]) mod 256
            lanes = filt.astype(np.int64).copy()
            n_full = stride // bpp * bpp
            view = lanes[:n_full].reshape(-1, bpp)
            np.cumsum(view, axis=0, out=view)
            if n_full < stride:  # stride not a bpp multiple cannot happen,
                lanes[n_full:] += lanes[n_full - bpp:stride - bpp]  # but be safe
            recon = (lanes & 0xFF).astype(np.uint8)
        elif ftype in (3, 4):
            # average/paeth have sequential left-dependence with a floor/
            # branch, so run them as a plain-int loop (lists avoid numpy
            # scalar overhead — ~30x faster than per-element ndarray ops)
            fl = filt.tolist()
            pl = prev.tolist()
            rl = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    a = rl[x - bpp] if x >= bpp else 0
                    rl[x] = (fl[x] + ((a + pl[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = rl[x - bpp] if x >= bpp else 0
                    c = pl[x - bpp] if x >= bpp else 0
                    b = pl[x]
                    pa = abs(b - c)
                    pb = abs(a - c)
                    pc = abs(a + b - 2 * c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rl[x] = (fl[x] + pred) & 0xFF
            recon = np.array(rl, dtype=np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = recon
        prev = recon

    arr = out.reshape(h, w, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        arr = palette[arr[:, :, 0]]
    return arr
