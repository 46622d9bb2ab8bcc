"""Pure-Python PNG codec (RFC 2083 / W3C PNG spec) on stdlib zlib + numpy.

Companion to the JPEG codec (operators/jpegcodec.py): PNG needs no external
compression library — DEFLATE is stdlib ``zlib`` — so both of the formats the
reference decodes constantly (jpg/png via PIL-backed webdataset handlers)
now decode in-container with zero third-party media libraries.

Coverage: 8- and 16-bit depth (16-bit downscaled to the high byte — media
pipelines consume 8-bit), color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA); all five filter types; Adam7 interlacing (seven
independently-filtered passes, reassembled); multiple IDAT chunks;
ancillary chunks skipped by declared length. The encoder can write any
single filter type, 16-bit samples, and interlaced layout, which gives
every decoder path a spec-defined forward counterpart to round-trip
against (PNG is lossless, so round-trips are exact)."""

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


def _filter_rows(raw: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Forward-filter every row of one (sub-)image with one filter type."""
    n_rows, stride = raw.shape
    prev = np.zeros(stride, dtype=np.uint8)
    lines = []
    for y in range(n_rows):
        row = raw[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]]) if stride > bpp \
            else np.zeros(stride, np.uint8)
        up = prev
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]]) if stride > bpp \
            else np.zeros(stride, np.uint8)
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
    return b"".join(lines)


def encode_png(
    img: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """Encode (H, W) or (H, W, 1/2/3/4) as PNG, one filter for all rows.

    uint8 input writes 8-bit; uint16 input writes 16-bit (big-endian
    samples). ``interlace=True`` writes Adam7 (each pass independently
    filtered) — both exist chiefly so the decoder's pass-reassembly and
    16-bit paths round-trip against spec-defined forward transforms."""
    img = np.asarray(img)
    depth = 16 if img.dtype == np.uint16 else 8
    img = img.astype(np.uint16 if depth == 16 else np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch * (depth // 8)

    def to_bytes_rows(sub: np.ndarray) -> np.ndarray:
        """(n, pw, ch) samples -> (n, pw*bpp) raw filter-input byte rows."""
        n = sub.shape[0]
        if depth == 8:
            return sub.reshape(n, -1).astype(np.uint8)
        return np.frombuffer(
            sub.astype(">u2").tobytes(), dtype=np.uint8
        ).reshape(n, -1)

    if not interlace:
        body = _filter_rows(to_bytes_rows(img), bpp, filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(_filter_rows(to_bytes_rows(sub), bpp, filter_type))
        body = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace))
    idat = zlib.compress(body, 6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (H, W, C) uint8 (palette expanded to RGB)."""
    try:
        return _decode_png(data)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt or truncated PNG stream: {type(e).__name__}") from e


#: Adam7 pass layout: (x0, y0, dx, dy) per pass (PNG spec 8.2).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _defilter(raw: bytes, p: int, n_rows: int, stride: int, bpp: int):
    """Undo PNG filtering for one image (or one Adam7 pass): ``n_rows``
    scanlines of ``stride`` bytes, each preceded by a filter byte. Returns
    (array (n_rows, stride), bytes consumed)."""
    out = np.zeros((n_rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n_rows):
        ftype = raw[p]
        filt = np.frombuffer(raw[p + 1:p + 1 + stride], dtype=np.uint8)
        if len(filt) < stride:
            raise ValueError("PNG pixel data shorter than geometry requires")
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
    return out, p


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
            if depth not in (8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}; 8/16 only")
            if depth == 16 and color_type == 3:
                raise ValueError("16-bit palette PNG is not a legal combination")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            if compression != 0 or filt_method != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            ihdr = (w, h, color_type, depth, interlace)
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
    w, h, color_type, depth, interlace = ihdr
    ch = _CHANNELS[color_type]
    sample_bytes = depth // 8
    bpp = ch * sample_bytes
    raw = zlib.decompress(bytes(idat))

    def rows_to_pixels(rows: np.ndarray, width: int):
        """(n, width*bpp) filtered-byte rows -> (n, width, ch) samples
        (16-bit scaled down to 8 via the high byte)."""
        if depth == 8:
            return rows.reshape(-1, width, ch)
        wide = rows.reshape(-1).view(">u2").reshape(-1, width, ch)
        return (wide >> 8).astype(np.uint8)

    if interlace == 0:
        rows, _ = _defilter(raw, 0, h, w * bpp, bpp)
        arr = rows_to_pixels(rows, w)
    else:  # Adam7: seven independently-filtered sub-images, reassembled
        arr = np.zeros((h, w, ch), dtype=np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, p = _defilter(raw, p, ph, pw * bpp, bpp)
            arr[y0::dy, x0::dx] = rows_to_pixels(rows, pw)

    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        arr = palette[arr[:, :, 0]]
    return arr
