"""Pure-Python baseline TIFF codec (TIFF 6.0) — no third-party libraries.

Decoder: both byte orders (II/MM), the first IFD, strip-organized images,
uncompressed (1) and PackBits (32773) compression, grayscale (photometric
0/1) and RGB(A), 8- and 16-bit samples (16-bit scaled to 8 via the high
byte, as the PNG codec does). Encoder: grayscale/RGB 8-bit with optional
PackBits, used by round-trip tests; golden tests hand-assemble streams
independently (tests/test_tiff_codec.py).

Reference behavior matched: the reference decoded images through
PIL-backed handlers (/root/reference/sdata/datapipeline.py:525-527); TIFF
is in PIL's default surface. Spec: Adobe TIFF 6.0 (public).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b == 128:  # no-op
            continue
        if b < 128:  # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        else:  # repeat next byte 257-b times
            out += data[i : i + 1] * (257 - b)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out += bytes([257 - (j - i + 1), row[i]])
            i = j + 1
            continue
        # literal until the next run of >= 3 (2-runs inside literals are fine)
        j = i
        while (
            j + 2 >= n or not (row[j + 1] == row[j + 2] == row[j])
        ) and j < n - 1 and j - i < 127:
            j += 1
        out += bytes([j - i]) + row[i : j + 1]
        i = j + 1
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (spec §13): MSB-first bit packing, Clear=256/EOI=257,
    and the EARLY code-width change (width bumps when the table reaches
    2^width - 1, one code sooner than GIF's LSB-first variant)."""
    CLEAR, EOI = 256, 257
    width = 9
    dictionary: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated TIFF LZW strip")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            dictionary = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + entry[:1])
        elif code == len(dictionary):  # KwKwK
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError(f"TIFF LZW code {code} out of range")
        out += entry
        if prev is not None and len(dictionary) == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW strip shorter than raster")
    return bytes(out[:expected])


def _tiff_lzw_encode(raw: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    buf = b""
    for b in raw:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        # early change: the DECODER bumps when its table hits 2^width - 1.
        # Its table trails ours by one entry (nothing is added for the first
        # code after a clear), so mirror at next_code == 2^width.
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code > 4093:  # reset before the table saturates 12 bits
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        buf = bytes([b])
    if buf:
        emit(table[buf])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode TIFF bytes to (H, W, C) uint8. Raises ValueError on non-TIFF,
    unsupported compression, or truncated input."""
    if len(payload) < 8:
        raise ValueError("too short to be a TIFF")
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order signature")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset beyond payload")
    (n_entries,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])

    def entry_values(tag_type: int, count: int, raw: bytes):
        size = _TYPE_SIZES.get(tag_type)
        if size is None:
            return None
        total = size * count
        if total <= 4:
            buf = raw[:total]
        else:
            (off,) = struct.unpack(e + "I", raw)
            buf = payload[off : off + total]
        if len(buf) < total:
            raise ValueError("truncated TIFF tag data")
        fmt = {1: "B", 3: "H", 4: "I"}.get(tag_type)
        if fmt is None:  # rationals etc. — unused by the tags we read
            return None
        return list(struct.unpack(e + fmt * count, buf))

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack(e + "HHI", payload[base : base + 8])
        vals = entry_values(ttype, count, payload[base + 8 : base + 12])
        if vals is not None:
            tags[tag] = vals

    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_HEIGHT][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as ex:
        raise ValueError(f"TIFF missing required tag {ex}") from ex
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])[0]
    compression = tags.get(_TAG_COMPRESSION, [1])[0]
    photometric = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if bits not in (8, 16):
        raise ValueError(f"unsupported TIFF bit depth {bits}; 8/16 only")
    if compression not in (1, 5, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression}; uncompressed (1), "
            "LZW (5) and PackBits (32773) are implemented (JPEG-in-TIFF "
            "needs external codecs)"
        )
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}; 1/2 only")
    if predictor == 2 and bits != 8:
        raise ValueError("TIFF horizontal predictor implemented for 8-bit only")

    row_bytes = w * spp * (bits // 8)
    raster = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("truncated TIFF strip")
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if compression == 32773:
            raster += _packbits_decode(strip, row_bytes * n_rows)
        elif compression == 5:
            raster += _tiff_lzw_decode(strip, row_bytes * n_rows)
        else:
            raster += strip[: row_bytes * n_rows]
    if len(raster) < row_bytes * h:
        raise ValueError("TIFF strips shorter than image")

    if bits == 8:
        arr = np.frombuffer(bytes(raster[: row_bytes * h]), dtype=np.uint8)
        arr = arr.reshape(h, w, spp)
        if predictor == 2:  # horizontal differencing: undo with a cumsum
            arr = np.cumsum(arr.astype(np.uint32), axis=1, dtype=np.uint32)
            arr = (arr & 0xFF).astype(np.uint8)
    else:
        dt = np.dtype(np.uint16).newbyteorder(e)
        arr = np.frombuffer(bytes(raster[: row_bytes * h]), dtype=dt)
        arr = (arr.reshape(h, w, spp) >> 8).astype(np.uint8)
    if photometric == 0:  # WhiteIsZero: invert to the usual BlackIsZero
        arr = 255 - arr
    return arr


def encode_tiff(
    img: np.ndarray,
    packbits: bool = False,
    big_endian: bool = False,
    lzw: bool = False,
    predictor: bool = False,
) -> bytes:
    """Encode (H, W) or (H, W, C) uint8 as a single-strip baseline TIFF.
    ``lzw=True`` uses LZW (compression 5); ``predictor=True`` applies
    horizontal differencing (tag 317 = 2) before compression."""
    if packbits and lzw:
        raise ValueError("choose one compression")
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, spp = img.shape
    if spp not in (1, 2, 3, 4):
        raise ValueError(f"unsupported samples-per-pixel {spp}")
    e = ">" if big_endian else "<"
    if predictor:
        diffed = img.astype(np.int32)
        diffed[:, 1:] -= img[:, :-1].astype(np.int32)
        raster = (diffed & 0xFF).astype(np.uint8).tobytes()
    else:
        raster = img.tobytes()
    if packbits:
        row_bytes = w * spp
        raster = b"".join(
            _packbits_encode(raster[r * row_bytes : (r + 1) * row_bytes])
            for r in range(h)
        )
    elif lzw:
        raster = _tiff_lzw_encode(raster)

    # layout: header(8) | raster | bits-per-sample array (if spp>2) | IFD.
    # TIFF requires tag values of <= 4 bytes INLINE in the entry — so the
    # BitsPerSample SHORTs go out-of-line only when spp >= 3 (2*spp > 4);
    # spp=2 (gray+alpha) inlines its two SHORTs.
    data_off = 8
    bits_off = data_off + len(raster)
    ifd_off = bits_off + (2 * spp if spp > 2 else 0)

    entries = []

    def entry(tag, ttype, count, value):
        entries.append(struct.pack(e + "HHI", tag, ttype, count) + value)

    def short_val(v):
        return struct.pack(e + "HH", v, 0)

    def long_val(v):
        return struct.pack(e + "I", v)

    entry(_TAG_WIDTH, 4, 1, long_val(w))
    entry(_TAG_HEIGHT, 4, 1, long_val(h))
    if spp > 2:
        entry(_TAG_BITS, 3, spp, long_val(bits_off))
    elif spp == 2:
        entry(_TAG_BITS, 3, 2, struct.pack(e + "HH", 8, 8))
    else:
        entry(_TAG_BITS, 3, 1, short_val(8))
    entry(_TAG_COMPRESSION, 3, 1, short_val(32773 if packbits else 5 if lzw else 1))
    entry(_TAG_PHOTOMETRIC, 3, 1, short_val(2 if spp >= 3 else 1))
    entry(_TAG_STRIP_OFFSETS, 4, 1, long_val(data_off))
    entry(_TAG_SPP, 3, 1, short_val(spp))
    entry(_TAG_ROWS_PER_STRIP, 4, 1, long_val(h))
    entry(_TAG_STRIP_COUNTS, 4, 1, long_val(len(raster)))
    if predictor:
        entry(_TAG_PREDICTOR, 3, 1, short_val(2))
    entries.sort(key=lambda b: struct.unpack(e + "H", b[:2])[0])

    out = bytearray()
    out += (b"II*\x00" if not big_endian else b"MM\x00*")
    out += struct.pack(e + "I", ifd_off)
    out += raster
    if spp > 2:
        out += struct.pack(e + "H" * spp, *([8] * spp))
    out += struct.pack(e + "H", len(entries))
    for ent in entries:
        out += ent
    out += struct.pack(e + "I", 0)  # no next IFD
    return bytes(out)
