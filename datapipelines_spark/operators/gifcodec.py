"""Pure-Python GIF codec (GIF87a/GIF89a) — no third-party libraries.

Decoder: LZW with variable code width (spec Appendix F), global and local
color tables, interlaced images (the 4-pass row order), Graphic Control
Extensions (transparency, disposal methods 0-3, with the GCE scoped to the
single rendering block that follows it per spec), and multi-frame animations
composited onto the logical screen. Encoder: single- or multi-frame with a
real LZW compressor (dictionary reset on overflow via Clear codes) — used
by the round-trip tests; the golden tests hand-assemble streams
independently (tests/test_gif_codec.py).

Reference behavior matched: the reference pipeline decoded images with
PIL-backed handlers (/root/reference/sdata/datapipeline.py:525-527,
/root/reference/sdata/mappers/sample_mappers.py:88-123); GIF is in PIL's
default surface, so an in-repo decoder keeps that parity without shipping
codecs. Spec: CompuServe GIF89a specification (public), W3C mirror.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --- LZW ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> list[int]:
    """GIF-LZW: variable width, LSB-first bit packing, Clear/End codes."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: return what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + [entry[0]])
        elif code == len(dictionary):  # the KwKwK case
            entry = prev + [prev[0]]
            dictionary.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and len(dictionary) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:  # dictionary full: reset per spec
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (sym,)
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def _read_color_table(data: bytes, pos: int, size_bits: int):
    n = 2 << size_bits  # 2^(size+1)
    table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    return table, pos + 3 * n


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + ln])
        pos += ln


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """All frames composited onto the logical screen, each (H, W, 4) uint8
    RGBA (alpha 0 only where a transparent index left the screen unpainted).
    Raises ValueError on non-GIF/truncated input."""
    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (
        b"87a",
        b"89a",
    ):
        raise ValueError("not a GIF: bad signature")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg_index, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, packed & 0x07)

    screen = np.zeros((h, w, 4), dtype=np.uint8)  # transparent logical screen
    if gct is not None and not (packed & 0x80 and bg_index >= len(gct)):
        pass  # background is left transparent: browsers do the same
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            raw, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(raw) >= 4:  # Graphic Control Extension
                flags = raw[0]
                disposal = (flags >> 2) & 0x07
                transparent = raw[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        ix, iy, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            table, pos = _read_color_table(payload, pos, ipacked & 0x07)
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = np.array(
            _lzw_decode(min_code, data, iw * ih), dtype=np.int64
        )
        if len(idx) < iw * ih:  # truncated: pad with background
            idx = np.pad(idx, (0, iw * ih - len(idx)))
        idx = idx[: iw * ih].reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            deinter = np.zeros_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, ih, step))
                deinter[start:ih:step] = idx[src : src + n_rows]
                src += n_rows
            idx = deinter
        rgba = np.empty((ih, iw, 4), dtype=np.uint8)
        safe = np.clip(idx, 0, len(table) - 1)
        rgba[..., :3] = table[safe]
        rgba[..., 3] = 255
        before = screen.copy()
        region = screen[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgba[opaque]
        else:
            region[...] = rgba
        frames.append(screen.copy())
        if disposal == 2:  # restore to background (transparent)
            screen[iy : iy + ih, ix : ix + iw] = 0
        elif disposal == 3:  # restore to state before THIS frame rendered
            screen = before.copy()
        # GIF89a: a Graphic Control Extension applies only to the first
        # rendering block that follows it — reset per-frame state.
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as (H, W, 3) RGB (alpha dropped over black) — the shape
    the multimodal feature stages consume."""
    f = decode_gif_frames(payload)[0]
    alpha = f[..., 3:4].astype(np.uint16)
    rgb = (f[..., :3].astype(np.uint16) * alpha // 255).astype(np.uint8)
    return rgb


# --- encoder (for round-trip tests and shard fixtures) -----------------------


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Encode index frames (each (H, W) uint8 into ``palette`` (N, 3)) as an
    (animated when len>1) GIF89a with a global color table."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    size_bits = max(1, int(len(pal) - 1).bit_length()) - 1
    n_entries = 2 << size_bits
    if len(pal) > n_entries:
        size_bits += 1
        n_entries = 2 << size_bits
    pad = np.zeros((n_entries - len(pal), 3), dtype=np.uint8)
    gct = np.concatenate([pal, pad])

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_bits, 0, 0])
    out += gct.tobytes()
    min_code = max(2, size_bits + 1)
    for f in frames:
        if transparent is not None or len(frames) > 1:
            flags = 0x01 if transparent is not None else 0x00
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
        fh, fw = f.shape
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        rows = f
        if interlace:
            parts = [f[start::step] for start, step in _INTERLACE_PASSES]
            rows = np.concatenate([p for p in parts if len(p)])
        out += bytes([min_code])
        data = _lzw_encode(min_code, rows.reshape(-1).tolist())
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
