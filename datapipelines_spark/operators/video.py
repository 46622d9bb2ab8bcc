"""MP4 / ISO-BMFF metadata probe, pure Python (public ISO 14496-12 spec).

Video corpora get FILTERED long before they get decoded: a training-data
pipeline drops clips by duration, resolution, and codec as a metadata pass,
then pays decode cost only for survivors. Decoding H.264/H.265 payloads
needs native codecs this container doesn't ship — but the container-level
metadata needs only box parsing: walk the box tree, read mvhd (movie
duration/timescale), tkhd (track dims), mdhd+hdlr (per-track timescale and
handler type), and stsd (sample-entry fourcc). ``probe_mp4`` is the
ffprobe-lite that powers that filter step; payload stays opaque binary.
"""

from __future__ import annotations

import struct


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the sibling boxes in
    [start, end); handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                break
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError("malformed MP4 box size")
        yield btype, pos + header, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box at the given nested path, as (body_start, body_end)."""
    lo, hi = start, end
    for name in path:
        found = None
        for btype, b0, b1 in _iter_boxes(data, lo, hi):
            if btype == name:
                found = (b0, b1)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


def probe_mp4(payload: bytes) -> dict:
    """Parse container metadata from MP4/MOV bytes without decoding.

    Returns: duration_s, timescale, n_tracks, and per-track dicts with
    handler ('vide'/'soun'/...), codec fourcc, width/height (video), and
    track duration. Raises ValueError for non-ISO-BMFF payloads.
    """
    if len(payload) < 12:
        raise ValueError("too short to be an MP4")
    # an ISO-BMFF stream begins with a box; require a sane leading box type
    lead = payload[4:8]
    if lead not in (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide", b"styp"):
        raise ValueError("not an ISO-BMFF (MP4/MOV) payload")

    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 without moov box (streaming-fragmented not supported)")
    m0, m1 = moov

    duration_s = None
    timescale = None
    mvhd = _find(payload, m0, m1, b"mvhd")
    if mvhd is not None:
        b0, _ = mvhd
        version = payload[b0]
        if version == 1:
            timescale = int.from_bytes(payload[b0 + 20:b0 + 24], "big")
            duration = int.from_bytes(payload[b0 + 24:b0 + 32], "big")
        else:
            timescale = int.from_bytes(payload[b0 + 12:b0 + 16], "big")
            duration = int.from_bytes(payload[b0 + 16:b0 + 20], "big")
        duration_s = duration / timescale if timescale else None

    tracks = []
    for btype, t0, t1 in _iter_boxes(payload, m0, m1):
        if btype != b"trak":
            continue
        info: dict = {"handler": None, "codec": None, "width": None,
                      "height": None, "duration_s": None}
        tkhd = _find(payload, t0, t1, b"tkhd")
        if tkhd is not None:
            b0, _ = tkhd
            version = payload[b0]
            # width/height are the LAST 8 bytes of tkhd, 16.16 fixed point:
            # fullbox(4) + times/track/reserved/duration (32 v1 / 20 v0) +
            # reserved/layer/group/volume/matrix (52)
            off = b0 + (88 if version == 1 else 76)
            info["width"] = int.from_bytes(payload[off:off + 4], "big") / 65536.0
            info["height"] = int.from_bytes(payload[off + 4:off + 8], "big") / 65536.0
        mdia = _find(payload, t0, t1, b"mdia")
        if mdia is not None:
            d0, d1 = mdia
            hdlr = _find(payload, d0, d1, b"hdlr")
            if hdlr is not None:
                b0, _ = hdlr
                info["handler"] = payload[b0 + 8:b0 + 12].decode("latin1")
            mdhd = _find(payload, d0, d1, b"mdhd")
            if mdhd is not None:
                b0, _ = mdhd
                version = payload[b0]
                if version == 1:
                    ts = int.from_bytes(payload[b0 + 20:b0 + 24], "big")
                    dur = int.from_bytes(payload[b0 + 24:b0 + 32], "big")
                else:
                    ts = int.from_bytes(payload[b0 + 12:b0 + 16], "big")
                    dur = int.from_bytes(payload[b0 + 16:b0 + 20], "big")
                info["duration_s"] = dur / ts if ts else None
            stsd = _find(payload, d0, d1, b"minf", b"stbl", b"stsd")
            if stsd is not None:
                b0, b1 = stsd
                n_entries = int.from_bytes(payload[b0 + 4:b0 + 8], "big")
                if n_entries >= 1 and b0 + 16 <= b1:
                    info["codec"] = payload[b0 + 12:b0 + 16].decode("latin1")
        tracks.append(info)

    return {
        "duration_s": duration_s,
        "timescale": timescale,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# --- minimal writer for tests (a structurally-valid, payload-less MP4) -------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_test_mp4(
    duration_s: float = 2.5,
    timescale: int = 1000,
    width: int = 320,
    height: int = 240,
    codec: bytes = b"avc1",
) -> bytes:
    """Assemble a minimal structurally-valid MP4 (ftyp + moov with one video
    trak; no media data) so ``probe_mp4`` is testable against known values
    without any codec. Box layouts follow ISO 14496-12 verbatim."""
    dur = int(duration_s * timescale)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur) + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", dur) + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide"
                + b"\x00" * 12 + b"VideoHandler\x00")
    entry = _box(codec, b"\x00" * 78)  # visual sample entry, fields zeroed
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


# --- AVI (RIFF) with MJPEG streams — container demux, real frame decode ------
# Public Microsoft RIFF/AVI spec: RIFF('AVI ') { LIST('hdrl'){ 'avih',
# LIST('strl'){ 'strh','strf', ...} }, LIST('movi'){ '00dc' frames }, 'idx1' }.
# MJPEG AVIs carry one complete JPEG per '..dc' chunk, so the in-repo T.81
# decoder (operators/jpegcodec.py) makes this a fully decodable video path;
# inter-frame codecs (H.26x/VPx/AV1) stay external, stated plainly.


def _riff_chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        yield cid, pos + 8, pos + 8 + size
        pos += 8 + size + (size & 1)


def probe_avi(payload: bytes) -> dict:
    """AVI metadata: {width, height, n_frames, fps, codec} from the avih /
    strh / strf headers — the filter-pass companion to probe_mp4."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not AVI: missing RIFF/'AVI ' header")
    info: dict = {}
    for cid, s, e in _riff_chunks(payload, 12, len(payload)):
        if cid != b"LIST" or payload[s : s + 4] != b"hdrl":
            continue
        for c2, s2, e2 in _riff_chunks(payload, s + 4, e):
            if c2 == b"avih":
                us_per_frame = int.from_bytes(payload[s2 : s2 + 4], "little")
                info["n_frames"] = int.from_bytes(payload[s2 + 16 : s2 + 20], "little")
                info["width"] = int.from_bytes(payload[s2 + 32 : s2 + 36], "little")
                info["height"] = int.from_bytes(payload[s2 + 36 : s2 + 40], "little")
                info["fps"] = round(1e6 / us_per_frame, 6) if us_per_frame else 0.0
            elif c2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                for c3, s3, _e3 in _riff_chunks(payload, s2 + 4, e2):
                    if c3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                        info["codec"] = (
                            payload[s3 + 4 : s3 + 8].decode("ascii", "replace").strip()
                        )
    if "width" not in info:
        raise ValueError("AVI missing avih header")
    return info


def avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """The JPEG payload of every video ('..dc') chunk in the movi list, in
    stream order — feed each to operators/jpegcodec.decode_jpeg."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not AVI: missing RIFF/'AVI ' header")
    frames: list[bytes] = []
    for cid, s, e in _riff_chunks(payload, 12, len(payload)):
        if cid == b"LIST" and payload[s : s + 4] == b"movi":
            for c2, s2, e2 in _riff_chunks(payload, s + 4, e):
                if c2[2:4] == b"dc":
                    frames.append(payload[s2:e2])
    return frames


def build_test_avi(jpeg_frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Assemble a minimal MJPEG AVI from encoded JPEG frames (fixtures)."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = (
        int(1e6 // fps).to_bytes(4, "little") + bytes(12)
        + len(jpeg_frames).to_bytes(4, "little") + bytes(12)
        + width.to_bytes(4, "little") + height.to_bytes(4, "little") + bytes(16)
    )
    strh = (
        b"vids" + b"MJPG" + bytes(12)
        + (1).to_bytes(4, "little") + fps.to_bytes(4, "little")
        + (0).to_bytes(4, "little") + len(jpeg_frames).to_bytes(4, "little")
        + bytes(16)
    )
    strf = (
        (40).to_bytes(4, "little") + width.to_bytes(4, "little")
        + height.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + b"MJPG" + bytes(20)
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# --- YUV4MPEG2 (.y4m) — raw uncompressed video, fully decodable --------------
# Public mjpegtools format: textual stream header "YUV4MPEG2 W.. H.. F../..
# [C420/C444/Cmono]\n", then per-frame "FRAME...\n" + raw planar YCbCr.


def decode_y4m(payload: bytes) -> tuple[list, dict]:
    """(frames as (H, W) luma uint8 numpy arrays, header dict). Chroma
    planes are parsed (sizes per the colourspace tag) but the corpus
    feature stages consume luma; C420/C444/Cmono supported."""
    import numpy as np

    nl = payload.find(b"\x0a")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not YUV4MPEG2")
    width = height = None
    fps = 0.0
    cs = "C420"
    for tok in payload[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = round(int(num) / int(den), 6)
        elif tag == b"C":
            cs = "C" + val
    if not width or not height:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if cs.startswith("C420"):
        chroma = 2 * ((width // 2) * (height // 2))
    elif cs == "C444":
        chroma = 2 * width * height
    elif cs == "Cmono":
        chroma = 0
    else:
        raise ValueError(f"unsupported Y4M colourspace {cs}")
    luma = width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\x0a", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M: bad FRAME marker")
        pos = fnl + 1
        if pos + luma + chroma > len(payload):
            raise ValueError("Y4M: truncated frame")
        frames.append(
            np.frombuffer(payload[pos : pos + luma], dtype=np.uint8).reshape(
                height, width
            )
        )
        pos += luma + chroma
    return frames, {"width": width, "height": height, "fps": fps, "colourspace": cs}


def encode_y4m(frames, fps: int = 25, colourspace: str = "Cmono") -> bytes:
    """Encode (H, W) uint8 luma frames as a Cmono Y4M stream (fixtures)."""
    import numpy as np

    f0 = np.asarray(frames[0])
    h, w = f0.shape
    if colourspace != "Cmono":
        raise ValueError("encoder emits Cmono only")
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\x0a".encode())
    for f in frames:
        arr = np.asarray(f, dtype=np.uint8)
        if arr.shape != (h, w):
            raise ValueError("frame size mismatch")
        out += b"FRAME\x0a" + arr.tobytes()
    return bytes(out)
