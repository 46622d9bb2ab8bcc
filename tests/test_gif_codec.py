"""Pure-Python GIF codec (operators/gifcodec.py): encoder-fixture
round-trips across every decoder path, plus a hand-assembled GIF87a golden
(bytes and LZW bit-packing computed by hand from the spec, independent of
the repo's encoder)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.operators.gifcodec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)

PAL4 = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], dtype=np.uint8
)


def _rng(seed=42):
    return np.random.default_rng(seed)


def test_roundtrip_4color():
    img = _rng().integers(0, 4, (37, 53)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img, PAL4)), PAL4[img])


def test_roundtrip_256color_forces_width_growth_and_dict_reset():
    rng = _rng(7)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    img = rng.integers(0, 256, (200, 300)).astype(np.uint8)  # >4096 LZW entries
    assert np.array_equal(decode_gif(encode_gif(img, pal)), pal[img])


def test_roundtrip_interlaced():
    img = _rng(3).integers(0, 4, (23, 31)).astype(np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(img, PAL4, interlace=True)), PAL4[img]
    )


def test_repetitive_image_compresses_and_roundtrips():
    img = np.tile(np.arange(4, dtype=np.uint8), (64, 16))
    data = encode_gif(img, PAL4)
    assert len(data) < img.size  # LZW actually compresses the repetition
    assert np.array_equal(decode_gif(data), PAL4[img])


def test_multiframe_and_transparency_composite():
    rng = _rng(42)
    a = rng.integers(0, 4, (37, 53)).astype(np.uint8)
    b = rng.integers(0, 4, (37, 53)).astype(np.uint8)
    frames = decode_gif_frames(encode_gif([a, b], PAL4, transparent=0))
    assert len(frames) == 2
    comp = np.zeros((37, 53, 3), dtype=np.uint8)
    comp[a != 0] = PAL4[a][a != 0]
    assert np.array_equal(frames[0][..., :3], comp)
    comp[b != 0] = PAL4[b][b != 0]
    assert np.array_equal(frames[1][..., :3], comp)
    assert np.array_equal(
        frames[1][..., 3], ((a != 0) | (b != 0)).astype(np.uint8) * 255
    )


def test_multimodal_router_decodes_gif():
    from datapipelines_spark.operators.multimodal import decode_array

    img = _rng(9).integers(0, 4, (8, 8)).astype(np.uint8)
    assert np.array_equal(decode_array(encode_gif(img, PAL4)), PAL4[img])


@pytest.mark.parametrize(
    "payload", [b"", b"GIF", b"GIF89a" + b"\x00" * 5, b"notagif" * 4]
)
def test_garbage_rejected(payload):
    with pytest.raises(ValueError):
        decode_gif(payload)


def test_truncated_stream_does_not_hang():
    img = _rng(1).integers(0, 4, (16, 16)).astype(np.uint8)
    data = encode_gif(img, PAL4)
    with pytest.raises(ValueError):
        decode_gif(data[: len(data) // 2])


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncol=st.sampled_from([2, 4, 16, 256]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(h, w, ncol, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    img = rng.integers(0, ncol, (h, w)).astype(np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(img, pal, interlace=interlace)), pal[img]
    )


# --- golden: hand-assembled GIF87a, bytes computed from the spec -------------
#
# 3x2, 2-color global table (black, white), indices [[1,0,1],[0,1,0]].
# LZW with min_code_size=2: clear=4 end=5, codes emitted
# 4,1,0,6,6,5 at widths 3,3,3,3,4,4; LSB-first packing -> bytes 0C 6C 05.
GOLDEN_GIF = bytes(
    [
        *b"GIF87a",
        0x03, 0x00, 0x02, 0x00,  # logical screen 3x2
        0x80,  # GCT present, 2 entries
        0x00, 0x00,  # bg index, aspect
        0x00, 0x00, 0x00,  # palette[0] = black
        0xFF, 0xFF, 0xFF,  # palette[1] = white
        0x2C,  # image descriptor
        0x00, 0x00, 0x00, 0x00, 0x03, 0x00, 0x02, 0x00,  # at (0,0), 3x2
        0x00,  # not interlaced, no local table
        0x02,  # LZW min code size
        0x03, 0x0C, 0x6C, 0x05,  # one 3-byte data sub-block
        0x00,  # block terminator
        0x3B,  # trailer
    ]
)


def test_golden_hand_assembled_gif87a():
    img = decode_gif(GOLDEN_GIF)
    expect = np.array(
        [
            [[255, 255, 255], [0, 0, 0], [255, 255, 255]],
            [[0, 0, 0], [255, 255, 255], [0, 0, 0]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(img, expect)


def test_golden_frames_are_fully_opaque():
    (frame,) = decode_gif_frames(GOLDEN_GIF)
    assert np.all(frame[..., 3] == 255)

# --- GCE scoping and disposal method 3 (restore-to-previous) -----------------


import struct

from datapipelines_spark.operators.gifcodec import _lzw_encode


def _frame_block(idx, min_code, gce=None):
    """Assemble one image block, optionally preceded by a GCE.

    gce = (disposal, transparent_index_or_None)."""
    out = bytearray()
    if gce is not None:
        disposal, transparent = gce
        flags = ((disposal & 7) << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
    h, w = idx.shape
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    data = _lzw_encode(min_code, idx.reshape(-1).tolist())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _assemble(pal, h, w, blocks):
    size_bits = max(1, int(len(pal) - 1).bit_length()) - 1
    n = 2 << size_bits
    gct = np.concatenate([pal, np.zeros((n - len(pal), 3), dtype=np.uint8)])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_bits, 0, 0]) + gct.tobytes()
    for b in blocks:
        out += b
    out += b"\x3B"
    return bytes(out)


def test_disposal3_restores_state_before_current_frame():
    # f1 solid green (disposal=keep), f2 solid blue (disposal=3), f3 fully
    # transparent. After f2's restore-to-previous, f3 must show f1's pixels.
    h, w, mc = 4, 5, 2
    f1 = np.full((h, w), 1, dtype=np.uint8)
    f2 = np.full((h, w), 2, dtype=np.uint8)
    f3 = np.zeros((h, w), dtype=np.uint8)
    gif = _assemble(
        PAL4, h, w,
        [
            _frame_block(f1, mc, gce=(1, None)),
            _frame_block(f2, mc, gce=(3, None)),
            _frame_block(f3, mc, gce=(0, 0)),  # every pixel transparent
        ],
    )
    frames = decode_gif_frames(gif)
    assert len(frames) == 3
    assert np.array_equal(frames[1][..., :3], np.broadcast_to(PAL4[2], (h, w, 3)))
    assert np.array_equal(frames[2], frames[0])  # f1 restored, not blank


def test_gce_applies_only_to_next_rendering_block():
    # f1 has transparent=0; f2 carries NO GCE, so index 0 must render opaque.
    h, w, mc = 3, 4, 2
    idx = np.array(
        [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1]], dtype=np.uint8
    )
    gif = _assemble(
        PAL4, h, w,
        [_frame_block(idx, mc, gce=(0, 0)), _frame_block(idx, mc, gce=None)],
    )
    frames = decode_gif_frames(gif)
    assert np.array_equal(frames[0][..., 3], (idx != 0).astype(np.uint8) * 255)
    assert np.all(frames[1][..., 3] == 255)
    assert np.array_equal(frames[1][..., :3], PAL4[idx])
