"""Baseline JPEG codec vectors (kernels/jpeg.py): roundtrip accuracy bounds,
subsampling, marker handling, and visible fallback on unsupported files.

The container has no libjpeg/PIL, so correctness is pinned by construction:
an encoder and decoder written independently of each other's internals
(shared only the table constants), exact reconstruction cases (solid color
= pure DC), and structural assertions on the emitted marker stream.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_parser_spark.kernels.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def test_solid_color_roundtrips_exactly():
    # a flat block is pure DC; quantization of a constant is lossless
    solid = np.full((24, 40, 3), 130, np.uint8)
    out = decode_jpeg(encode_jpeg(solid))
    assert out.shape == solid.shape
    assert int(np.abs(out.astype(int) - solid.astype(int)).max()) == 0


@pytest.mark.parametrize("subsample", [False, True])
def test_smooth_gradient_within_bounds(subsample):
    smooth = np.tile(
        np.linspace(30, 220, 64, dtype=np.uint8)[None, :, None], (48, 1, 3)
    )
    out = decode_jpeg(encode_jpeg(smooth, subsample=subsample))
    assert out.shape == smooth.shape
    err = np.abs(out.astype(int) - smooth.astype(int)).mean()
    assert err < 4.0, err


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (33, 50), (17, 64)])
def test_odd_dimensions_roundtrip(shape):
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(rgb, subsample=sub))
        assert out.shape == rgb.shape


def test_marker_stream_structure():
    data = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    assert is_jpeg(data) and data[-2:] == b"\xff\xd9"
    # SOI, APP0(JFIF), 2x DQT, SOF0, 2x DHT, SOS present in order
    for marker in (b"\xff\xe0JFIF"[:2], b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    # SOF0 carries the dimensions
    i = data.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack(">BHHB", data[i + 4 : i + 10])
    assert (prec, h, w, nc) == (8, 8, 8, 3)


def test_progressive_sof_raises():
    data = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF2: progressive
    with pytest.raises(JpegError, match="progressive") as ei:
        decode_jpeg(bytes(data))
    assert ei.value.status == "unsupported_progressive"


def test_truncated_jpeg_flags_fallback():
    from pdf_parser_spark.kernels.images import decode_image_ex

    good = encode_jpeg(np.full((16, 16, 3), 77, np.uint8))
    arr, ok = decode_image_ex(good)
    # DC of 77 quantizes on a .5 boundary -> off-by-one is correct lossy
    assert ok and arr.shape == (16, 16, 3) and abs(int(arr[0, 0, 0]) - 77) <= 1
    arr, ok = decode_image_ex(good[: len(good) // 2])
    assert not ok  # fabricated pixels, visibly flagged


def test_large_entropy_stream_decodes_in_linear_time():
    # noise image -> ~230 KB entropy stream; before the accumulator-masking
    # fix the bit reader was quadratic (measured ~20 s at 105 KB) and this
    # would take minutes. Linear decode is ~1 s; 15 s is a generous ceiling
    # even on the noisy shared host.
    import time

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(384, 384, 3), dtype=np.uint8)
    data = encode_jpeg(rgb)
    assert len(data) > 100_000
    t0 = time.time()
    out = decode_jpeg(data)
    assert out.shape == rgb.shape
    assert time.time() - t0 < 15.0


def test_fill_bytes_before_marker_are_skipped():
    # B.1.1.2: any number of 0xFF fill bytes may precede a marker id
    data = encode_jpeg(np.full((16, 16, 3), 90, np.uint8))
    i = data.index(b"\xff\xc0")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]  # 3 fill bytes before SOF0
    out = decode_jpeg(padded)
    assert out.shape == (16, 16, 3)
    assert abs(int(out[0, 0, 0]) - 90) <= 1


def test_multi_scan_baseline_raises_visibly():
    # a 1-component SOS against a 3-component frame must fall back (raise),
    # not silently return gray-replicated RGB from the Y scan alone
    data = encode_jpeg(np.full((8, 8, 3), 120, np.uint8))
    i = data.index(b"\xff\xda")
    ns = data[i + 4]
    assert ns == 3
    cid = data[i + 5]
    one_comp_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, cid, 0x00, 0, 63, 0])
    sos_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
    spliced = data[:i] + one_comp_sos + data[i + 2 + sos_len :]
    with pytest.raises(JpegError, match="multi-scan"):
        decode_jpeg(spliced)


def test_subsampled_chroma_still_carries_color():
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, :, 0] = 200  # red field
    out = decode_jpeg(encode_jpeg(rgb, subsample=True))
    mean = out.reshape(-1, 3).mean(axis=0)
    assert mean[0] > 150 and mean[1] < 80 and mean[2] < 80, mean
