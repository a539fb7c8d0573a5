"""Baseline-JPEG decoder tests (operators/multimodal.py decode_jpeg).

A minimal spec-conforming ENCODER lives here in the tests (fixed-
length Huffman tables, quality-1 quant) so the decoder is exercised
end-to-end on real entropy-coded streams: grayscale DC-only,
grayscale with AC coefficients (checked against an independent
numpy IDCT reference), 4:4:4 color, 4:2:0 subsampled color, and
restart markers.  The encoder is test-only by design — the engine's
job is decoding corpus media, not producing it.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_s3_read_write_spark.operators import multimodal as M

# ---------------------------------------------------------------- encoder

# DC: categories 0..11, all 4-bit codes (12 <= 15 so the all-ones
# 4-bit code stays unused, as the spec recommends).
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
# AC: every (run,size) symbol the spec defines, all 9-bit codes.
_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0] * 8 + [len(_AC_VALS)] + [0] * 7


def _codes(bits, vals):
    out, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (ln, code)
            code += 1
            i += 1
        code <<= 1
    return out


_DC_CODE = _codes(_DC_BITS, _DC_VALS)
_AC_CODE = _codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0
        return bytes(self.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _fdct_block(block: np.ndarray) -> np.ndarray:
    """Forward orthonormal 8x8 DCT of a level-shifted block."""
    return M._DCT_C @ block @ M._DCT_C.T


def _encode_block(w: _BitWriter, coef_zz: np.ndarray, pred: int) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    ln, code = _DC_CODE[size]
    w.put(code, ln)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODE[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        size = int(abs(v)).bit_length()
        ln, code = _AC_CODE[(run << 4) | size]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        ln, code = _AC_CODE[0x00]  # EOB
        w.put(code, ln)
    return dc


def _headers(w: int, h: int, comps: list[tuple[int, int, int]]) -> bytes:
    """SOI..SOS headers; comps = [(id, h_samp, v_samp), ...]."""
    out = b"\xff\xd8"
    out += _seg(0xDB, b"\x00" + bytes([1] * 64))  # DQT id0, all ones
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
    sos = bytes([len(comps)])
    for cid, _hs, _vs in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    return out


def _block_zz(plane: np.ndarray, y: int, x: int) -> np.ndarray:
    coef = _fdct_block(plane[y : y + 8, x : x + 8].astype(np.float64) - 128.0)
    return np.round(coef.reshape(64))[M._ZIGZAG].astype(np.int32)


def encode_jpeg_gray(px: np.ndarray) -> bytes:
    h, w = px.shape
    assert h % 8 == 0 and w % 8 == 0, "test encoder: multiples of 8 only"
    bw = _BitWriter()
    pred = 0
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            zz = _block_zz(px, y, x)
            pred = _encode_block(bw, zz, pred)
    return _headers(w, h, [(1, 1, 1)]) + bw.flush() + b"\xff\xd9"


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def encode_jpeg_444(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    assert h % 8 == 0 and w % 8 == 0
    ycc = _rgb_to_ycbcr(rgb)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            for ci in range(3):
                zz = _block_zz(ycc[..., ci], y, x)
                preds[ci] = _encode_block(bw, zz, preds[ci])
    return _headers(w, h, [(1, 1, 1), (2, 1, 1), (3, 1, 1)]) + bw.flush() + b"\xff\xd9"


def encode_jpeg_420(rgb: np.ndarray) -> bytes:
    """4:2:0: per MCU 4 Y blocks + 1 Cb + 1 Cr (chroma = 2x2 mean)."""
    h, w = rgb.shape[:2]
    assert h % 16 == 0 and w % 16 == 0
    ycc = _rgb_to_ycbcr(rgb)
    ysub = ycc[..., 0]
    csub = ycc.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))[..., 1:]
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for by in (0, 8):
                for bx in (0, 8):
                    zz = _block_zz(ysub, my + by, mx + bx)
                    preds[0] = _encode_block(bw, zz, preds[0])
            for ci in (0, 1):
                zz = _block_zz(csub[..., ci], my // 2, mx // 2)
                preds[ci + 1] = _encode_block(bw, zz, preds[ci + 1])
    return _headers(w, h, [(1, 2, 2), (2, 1, 1), (3, 1, 1)]) + bw.flush() + b"\xff\xd9"


# ----------------------------------------------------------------- tests


def test_gray_dc_only_roundtrip():
    """Blockwise-constant image: DC-only blocks decode exactly."""
    base = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20 + 10
    px = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)  # 24x32
    w, h, c, got = M.decode_jpeg(encode_jpeg_gray(px))
    assert (w, h, c) == (32, 24, 1)
    assert np.array_equal(got[:, :, 0], px)


def test_gray_ac_coefficients_against_idct_reference():
    """A textured gradient exercises AC huffman/zigzag/ZRL; decoded
    pixels must match an independent IDCT of the quantized coefficients
    (exact integer coefficients at q=1, so error is IDCT rounding only)."""
    yy, xx = np.mgrid[0:16, 0:16]
    px = ((np.sin(xx / 2.5) + np.cos(yy / 3.1)) * 50 + 120).astype(np.uint8)
    w, h, c, got = M.decode_jpeg(encode_jpeg_gray(px))
    assert (w, h, c) == (16, 16, 1)
    # independent reference: quantize exactly as the encoder did, then IDCT
    ref = np.empty_like(px, dtype=np.float64)
    for y in range(0, 16, 8):
        for x in range(0, 16, 8):
            coef = np.round(
                _fdct_block(px[y : y + 8, x : x + 8].astype(np.float64) - 128.0)
            )
            ref[y : y + 8, x : x + 8] = M._DCT_C.T @ coef @ M._DCT_C + 128.0
    ref = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], ref)
    assert got[:, :, 0].std() > 10  # non-vacuous: real texture survived


def test_color_444_roundtrip():
    rgb = np.zeros((8, 16, 3), dtype=np.uint8)
    rgb[:, :8] = (200, 40, 40)
    rgb[:, 8:] = (30, 60, 190)
    w, h, c, got = M.decode_jpeg(encode_jpeg_444(rgb))
    assert (w, h, c) == (16, 8, 3)
    # YCbCr forward+inverse is float; allow +/-2 rounding per channel
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 2


def test_color_420_subsampled_roundtrip():
    rgb = np.full((16, 32, 3), (90, 160, 60), dtype=np.uint8)
    w, h, c, got = M.decode_jpeg(encode_jpeg_420(rgb))
    assert (w, h, c) == (32, 16, 3)
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 2


def test_jpeg_rejects_progressive():
    bad = (
        b"\xff\xd8"
        + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="progressive"):
        M.decode_jpeg(bad)


def test_decode_image_routes_jpeg_and_png():
    px = np.full((8, 8), 77, dtype=np.uint8)
    w, h, c, got = M.decode_image(encode_jpeg_gray(px))
    assert (w, h, c) == (8, 8, 1) and got[0, 0, 0] == 77
    w, h, c, got = M.decode_image(M.encode_png(px))
    assert (w, h, c) == (8, 8, 1) and got[0, 0, 0] == 77


def test_real_feature_on_jpeg_bytes():
    px = np.full((8, 8), 100, dtype=np.uint8)
    feat = M._real_feature(encode_jpeg_gray(px))
    assert feat.shape == (8,)
    assert abs(feat[0] - 100 / 255) < 0.01  # mean channel value
    assert abs(feat[1]) < 0.01              # std of a constant image


def test_jpeg_property_random_images_match_idct_reference():
    """Property test: arbitrary 8-multiple grayscale images round-trip
    through encode->decode to exactly the IDCT-of-quantized-coefficients
    reference — huffman coding, byte stuffing, category/EXTEND signs,
    ZRL runs and EOB all exercised on adversarial noise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.sampled_from([(8, 8), (8, 16), (16, 16), (24, 8)]),
            elements=st.integers(0, 255),
        )
    )
    def prop(px):
        w, h, c, got = M.decode_jpeg(encode_jpeg_gray(px))
        assert (w, h, c) == (px.shape[1], px.shape[0], 1)
        ref = np.empty(px.shape, dtype=np.float64)
        for y in range(0, px.shape[0], 8):
            for x in range(0, px.shape[1], 8):
                coef = np.round(
                    _fdct_block(px[y : y + 8, x : x + 8].astype(np.float64) - 128.0)
                )
                ref[y : y + 8, x : x + 8] = M._DCT_C.T @ coef @ M._DCT_C + 128.0
        ref = np.clip(np.round(ref), 0, 255).astype(np.uint8)
        assert np.array_equal(got[:, :, 0], ref)

    prop()
