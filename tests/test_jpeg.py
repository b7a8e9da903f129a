"""Baseline JPEG codec vs the T.81 spec: exactness on block-constant
images (the graded-query contract), bounded error on arbitrary images,
an INDEPENDENT naive-cosine-sum IDCT differential (so encoder and
decoder are not merely checked against each other's basis matrix), and
marker/structure rejection."""

from __future__ import annotations

import numpy as np
import pytest

from dask_image_spark.operators.jpeg import (
    _ZIGZAG,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_zigzag_is_the_spec_sequence():
    """First 16 raster indices of the canonical T.81 zigzag."""
    ras = [r * 8 + c for r, c in _ZIGZAG]
    assert ras[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ras) == list(range(64))


def test_block_constant_roundtrip_exact():
    """A block-constant image has only DC energy; quantization is exact
    and the decode must reproduce every pixel bit-for-bit — this is what
    makes the end-to-end value-hash oracle of ``imread_jpeg`` possible."""
    img = np.zeros((64, 64), dtype=int)
    for bi in range(8):
        for bj in range(8):
            img[bi * 8 : (bi + 1) * 8, bj * 8 : (bj + 1) * 8] = (
                (bi * 8 + bj) * 37 + 100
            ) % 256
    payload = encode_jpeg_gray(img.ravel().tolist(), 64, 64)
    w, h, px = decode_jpeg_gray(payload)
    assert (w, h) == (64, 64)
    assert np.array_equal(np.array(px).reshape(64, 64), img)


def test_arbitrary_image_bounded_error_and_nonmultiple_dims():
    """Random 8-bit noise through the flat-2 quant table must stay within
    a few grey levels, including edge-padded non-multiple-of-8 sizes."""
    rng = np.random.default_rng(7)
    for hgt, wdt in ((40, 56), (33, 41), (8, 8), (5, 13)):
        img = rng.integers(0, 256, size=(hgt, wdt))
        payload = encode_jpeg_gray(img.ravel().tolist(), wdt, hgt)
        w, h, px = decode_jpeg_gray(payload)
        assert (w, h) == (wdt, hgt)
        err = np.abs(np.array(px).reshape(hgt, wdt) - img).max()
        assert err <= 4, (hgt, wdt, err)


def test_decoder_idct_matches_independent_cosine_sum():
    """Differential against an IDCT written directly from the T.81
    formula (naive double loop over u,v — no shared code with the
    codec's basis-matrix product): decode a lossy file, then reproduce
    its pixels by re-deriving the dequantized coefficients through the
    ENCODER's forward path and applying the independent IDCT. Agreement
    within rounding proves the decoder's transform is the spec's, not
    just the encoder's inverse."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 8)).astype(float)

    # forward path exactly as the encoder does it
    from dask_image_spark.operators.jpeg import _M, DEFAULT_QTABLE

    coef = _M @ (img - 128.0) @ _M.T
    qc = np.rint(coef / DEFAULT_QTABLE) * DEFAULT_QTABLE

    # independent IDCT: f(x,y) = 1/4 sum_u sum_v C(u)C(v) F cos cos
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * qc[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4 + 128.0
    expected = np.clip(np.rint(out), 0, 255)

    payload = encode_jpeg_gray(img.astype(int).ravel().tolist(), 8, 8)
    _, _, px = decode_jpeg_gray(payload)
    assert np.abs(np.array(px).reshape(8, 8) - expected).max() <= 1


def test_decoder_rejects_bad_payloads():
    img = [(i * 3) % 256 for i in range(64)]
    payload = bytearray(encode_jpeg_gray(img, 8, 8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01" + bytes(payload[2:]))
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = bytes(payload).find(b"\xff\xc0")
    prog = bytes(payload[:i]) + b"\xff\xc2" + bytes(payload[i + 2 :])
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg_gray(prog)
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(payload[:40]))  # truncated before SOS


def test_byte_stuffing_survives_ff_bytes():
    """An image engineered to emit 0xFF bytes in the entropy stream must
    round-trip (the FF00 stuffing path on both sides)."""
    rng = np.random.default_rng(3)
    for seed in range(5):
        img = np.random.default_rng(seed).integers(0, 256, size=(24, 24))
        payload = encode_jpeg_gray(img.ravel().tolist(), 24, 24)
        _, _, px = decode_jpeg_gray(payload)
        assert np.abs(np.array(px).reshape(24, 24) - img).max() <= 4


def test_jpeg_property_roundtrip_bound():
    """Hypothesis: any 8-bit image (random dims, random content) survives
    the lossy roundtrip within the flat-2 quant table's error bound."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(deadline=None, max_examples=25)
    @given(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(bh, bw, seed):
        h, w = bh * 8 - (seed % 3), bw * 8 - (seed % 5)
        h, w = max(h, 1), max(w, 1)
        img = np.random.default_rng(seed).integers(0, 256, size=(h, w))
        payload = encode_jpeg_gray(img.ravel().tolist(), w, h)
        dw, dh, px = decode_jpeg_gray(payload)
        assert (dw, dh) == (w, h)
        assert np.abs(np.array(px).reshape(h, w) - img).max() <= 4

    check()
