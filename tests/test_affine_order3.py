"""Differential test of the cubic (order-3) affine path: Spark prefilter +
16-tap gather vs a dense numpy implementation of the identical spec
(IIR prefilter per axis, cubic B-spline sampling, whole-sample mirror
boundary) — upstream tests affine_transform orders the same way against
scipy.ndimage."""

from __future__ import annotations

import numpy as np
import pytest

from dask_image_spark.functions.boundary import remap_py
from dask_image_spark.functions.localrel import values_df
from dask_image_spark.operators import chunked, ndinterp

H, W = 14, 11
RNG = np.random.default_rng(21)
IMG = np.round(RNG.uniform(-3, 3, size=(H, W)), 3)


def _px(spark):
    rows = [(int(y), int(x), float(IMG[y, x])) for y in range(H) for x in range(W)]
    return values_df(spark, "y, x, value", rows)


def _b3(u: float) -> float:
    a = abs(u)
    if a <= 1:
        return 2.0 / 3.0 - a * a + a**3 / 2.0
    if a < 2:
        return (2.0 - a) ** 3 / 6.0
    return 0.0


def _np_affine3(img, matrix, offset):
    c = np.apply_along_axis(chunked.spline_filter1d_np, 0, img.astype(float))
    c = np.apply_along_axis(chunked.spline_filter1d_np, 1, c)
    (m00, m01), (m10, m11) = matrix
    o0, o1 = offset
    out = np.zeros_like(img, dtype=float)
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            fy = m00 * y + m01 * x + o0
            fx = m10 * y + m11 * x + o1
            y0, x0 = int(np.floor(fy)), int(np.floor(fx))
            acc = 0.0
            for cy in (-1, 0, 1, 2):
                wy = _b3(fy - (y0 + cy))
                if wy == 0.0:
                    continue
                sy = remap_py(y0 + cy, h, "mirror")
                for cx in (-1, 0, 1, 2):
                    wx = _b3(fx - (x0 + cx))
                    if wx == 0.0:
                        continue
                    sx = remap_py(x0 + cx, w, "mirror")
                    acc += wy * wx * c[sy, sx]
            out[y, x] = acc
    return out


def _grid(df):
    out = np.full((H, W), np.nan)
    for r in df.collect():
        out[r["y"], r["x"]] = r["v"]
    return out


@pytest.mark.parametrize(
    "matrix,offset",
    [
        ([[1.0, 0.0], [0.0, 1.0]], (0.0, 0.0)),  # identity -> reconstruction
        ([[0.7, 0.0], [0.0, 0.7]], (2.5, 5.25)),  # zoom + translate
        ([[0.9, 0.2], [-0.15, 0.85]], (1.0, -0.5)),  # full 2x2 with shear
    ],
)
def test_affine_order3_matches_numpy(spark, matrix, offset):
    got = _grid(ndinterp.affine_transform_order3(_px(spark), matrix, offset, (H, W)))
    want = _np_affine3(IMG, matrix, offset)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_affine_order3_identity_reconstructs(spark):
    got = _grid(
        ndinterp.affine_transform_order3(
            _px(spark), [[1.0, 0.0], [0.0, 1.0]], (0.0, 0.0), (H, W)
        )
    )
    np.testing.assert_allclose(got, IMG, rtol=1e-9, atol=1e-9)


def _np_affine_spline(img, matrix, offset, order):
    """Dense numpy reference for any spline order 2-5: the same prefilter
    cascade + separable basis gather spec the Spark operator implements."""
    c = np.apply_along_axis(
        lambda l: chunked.spline_filter1d_np(l, order=order), 0, img.astype(float)
    )
    c = np.apply_along_axis(
        lambda l: chunked.spline_filter1d_np(l, order=order), 1, c
    )
    (m00, m01), (m10, m11) = matrix
    o0, o1 = offset
    out = np.zeros_like(img, dtype=float)
    h, w = img.shape
    lo, hi = -(order // 2), order // 2 + 1
    for y in range(h):
        for x in range(w):
            fy = m00 * y + m01 * x + o0
            fx = m10 * y + m11 * x + o1
            y0, x0 = int(np.floor(fy)), int(np.floor(fx))
            acc = 0.0
            for cy in range(lo, hi + 1):
                wy = float(ndinterp.bspline_weight_np(fy - (y0 + cy), order))
                if wy == 0.0:
                    continue
                sy = remap_py(y0 + cy, h, "mirror")
                for cx in range(lo, hi + 1):
                    wx = float(ndinterp.bspline_weight_np(fx - (x0 + cx), order))
                    if wx == 0.0:
                        continue
                    sx = remap_py(x0 + cx, w, "mirror")
                    acc += wy * wx * c[sy, sx]
            out[y, x] = acc
    return out


@pytest.mark.parametrize("order", [2, 4, 5])
@pytest.mark.parametrize(
    "matrix,offset",
    [
        ([[1.0, 0.0], [0.0, 1.0]], (0.0, 0.0)),  # identity -> reconstruction
        ([[0.9, 0.2], [-0.15, 0.85]], (1.0, -0.5)),  # full 2x2 with shear
    ],
)
def test_affine_spline_orders_match_numpy(spark, order, matrix, offset):
    got = _grid(
        ndinterp.affine_transform_spline(
            _px(spark), matrix, offset, (H, W), order=order
        )
    )
    want = _np_affine_spline(IMG, matrix, offset, order)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    if matrix == [[1.0, 0.0], [0.0, 1.0]] and offset == (0.0, 0.0):
        np.testing.assert_allclose(got, IMG, rtol=1e-8, atol=1e-8)
