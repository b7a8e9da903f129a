"""Numeric validation of the R2 (whole-image / per-line UDF) operators:
spline prefilter reconstruction, Fourier ops vs their spatial equivalents —
the reference checks the same equivalences via scipy (upstream
``test_ndfourier`` compares against scipy.ndimage.fourier_*)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dask_image_spark.functions.localrel import values_df
from dask_image_spark.operators import chunked, ndfilters


def test_spline_prefilter_reconstructs_signal():
    """B-spline property: convolving the prefilter's coefficients with the
    cubic B-spline stencil [1/6, 4/6, 1/6] must reproduce the input signal
    exactly (this is the defining equation the prefilter inverts; it caught
    a sign error in the anti-causal recursion)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=64)
    c = chunked.spline_filter1d_np(x)
    recon = (c[:-2] + 4.0 * c[1:-1] + c[2:]) / 6.0
    np.testing.assert_allclose(recon, x[1:-1], rtol=1e-12, atol=1e-12)


H = W = 16
RNG = np.random.default_rng(11)
IMG = RNG.uniform(0, 10, size=(H, W))


def _px(spark):
    rows = [(int(y), int(x), float(IMG[y, x])) for y in range(H) for x in range(W)]
    return values_df(spark, "y, x, value", rows)


def _grid(df):
    out = np.full((H, W), np.nan)
    for r in df.collect():
        out[r["y"], r["x"]] = r["v"]
    return out


def test_fourier_shift_integer_equals_roll(spark):
    got = _grid(chunked.fourier_shift(_px(spark), (3, -2), (H, W)))
    np.testing.assert_allclose(got, np.roll(IMG, (3, -2), axis=(0, 1)), atol=1e-9)


def test_fourier_shift_fractional_matches_numpy(spark):
    """Fractional (subpixel) shift vs a dense numpy evaluation of the same
    phase ramp — covers the non-integer case the SQL oracle can't express
    (upstream ``test_ndfourier`` sweeps fractional shifts the same way)."""
    sy, sx = 2.5, -1.5
    got = _grid(chunked.fourier_shift(_px(spark), (sy, sx), (H, W)))
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    ramp = np.exp(-2j * np.pi * (fy * sy + fx * sx))
    want = np.real(np.fft.ifft2(np.fft.fft2(IMG) * ramp))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # a half-pixel shift preserves the mean (DC component untouched)
    assert abs(got.mean() - IMG.mean()) < 1e-9


def test_fourier_keyed_groups_match_keyless(spark):
    """The keyed (multi-image) path must produce per-image results identical
    to running each image alone — and it runs as >1 group, not one task."""
    rows = [
        (int(i), int(y), int(x), float(IMG[y, x] + 10 * i))
        for i in (0, 1) for y in range(H) for x in range(W)
    ]
    px = values_df(spark, "img, y, x, value", rows)
    out = chunked.fourier_gaussian(px, sigma=1.0, shape=(H, W), keys=["img"])
    per_img = {}
    for r in out.collect():
        per_img.setdefault(r["img"], np.full((H, W), np.nan))[r["y"], r["x"]] = r["v"]
    assert set(per_img) == {0, 1}
    solo = _grid(chunked.fourier_gaussian(_px(spark), sigma=1.0, shape=(H, W)))
    np.testing.assert_allclose(per_img[0], solo, rtol=1e-12, atol=1e-12)
    # image 1 = image 0 + constant 10; Gaussian has DC gain 1
    np.testing.assert_allclose(per_img[1], solo + 10.0, rtol=1e-12, atol=1e-9)


def test_fourier_uniform_plumbing_differential(spark):
    """The Spark plumbing (grid -> whole-image UDF -> grid) must reproduce a
    dense numpy evaluation of the identical sinc multiplier exactly. (The
    continuous-sinc multiplier is scipy's definition; it is deliberately NOT
    the DFT of the discrete box, so no box-filter equality is asserted.)"""
    got = _grid(chunked.fourier_uniform(_px(spark), size=3, shape=(H, W)))
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    want = np.real(
        np.fft.ifft2(np.fft.fft2(IMG) * np.sinc(fy * 3) * np.sinc(fx * 3))
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # DC gain is 1: a constant image passes through unchanged
    assert abs(got.mean() - IMG.mean()) < 1e-9


def test_fourier_gaussian_close_to_spatial_wrap(spark):
    """FFT Gaussian vs truncated spatial Gaussian (wrap): approximate only —
    continuous frequency response vs DFT of the sampled kernel differ by
    aliasing + tap truncation (~1e-2 on a range-10 image at sigma=1)."""
    got = _grid(chunked.fourier_gaussian(_px(spark), sigma=1.0, shape=(H, W)))
    want = _grid(
        ndfilters.gaussian_filter(_px(spark), 1.0, shape=(H, W), mode="wrap")
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-2)


def test_bessel_j1_matches_integral_definition():
    """The from-scratch A&S polynomial J1 vs the integral definition
    J1(x) = (1/pi) * int_0^pi cos(theta - x sin theta) dtheta evaluated by
    fine quadrature — across both polynomial branches and the |x|=8 seam."""
    xs = np.array([0.0, 0.3, 1.0, 1.8412, 3.8317, 7.9, 8.0, 8.1, 13.3237, 25.0, -2.0, -9.5])
    th = np.linspace(0.0, np.pi, 40001)
    want = np.array(
        [np.trapz(np.cos(th - x * np.sin(th)), th) / np.pi for x in xs]
    )
    np.testing.assert_allclose(chunked.bessel_j1(xs), want, atol=1e-7)
    # J1 is odd; first zero near 3.8317
    assert abs(chunked.bessel_j1(np.array([3.8317]))[0]) < 1e-4


def test_fourier_ellipsoid_plumbing_differential(spark):
    """Engine fourier_ellipsoid vs a dense numpy evaluation of the identical
    jinc multiplier; DC gain 1 (constant images pass through); and the
    asymmetric size must NOT equal the axis-swapped size (the response is
    elliptic, not round, so (5,3) != (3,5) on a non-symmetric image)."""
    got = _grid(chunked.fourier_ellipsoid(_px(spark), size=(5, 3), shape=(H, W)))
    resp = chunked.ellipsoid_response((H, W), (5, 3))
    want = np.real(np.fft.ifft2(np.fft.fft2(IMG) * resp))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    assert abs(got.mean() - IMG.mean()) < 1e-9
    swapped = np.real(
        np.fft.ifft2(np.fft.fft2(IMG) * chunked.ellipsoid_response((H, W), (3, 5)))
    )
    assert np.abs(want - swapped).max() > 1e-3


def test_generic_filter_tiles_matches_r1_collect(spark):
    """The truly-arbitrary-callable R2 path (generic_filter_tiles) and the
    windowed-UDF R1 path (generic_filter_collect) must agree on the same
    function; ptp is computable by both surfaces. block=8 < image width
    forces cross-tile halo assembly through the arbitrary-fn route."""
    from pyspark.sql.functions import pandas_udf

    got_r2 = _grid(
        ndfilters.generic_filter_tiles(
            _px(spark), lambda w: float(w.max() - w.min()),
            size=3, shape=(H, W), block=8,
        )
    )

    @pandas_udf("double")
    def ptp(windows: pd.Series) -> pd.Series:
        return windows.map(lambda w: float(max(w) - min(w)))

    got_r1 = _grid(
        ndfilters.generic_filter_collect(_px(spark), ptp, size=3, shape=(H, W))
    )
    np.testing.assert_allclose(got_r2, got_r1, atol=1e-12)


def test_generic_filter_tiles_mad_matches_numpy(spark):
    """Dense numpy differential for the windowed-MAD callable (reflect
    boundary), mirroring upstream test_ndfilters' scipy differentials."""
    from numpy.lib.stride_tricks import sliding_window_view

    got = _grid(
        ndfilters.generic_filter_tiles(
            _px(spark),
            lambda w: float(np.median(np.abs(w - np.median(w)))),
            size=3, shape=(H, W), block=8,
        )
    )
    pad = np.pad(IMG, 1, mode="symmetric")  # scipy 'reflect' == np 'symmetric'
    win = sliding_window_view(pad, (3, 3)).reshape(H, W, 9)
    med = np.median(win, axis=2, keepdims=True)
    want = np.median(np.abs(win - med), axis=2)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_edt_envelope_matches_brute_force():
    """Full 2-D EDT composition (row L1 squared -> per-column parabola
    envelope) against the O(n^2 m) brute-force nearest-mask search, on
    random masks including empty rows/columns and an all-empty grid."""
    import numpy as np

    from dask_image_spark.operators.chunked import edt_envelope_1d

    rng = np.random.default_rng(5)
    for trial in range(8):
        h, w = rng.integers(3, 20, size=2)
        mask = rng.random((h, w)) < (0.15 if trial % 2 else 0.45)
        if trial == 7:
            mask[:] = False  # no seeds: all distances stay at sentinel
        SENT = 100_000
        # row pass: 1-D L1 distance per row, squared
        d1 = np.full((h, w), float(SENT) ** 2)
        for y in range(h):
            xs = np.flatnonzero(mask[y])
            if len(xs):
                d = np.abs(np.arange(w)[:, None] - xs[None, :]).min(axis=1)
                d1[y] = d.astype(float) ** 2
        # column pass: parabola envelope
        got = np.empty((h, w), dtype=np.int64)
        for x in range(w):
            got[:, x] = edt_envelope_1d(d1[:, x])
        # brute force
        ys, xs = np.nonzero(mask)
        if len(ys):
            yy, xx = np.mgrid[0:h, 0:w]
            bf = (
                (yy[:, :, None] - ys[None, None, :]) ** 2
                + (xx[:, :, None] - xs[None, None, :]) ** 2
            ).min(axis=2)
            assert np.array_equal(got, bf), trial
        else:
            assert (got >= SENT**2).all()
