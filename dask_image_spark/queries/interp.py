"""Graded queries for ndinterp / ndfourier / label / UDF surfaces.

Gather-join transforms (affine order 0/1, rotate, shift) are strong-oracle;
the recursive/global R2 operators (spline prefilter, FFT ops) and
connected-components are weak-checked here and differentially tested in
``tests/`` against pure-python references.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dask_image_spark.functions.pixelgrid import (
    GRID,
    mask_grid,
    pixel_grid,
    labeled_grid,
    with_pixel_ctes,
)
from dask_image_spark.operators import chunked, label_cc, ndfilters, ndinterp, ndmeasure
from dask_image_spark.queries.base import r as _eps_round, register

SHAPE = (GRID, GRID)
N = GRID


@register(
    "affine_order0",
    with_pixel_ctes(
        "SELECT o.y, o.x, ROUND(1.2345e-8 + p.value, 4) AS v FROM pixels o JOIN pixels p "
        "ON p.y = LEAST(GREATEST(CAST(FLOOR(0.5 * o.y + 3.2 + 0.5) AS INT), 0), 63) "
        "AND p.x = LEAST(GREATEST(CAST(FLOOR(0.5 * o.x + 1.7 + 0.5) AS INT), 0), 63)"
    ),
    tags=("imaging", "ndinterp"),
)
def affine_order0(spark, sf_dir):
    px = pixel_grid(spark, sf_dir)
    out = ndinterp.affine_transform_order0(
        px, [[0.5, 0.0], [0.0, 0.5]], (3.2, 1.7), SHAPE
    )
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register(
    "affine_order1",
    with_pixel_ctes(
        """
        SELECT g.y, g.x, ROUND(1.2345e-8 + SUM(g.wgt * p.value), 4) AS v
        FROM (
          SELECT o.y, o.x,
                 LEAST(GREATEST(CAST(FLOOR(0.7 * o.y + 2.5) AS INT) + c.cy, 0), 63) AS sy,
                 LEAST(GREATEST(CAST(FLOOR(0.7 * o.x + 5.25) AS INT) + c.cx, 0), 63) AS sx,
                 (CASE WHEN c.cy = 0 THEN 1 - ((0.7 * o.y + 2.5) - FLOOR(0.7 * o.y + 2.5))
                       ELSE ((0.7 * o.y + 2.5) - FLOOR(0.7 * o.y + 2.5)) END)
               * (CASE WHEN c.cx = 0 THEN 1 - ((0.7 * o.x + 5.25) - FLOOR(0.7 * o.x + 5.25))
                       ELSE ((0.7 * o.x + 5.25) - FLOOR(0.7 * o.x + 5.25)) END) AS wgt
          FROM pixels o CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) c(cy, cx)
        ) g JOIN pixels p ON p.y = g.sy AND p.x = g.sx
        GROUP BY g.y, g.x
        """
    ),
    tags=("imaging", "ndinterp"),
)
def affine_order1(spark, sf_dir):
    px = pixel_grid(spark, sf_dir)
    out = ndinterp.affine_transform_order1(
        px, [[0.7, 0.0], [0.0, 0.7]], (2.5, 5.25), SHAPE
    )
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


def _affine1_oracle(m00, m01, o0, m10, m11, o1) -> str:
    """General bilinear-affine oracle SQL; float literals are repr'd so both
    engines parse the identical doubles the Spark plan uses."""
    # CAST literals to DOUBLE: DuckDB otherwise parses a 17-digit literal as
    # DECIMAL(18,17) and overflows on the multiply; Spark's F.lit is DOUBLE
    def d(v):
        return f"CAST({v!r} AS DOUBLE)"

    syf = f"({d(m00)} * o.y + {d(m01)} * o.x + {d(o0)})"
    sxf = f"({d(m10)} * o.y + {d(m11)} * o.x + {d(o1)})"
    return with_pixel_ctes(
        f"""
        SELECT g.y, g.x, ROUND(1.2345e-8 + SUM(g.wgt * p.value), 4) AS v
        FROM (
          SELECT o.y, o.x,
                 LEAST(GREATEST(CAST(FLOOR({syf}) AS INT) + c.cy, 0), {N - 1}) AS sy,
                 LEAST(GREATEST(CAST(FLOOR({sxf}) AS INT) + c.cx, 0), {N - 1}) AS sx,
                 (CASE WHEN c.cy = 0 THEN 1 - ({syf} - FLOOR({syf}))
                       ELSE ({syf} - FLOOR({syf})) END)
               * (CASE WHEN c.cx = 0 THEN 1 - ({sxf} - FLOOR({sxf}))
                       ELSE ({sxf} - FLOOR({sxf})) END) AS wgt
          FROM pixels o CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) c(cy, cx)
        ) g JOIN pixels p ON p.y = g.sy AND p.x = g.sx
        GROUP BY g.y, g.x
        """
    )


def _rotate_params(angle_deg: float):
    import math

    th = math.radians(angle_deg)
    cos_t, sin_t = math.cos(th), math.sin(th)
    c = (N - 1) / 2.0
    return (
        cos_t, sin_t, c - cos_t * c - sin_t * c,
        -sin_t, cos_t, c + sin_t * c - cos_t * c,
    )


@register(
    "rotate_order1",
    _affine1_oracle(*_rotate_params(30.0)),
    tags=("imaging", "ndinterp"),
)
def rotate_order1_q(spark, sf_dir):
    """30-degree center rotation, bilinear, reshape=False
    (``ndinterp/__init__.py::rotate`` delegating to affine_transform)."""
    out = ndinterp.rotate(pixel_grid(spark, sf_dir), 30.0, SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register(
    "rotate90",
    with_pixel_ctes(
        f"SELECT x AS y, {N - 1} - y AS x, ROUND(1.2345e-8 + value, 4) AS v FROM pixels"
    ),
    tags=("imaging", "ndinterp"),
)
def rotate90_q(spark, sf_dir):
    out = ndinterp.rotate90(pixel_grid(spark, sf_dir), SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register(
    "shift_wrap",
    with_pixel_ctes(
        f"SELECT CAST((y + 5) % {N} AS INT) AS y, CAST((x + 9) % {N} AS INT) AS x, "
        "ROUND(1.2345e-8 + value, 4) AS v FROM pixels"
    ),
    tags=("imaging", "ndinterp", "ndfourier"),
)
def shift_wrap_q(spark, sf_dir):
    """Integer circular shift — exact spatial equivalent of fourier_shift
    (``ndfourier/__init__.py``) for integer shifts."""
    out = ndinterp.shift_wrap(pixel_grid(spark, sf_dir), (5, 9), SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register("fourier_shift", None, tags=("imaging", "ndfourier", "udf"))
def fourier_shift_q(spark, sf_dir):
    """Fractional shift via FFT phase ramp (``ndfourier/__init__.py::
    fourier_shift``); weak-checked — its integer-shift specialization is the
    strong-oracle ``shift_wrap`` query."""
    px = pixel_grid(spark, sf_dir)
    out = chunked.fourier_shift(px, (2.5, -1.5), SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register("spline_filter", None, tags=("imaging", "ndinterp", "udf"))
def spline_filter_q(spark, sf_dir):
    """N-D spline prefilter (``ndinterp/__init__.py::spline_filter``) =
    the 1-D IIR prefilter applied along every axis in sequence."""
    px = pixel_grid(spark, sf_dir)
    out0 = chunked.spline_filter1d(px, axis=0, shape=SHAPE)
    out = chunked.spline_filter1d(
        out0.withColumnRenamed("v", "value"), axis=1, shape=SHAPE
    )
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register("spline_filter1d", None, tags=("imaging", "ndinterp", "udf"))
def spline_filter1d_q(spark, sf_dir):
    """Cubic spline prefilter along y — recursive IIR per grid line via
    applyInPandas (R2 path); weak-checked, unit-tested against a pure-python
    reference implementation."""
    px = pixel_grid(spark, sf_dir)
    out = chunked.spline_filter1d(px, axis=0, shape=SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register("fourier_gaussian", None, tags=("imaging", "ndfourier", "udf"))
def fourier_gaussian_q(spark, sf_dir):
    """FFT-domain Gaussian (R2 whole-image path); weak-checked here,
    asserted ~equal to wrap-mode spatial gaussian_filter in tests."""
    px = pixel_grid(spark, sf_dir)
    out = chunked.fourier_gaussian(px, sigma=1.0, shape=SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register("fourier_uniform", None, tags=("imaging", "ndfourier", "udf"))
def fourier_uniform_q(spark, sf_dir):
    px = pixel_grid(spark, sf_dir)
    out = chunked.fourier_uniform(px, size=3, shape=SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register("label_cc", None, tags=("imaging", "ndmeasure", "label"))
def label_cc_q(spark, sf_dir):
    """Connected components of the mask fixture (3-stage block/merge design,
    see operators/label_cc.py). Weak driver check; component invariants are
    unit-tested against a BFS reference."""
    m = mask_grid(spark, sf_dir)
    return label_cc.label(m, SHAPE)


from dask_image_spark.queries.imaging import _BOX3, _linear_oracle  # noqa: E402


@register(
    "generic_filter_ptp",
    _linear_oracle([(_BOX3, "MAX({v}) - MIN({v})", "reflect", 0.0)]),
    tags=("imaging", "ndfilters", "udf"),
)
def generic_filter_ptp(spark, sf_dir):
    """generic_filter with a peak-to-peak (max-min) window function —
    exercises the windowed-UDF surface with a function SQL *can* mirror,
    giving the UDF plumbing a strong oracle."""

    @pandas_udf("double")
    def ptp(windows: pd.Series) -> pd.Series:
        return windows.map(lambda w: float(max(w) - min(w)))

    px = pixel_grid(spark, sf_dir)
    out = ndfilters.generic_filter_collect(px, ptp, size=3, shape=SHAPE)
    return out.select("y", "x", _eps_round("v", 4).alias("v"))


@register(
    "labeled_comprehension_sumsq",
    with_pixel_ctes(
        "SELECT label, ROUND(1.2345e-8 + SUM(value * value), 4) AS v FROM labeled GROUP BY label"
    ),
    tags=("imaging", "ndmeasure", "udf"),
)
def labeled_comprehension_sumsq(spark, sf_dir):
    """labeled_comprehension with sum-of-squares — the per-label UDAF
    surface; oracle-checkable (SUM(value^2)) so registered strong below."""

    @pandas_udf("double")
    def sumsq(vals: pd.Series) -> pd.Series:
        return vals.map(lambda v: float(sum(x * x for x in v)))

    lbl = labeled_grid(spark, sf_dir)
    out = ndmeasure.labeled_comprehension(lbl, sumsq, out_col="v")
    return out.select("label", _eps_round("v", 4).alias("v"))
