"""Stencil filters over the R1 pixel table — the ``dask_image.ndfilters``
surface re-expressed as one join template.

Reference shape (upstream ``dask_image/ndfilters/``): every filter normalizes
its arguments then runs ``image.map_overlap(scipy_fn, depth, boundary)`` —
a halo exchange plus a per-chunk scipy call. The Spark-first equivalent for
long-form pixels is:

    pixels  CROSS JOIN  broadcast(kernel offsets)      -- never shuffles
            JOIN        pixels ON remapped source coord -- ONE shuffle
            GROUP BY    output coord                    -- same shuffle key

Physical plan: the kernel side is a handful of rows, always broadcast
(``BroadcastHashJoin``); the gather join and the final aggregate share the
(y, x) hash partitioning, so Catalyst plans a single exchange. Map-side
partial aggregation applies to SUM/MIN/MAX/AVG. At 100 TB the pattern holds:
cost is |pixels| x |kernel| rows through one shuffle — which is why
separable filters (Gaussian, uniform, prewitt/sobel) are applied as per-axis
1-D passes exactly like the reference does.

Boundary modes are shared-text SQL remaps (``functions.boundary``), so the
DuckDB oracle and this engine cannot disagree on edge semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_image_spark.functions import kernels as K
from dask_image_spark.functions.boundary import remap_sql

Offset2D = tuple[int, int, float]


def _kernel_df(spark, offsets: Sequence[Offset2D]) -> DataFrame:
    """Kernel as a tiny DataFrame; ``ko`` is the offset's ordinal, used by
    generic_filter to present window values in kernel (raster) order."""
    return spark.createDataFrame(
        [(i, int(dy), int(dx), float(w)) for i, (dy, dx, w) in enumerate(offsets)],
        schema="ko INT, dy INT, dx INT, w DOUBLE",
    )


def _max_radius(offsets: Sequence[Offset2D]) -> int:
    return max(max(abs(dy), abs(dx)) for dy, dx, _ in offsets)


def stencil_gather(
    px: DataFrame,
    offsets: Sequence[Offset2D],
    shape: tuple[int, int],
    mode: str = "reflect",
    cval: float = 0.0,
    keys: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """Neighborhood gather: one row per (output pixel, kernel offset).

    Returns columns ``*keys, y, x, w, v`` where ``v`` is the boundary-resolved
    neighbor value. All filter aggregations are GROUP BYs over this.
    """
    h, w_dim = shape
    r = _max_radius(offsets)
    if r >= min(h, w_dim):
        raise ValueError(
            f"kernel radius {r} >= image extent {min(h, w_dim)}: "
            "single-bounce boundary remap would be invalid"
        )
    spark = px.sparkSession
    kdf = _kernel_df(spark, offsets)
    keys = list(keys)

    out = px.select(*keys, "y", "x").crossJoin(F.broadcast(kdf))
    if mode == "constant":
        sy, sx = F.expr("y + dy"), F.expr("x + dx")
    else:
        sy = F.expr(remap_sql("y + dy", h, mode))
        sx = F.expr(remap_sql("x + dx", w_dim, mode))
    gathered = out.select(
        *keys,
        "y",
        "x",
        "ko",
        "w",
        sy.cast("int").alias("sy"),
        sx.cast("int").alias("sx"),
    )
    src = px.select(
        *keys,
        F.col("y").alias("sy"),
        F.col("x").alias("sx"),
        F.col(value_col).alias("_v"),
    )
    how = "left" if mode == "constant" else "inner"
    joined = gathered.join(src, on=[*keys, "sy", "sx"], how=how)
    v = (
        F.coalesce(F.col("_v"), F.lit(cval))
        if mode == "constant"
        else F.col("_v")
    )
    return joined.select(*keys, "y", "x", "ko", "w", v.alias("v"))


def _agg_stencil(
    px: DataFrame,
    offsets: Sequence[Offset2D],
    agg: Column,
    shape: tuple[int, int],
    mode: str,
    cval: float,
    keys: Sequence[str],
    value_col: str = "value",
    out_col: str = "v",
) -> DataFrame:
    g = stencil_gather(px, offsets, shape, mode, cval, keys, value_col)
    return g.groupBy(*keys, "y", "x").agg(agg.alias(out_col))


# --- the public ndfilters surface -------------------------------------------


def correlate(px, weights, shape, mode="reflect", cval=0.0, keys=()):
    """Cross-correlation with an offset kernel (``ndfilters/_conv.py``)."""
    return _agg_stencil(
        px, weights, F.sum(F.col("v") * F.col("w")), shape, mode, cval, keys
    )


def convolve(px, weights, shape, mode="reflect", cval=0.0, keys=()):
    """N-D convolution = correlate with the point-reflected kernel."""
    return correlate(px, K.flip(list(weights)), shape, mode, cval, keys)


def uniform_filter(px, size=3, shape=None, mode="reflect", cval=0.0, keys=()):
    """Moving mean over a box (``ndfilters/_smooth.py``); separable 1-D passes."""
    r = size // 2
    taps = [(o, 1.0 / size) for o in range(-r, r + 1)]
    out = correlate(px, K.taps_to_offsets_1d(taps, 0), shape, mode, cval, keys)
    out = out.withColumnRenamed("v", "value")
    out = correlate(out, K.taps_to_offsets_1d(taps, 1), shape, mode, cval, keys)
    return out


def minimum_filter(px, size=3, shape=None, mode="reflect", cval=0.0, keys=(), footprint=None):
    fp = footprint or K.box_footprint(size)
    return _agg_stencil(px, fp, F.min("v"), shape, mode, cval, keys)


def maximum_filter(px, size=3, shape=None, mode="reflect", cval=0.0, keys=(), footprint=None):
    fp = footprint or K.box_footprint(size)
    return _agg_stencil(px, fp, F.max("v"), shape, mode, cval, keys)


def median_filter(px, size=3, shape=None, mode="reflect", cval=0.0, keys=(), footprint=None):
    fp = footprint or K.box_footprint(size)
    return _agg_stencil(px, fp, F.median("v"), shape, mode, cval, keys)


def rank_filter(px, rank, size=3, shape=None, mode="reflect", cval=0.0, keys=(), footprint=None):
    """k-th order statistic in the window (``ndfilters/_order.py``).

    Negative rank counts from the top, as in scipy. Exact (sorted-array
    index), never approximate — the oracle hash-matches.
    """
    fp = footprint or K.box_footprint(size)
    n = len(fp)
    idx = rank if rank >= 0 else n + rank
    agg = F.sort_array(F.collect_list("v")).getItem(idx)
    return _agg_stencil(px, fp, agg, shape, mode, cval, keys)


def percentile_filter(px, percentile, size=3, shape=None, mode="reflect", cval=0.0, keys=(), footprint=None):
    fp = footprint or K.box_footprint(size)
    agg = F.percentile(F.col("v"), F.lit(percentile / 100.0))
    return _agg_stencil(px, fp, agg, shape, mode, cval, keys)


def gaussian_filter(
    px, sigma, order=0, shape=None, mode="reflect", cval=0.0,
    truncate=4.0, keys=(),
):
    """Separable Gaussian (``ndfilters/_gaussian.py``): one 1-D tap pass per
    axis, exactly the reference's structure. ``order`` may be an int or a
    per-axis (order_y, order_x) pair."""
    orders = order if isinstance(order, (tuple, list)) else (order, order)
    sigmas = sigma if isinstance(sigma, (tuple, list)) else (sigma, sigma)
    out = px
    for axis in (0, 1):
        taps = K.gaussian_taps_1d(sigmas[axis], orders[axis], truncate)
        out = correlate(
            out, K.taps_to_offsets_1d(taps, axis), shape, mode, cval, keys
        ).withColumnRenamed("v", "value")
    return out.withColumnRenamed("value", "v")


def gaussian_gradient_magnitude(px, sigma, shape=None, mode="reflect", cval=0.0, truncate=4.0, keys=()):
    """sqrt(sum_i d_i^2) with d_i the order-1 Gaussian along axis i."""
    gy = gaussian_filter(px, sigma, (1, 0), shape, mode, cval, truncate, keys)
    gx = gaussian_filter(px, sigma, (0, 1), shape, mode, cval, truncate, keys)
    j = gy.withColumnRenamed("v", "gy").join(
        gx.withColumnRenamed("v", "gx"), on=[*keys, "y", "x"]
    )
    return j.select(
        *keys, "y", "x",
        F.sqrt(F.col("gy") ** 2 + F.col("gx") ** 2).alias("v"),
    )


def gaussian_laplace(px, sigma, shape=None, mode="reflect", cval=0.0, truncate=4.0, keys=()):
    """Sum of per-axis order-2 Gaussian responses."""
    dyy = gaussian_filter(px, sigma, (2, 0), shape, mode, cval, truncate, keys)
    dxx = gaussian_filter(px, sigma, (0, 2), shape, mode, cval, truncate, keys)
    j = dyy.withColumnRenamed("v", "dyy").join(
        dxx.withColumnRenamed("v", "dxx"), on=[*keys, "y", "x"]
    )
    return j.select(*keys, "y", "x", (F.col("dyy") + F.col("dxx")).alias("v"))


def laplace(px, shape=None, mode="reflect", cval=0.0, keys=()):
    """Fixed 5-point discrete Laplacian (``ndfilters/_diff.py``)."""
    return correlate(px, K.LAPLACE, shape, mode, cval, keys)


def sobel(px, axis=-1, shape=None, mode="reflect", cval=0.0, keys=()):
    k = K.SOBEL_X if axis in (-1, 1) else K.SOBEL_Y
    return correlate(px, k, shape, mode, cval, keys)


def prewitt(px, axis=-1, shape=None, mode="reflect", cval=0.0, keys=()):
    k = K.PREWITT_X if axis in (-1, 1) else K.PREWITT_Y
    return correlate(px, k, shape, mode, cval, keys)


def threshold_local(
    px, block_size=3, method="mean", offset=0.0, shape=None,
    mode="reflect", cval=0.0, keys=(), sigma=None,
):
    """Adaptive threshold (``ndfilters/_threshold.py``): value > smoothed - offset."""
    if method == "mean":
        sm = uniform_filter(px, block_size, shape, mode, cval, keys)
    elif method == "median":
        sm = median_filter(px, block_size, shape, mode, cval, keys)
    elif method == "gaussian":
        s = sigma if sigma is not None else (block_size - 1) / 6.0
        sm = gaussian_filter(px, s, 0, shape, mode, cval, keys=keys)
    else:
        raise ValueError(f"unknown method {method!r}")
    j = px.join(sm.withColumnRenamed("v", "smoothed"), on=[*keys, "y", "x"])
    return j.select(
        *keys, "y", "x",
        (F.col("value") > F.col("smoothed") - F.lit(offset)).alias("v"),
    )


def generic_filter_collect(
    px, fn_udf, size=3, shape=None, mode="reflect", cval=0.0, keys=(), footprint=None,
):
    """Arbitrary function over each window (``ndfilters/_generic.py``).

    The window values are collected into an array ordered by (dy, dx) — the
    same raster order scipy presents — then ``fn_udf`` (a pandas UDF
    array<double> -> double) is applied. This is the windowed-UDF surface;
    inherently weak-oracle.
    """
    fp = footprint or K.box_footprint(size)
    g = stencil_gather(px, fp, shape, mode, cval, keys)
    # collect (kernel-ordinal, value) and sort by ordinal -> raster order
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ko"), F.col("v")))
    )
    out = g.groupBy(*keys, "y", "x").agg(
        F.transform(arr, lambda s: s["v"]).alias("window")
    )
    return out.select(*keys, "y", "x", fn_udf(F.col("window")).alias("v"))
