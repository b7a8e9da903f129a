"""Binary morphology (the ``dask_image.ndmorph`` surface).

Reference: ``dask_image/ndmorph/__init__.py`` wraps
``scipy.ndimage.binary_{erosion,dilation,opening,closing}`` in
``map_overlap`` with args normalized by ``ndmorph/_utils.py``. Semantics:

* erosion  = AND of mask over the structuring element (out-of-image reads are
  ``border_value``, default 0 → scipy's ``mode='constant'``)
* dilation = OR over the *mirrored* structuring element (symmetric default
  structure makes the mirror a no-op)
* opening/closing = the two composed; ``iterations=n`` chains n passes.

Spark-first: each pass is the same broadcast-kernel gather as ndfilters with
``bool_and`` / ``bool_or`` aggregation — map-side partial agg applies, one
shuffle per pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_image_spark.operators.ndfilters import stencil_gather

Offset2D = tuple[int, int, float]

# scipy default structure: generate_binary_structure(2, 1) — the 4-connected cross.
CROSS: list[Offset2D] = [(0, 0, 1.0), (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0)]
SQUARE: list[Offset2D] = [
    (dy, dx, 1.0) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
]


def _binary_pass(
    mask: DataFrame,
    structure: Sequence[Offset2D],
    shape: tuple[int, int],
    border_value: bool,
    agg,
    keys: Sequence[str] = (),
) -> DataFrame:
    m = mask.withColumn("value", F.col("m").cast("double"))
    g = stencil_gather(
        m, structure, shape, mode="constant",
        cval=1.0 if border_value else 0.0, keys=keys,
    )
    return (
        g.groupBy(*keys, "y", "x")
        .agg(agg(F.col("v") > F.lit(0.5)).alias("m"))
    )


def binary_erosion(mask, structure=None, shape=None, iterations=1, border_value=False, keys=()):
    out = mask
    for _ in range(iterations):
        out = _binary_pass(out, structure or CROSS, shape, border_value, F.bool_and, keys)
    return out


def binary_dilation(mask, structure=None, shape=None, iterations=1, border_value=False, keys=()):
    st = [(-dy, -dx, w) for dy, dx, w in (structure or CROSS)]  # mirrored
    out = mask
    for _ in range(iterations):
        out = _binary_pass(out, st, shape, border_value, F.bool_or, keys)
    return out


def binary_opening(mask, structure=None, shape=None, iterations=1, keys=()):
    out = binary_erosion(mask, structure, shape, iterations, keys=keys)
    return binary_dilation(out, structure, shape, iterations, keys=keys)


def binary_closing(mask, structure=None, shape=None, iterations=1, keys=()):
    out = binary_dilation(mask, structure, shape, iterations, keys=keys)
    return binary_erosion(out, structure, shape, iterations, keys=keys)
