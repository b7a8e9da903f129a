"""R1-vs-R2 equality for the labeled_comprehension surfaces: the pandas-UDF
array path (`labeled_comprehension`) and the truly-arbitrary per-label
applyInPandas path (`labeled_comprehension_numpy`) must agree when given
the same function — and a numpy groupby differential pins both."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dask_image_spark.functions.pixelgrid import labeled_grid
from dask_image_spark.operators import ndmeasure


@pytest.fixture(scope="module")
def lbl(spark, sf_dir):
    return labeled_grid(spark, sf_dir).cache()


def _collect(df):
    return {r["label"]: round(r["v"], 6) for r in df.collect()}


def test_r1_vs_r2_equal_sumsq(lbl):
    @pandas_udf("double")
    def sumsq_udf(vals: pd.Series) -> pd.Series:
        return vals.map(lambda v: float(sum(x * x for x in v)))

    r1 = _collect(ndmeasure.labeled_comprehension(lbl, sumsq_udf, out_col="v"))
    r2 = _collect(
        ndmeasure.labeled_comprehension_numpy(
            lbl, lambda v: float(np.sum(v * v)), out_col="v"
        )
    )
    assert r1 == r2


def test_numpy_differential_mad(lbl):
    def mad(v):
        return float(np.median(np.abs(v - np.median(v))))

    got = _collect(ndmeasure.labeled_comprehension_numpy(lbl, mad, out_col="v"))
    pdf = lbl.toPandas()
    want = {
        int(label): round(mad(g.sort_values(["y", "x"])["value"].to_numpy()), 6)
        for label, g in pdf.groupby("label")
    }
    assert got == want


def test_ravel_order_is_y_major(lbl):
    """The callable must see values in ravel (y-major) order — scipy's
    contract. An order-sensitive function (first element) proves it."""
    got = _collect(
        ndmeasure.labeled_comprehension_numpy(
            lbl, lambda v: float(v[0]), out_col="v"
        )
    )
    pdf = lbl.toPandas()
    want = {
        int(label): round(float(g.sort_values(["y", "x"])["value"].iloc[0]), 6)
        for label, g in pdf.groupby("label")
    }
    assert got == want
