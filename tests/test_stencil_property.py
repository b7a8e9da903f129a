"""Property-based differential test: random grids x random kernels x random
boundary modes, engine vs dense numpy. Catches interaction bugs a fixed
fixture can't (the mirror-halo bug class). Kept to a handful of examples —
each runs a Spark job."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_image_spark.functions.localrel import values_df
from dask_image_spark.operators import ndfilters

H, W = 9, 7

NP_PAD_MODE = {
    "reflect": "symmetric",
    "mirror": "reflect",
    "nearest": "edge",
    "wrap": "wrap",
}


@st.composite
def kernels(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    offs = draw(
        st.lists(
            st.tuples(
                st.integers(-2, 2), st.integers(-2, 2),
                st.integers(-4, 4).map(lambda v: v / 2.0),
            ),
            min_size=n, max_size=n,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    return offs


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    kernel=kernels(),
    mode=st.sampled_from(["reflect", "mirror", "nearest", "wrap", "constant"]),
)
def test_correlate_random(spark, seed, kernel, mode):
    rng = np.random.default_rng(seed)
    img = np.round(rng.uniform(-3, 3, size=(H, W)), 3)
    rows = [(int(y), int(x), float(img[y, x])) for y in range(H) for x in range(W)]
    px = values_df(spark, "y, x, value", rows)
    got = np.full((H, W), np.nan)
    res = ndfilters.correlate(px, kernel, (H, W), mode=mode, cval=0.25)
    for r in res.collect():
        got[r["y"], r["x"]] = r["v"]

    rad = max(max(abs(dy), abs(dx)) for dy, dx, _ in kernel)
    if rad == 0:
        pad = img
    elif mode == "constant":
        pad = np.pad(img, rad, mode="constant", constant_values=0.25)
    else:
        pad = np.pad(img, rad, mode=NP_PAD_MODE[mode])
    want = np.zeros_like(img)
    for dy, dx, w in kernel:
        want += w * pad[rad + dy : rad + dy + H, rad + dx : rad + dx + W]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
