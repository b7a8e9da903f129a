"""Boundary remap: the Python mirror, the SQL text, and scipy-documented
semantics must agree. Parametrized over modes x coordinates, the same grid
the reference's boundary tests sweep (upstream
``tests/test_dask_image/test_ndfilters`` parametrizes every boundary mode).
"""

from __future__ import annotations

import duckdb
import pytest

from dask_image_spark.functions.boundary import MODES, remap_py, remap_sql

N = 8

# hand-computed scipy semantics for n=8 (single bounce):
#   reflect: (d c b a | a b c d | d c b a)   half-sample symmetric
#   mirror:  (d c b | a b c d | c b a)       whole-sample symmetric
EXPECTED = {
    "reflect": {-3: 2, -2: 1, -1: 0, 0: 0, 7: 7, 8: 7, 9: 6, 10: 5},
    "mirror": {-3: 3, -2: 2, -1: 1, 0: 0, 7: 7, 8: 6, 9: 5, 10: 4},
    "nearest": {-3: 0, -1: 0, 0: 0, 7: 7, 8: 7, 10: 7},
    "wrap": {-3: 5, -1: 7, 0: 0, 7: 7, 8: 0, 10: 2},
}


@pytest.mark.parametrize("mode", sorted(EXPECTED))
def test_remap_py_matches_scipy_semantics(mode):
    for c, want in EXPECTED[mode].items():
        assert remap_py(c, N, mode) == want, (mode, c)


@pytest.mark.parametrize("mode", [m for m in MODES if m != "constant"])
def test_remap_sql_matches_remap_py(mode):
    con = duckdb.connect()
    expr = remap_sql("c", N, mode)
    for c in range(-N + 1, 2 * N - 1):
        got = con.execute(f"SELECT {expr} FROM (SELECT {c} AS c)").fetchone()[0]
        assert got == remap_py(c, N, mode), (mode, c)


def test_constant_mode_leaves_coords() -> None:
    assert remap_sql("c", N, "constant") == "(c)"
