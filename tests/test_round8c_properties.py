"""Property tests for the round-8 continuation operators: independent
references (numpy solvers, brute-force DP, sequential PAVA) checked
against the exact closed forms / filter rules the graded queries embed,
on arbitrary inputs the fixtures can't cover. No Spark."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dask_image_spark.queries.timeseries import _kalman_weights


# ---- Kalman closed form ----------------------------------------------------


def test_kalman_weights_sum_to_one_and_favor_recency():
    """The filtered estimate is a convex combination of observations
    (weights sum to 1 — otherwise the filter is biased), and the
    random-walk model forgets: later observations weigh at least as
    much as earlier ones."""
    ws, k_last, p_last = _kalman_weights()
    assert abs(sum(ws) - 1.0) < 1e-12
    assert all(b >= a - 1e-15 for a, b in zip(ws, ws[1:]))
    assert 0.0 < k_last < 1.0 and p_last > 0.0


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=24, max_size=24,
    )
)
@settings(max_examples=100, deadline=None)
def test_kalman_closed_form_equals_sequential_filter(z):
    """The data-independent-gain identity behind kalman_filter_hod:
    sum(w_h z_h) must equal running the textbook predict/update
    recursion — on ANY observation sequence, not just the fixture."""
    q, r = 1.0, 4.0
    x, p = z[0], r
    for t in range(1, 24):
        pp = p + q
        k = pp / (pp + r)
        x = x + k * (z[t] - x)
        p = (1 - k) * pp
    ws, _, p_last = _kalman_weights()
    closed = sum(w * v for w, v in zip(ws, z))
    assert abs(closed - x) < 1e-8 * max(1.0, abs(x))
    assert abs(p - p_last) < 1e-12


# ---- Durbin-Levinson PACF vs direct Yule-Walker solve ----------------------


@given(
    st.lists(
        st.floats(min_value=-0.45, max_value=0.45, allow_nan=False),
        min_size=3, max_size=3,
    )
)
@settings(max_examples=200, deadline=None)
def test_durbin_levinson_matches_yule_walker_solve(rho):
    """pacf_durbin_levinson's phi_22 / phi_33 closed forms must equal
    the last coefficient of the AR(k) Yule-Walker solution (the PACF
    definition), for any correlation triple in the stable band."""
    r1, r2, r3 = rho
    # guard: Toeplitz matrix must be well-conditioned for the reference
    m2 = np.array([[1.0, r1], [r1, 1.0]])
    m3 = np.array([[1.0, r1, r2], [r1, 1.0, r1], [r2, r1, 1.0]])
    if min(abs(np.linalg.eigvalsh(m2)).min(),
           abs(np.linalg.eigvalsh(m3)).min()) < 1e-3:
        return
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    q1 = r1 * (1 - p2)
    p3 = (r3 - q1 * r2 - p2 * r1) / (1 - q1 * r1 - p2 * r2)
    ref2 = np.linalg.solve(m2, np.array([r1, r2]))[-1]
    ref3 = np.linalg.solve(m3, np.array([r1, r2, r3]))[-1]
    assert abs(p2 - ref2) < 1e-9
    assert abs(p3 - ref3) < 1e-6


# ---- Prefix-filter completeness (the PPJoin theorem) -----------------------


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=30), min_size=3,
                max_size=15),
        min_size=2, max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_is_lossless_at_08(docsets):
    """jaccard_prefix_filter_join's candidate rule: order tokens by
    (global df, token), take the first n - ceil(0.8 n) + 1 per set
    (integer ceil: (4n+4)//5); every pair with J >= 0.8 MUST share a
    prefix token. Hypothesis hunts for a counterexample the fixture
    corpus can't produce."""
    df: dict[int, int] = {}
    for s in docsets:
        for tok in s:
            df[tok] = df.get(tok, 0) + 1

    def prefix(s):
        n = len(s)
        p = n - (4 * n + 4) // 5 + 1
        return set(sorted(s, key=lambda tk: (df[tk], tk))[:p])

    for i in range(len(docsets)):
        for j in range(i + 1, len(docsets)):
            a, b = docsets[i], docsets[j]
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= 0.8:
                assert prefix(a) & prefix(b), (a, b, jac)


# ---- Isotonic minimax identity vs sequential PAVA --------------------------


def _pava(y, w):
    """Textbook pool-adjacent-violators on weighted values; each block
    tracks (mean, weight, n_points) so expansion is exact."""
    out = []
    for yi, wi in zip(y, w):
        out.append([yi, wi, 1])
        while len(out) > 1 and out[-2][0] > out[-1][0] + 1e-15:
            y2, w2, n2 = out.pop()
            y1, w1, n1 = out.pop()
            out.append(
                [(y1 * w1 + y2 * w2) / (w1 + w2), w1 + w2, n1 + n2]
            )
    fitted = []
    for yv, _, nv in out:
        fitted.extend([yv] * nv)
    return fitted


def _minimax(y, w):
    """isotonic_calibration_pava's closed form: iso(i) = max_{j<=i}
    min_{k>=i} weightedAvg(y[j..k])."""
    n = len(y)
    out = []
    for i in range(n):
        best = -math.inf
        for j in range(i + 1):
            worst = math.inf
            for k in range(i, n):
                seg = sum(yy * ww for yy, ww in zip(y[j:k + 1], w[j:k + 1]))
                sw = sum(w[j:k + 1])
                worst = min(worst, seg / sw)
            best = max(best, worst)
        out.append(best)
    return out


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_isotonic_minimax_equals_pava(pairs):
    """The minimax identity the SQL uses must agree with the
    sequential PAVA algorithm it replaces — on any weighted input
    including ties and reversals."""
    y = [p[0] for p in pairs]
    w = [float(p[1]) for p in pairs]
    mm = _minimax(y, w)
    pv = _pava(y, w)
    assert len(mm) == len(pv)
    for a, b in zip(mm, pv):
        assert abs(a - b) < 1e-9, (y, w, mm, pv)
    # and the output is monotone nondecreasing by construction
    assert all(b >= a - 1e-12 for a, b in zip(mm, mm[1:]))


# ---- DTW: exact DP vs brute recursion, and the L1 upper bound --------------


def _dtw_rowsweep(a, b):
    n, m = len(a), len(b)
    big = 1e300
    prev = [big] * m
    for i in range(n):
        cur = [big] * m
        for j in range(m):
            d = abs(a[i] - b[j])
            if i == 0 and j == 0:
                cur[j] = d
            else:
                cur[j] = d + min(
                    prev[j] if i > 0 else big,
                    cur[j - 1] if j > 0 else big,
                    prev[j - 1] if (i > 0 and j > 0) else big,
                )
        prev = cur
    return prev[m - 1]


def _dtw_recursive(a, b):
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def f(i, j):
        d = abs(a[i] - b[j])
        if i == 0 and j == 0:
            return d
        opts = []
        if i > 0:
            opts.append(f(i - 1, j))
        if j > 0:
            opts.append(f(i, j - 1))
        if i > 0 and j > 0:
            opts.append(f(i - 1, j - 1))
        return d + min(opts)

    return f(len(a) - 1, len(b) - 1)


@given(
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
             min_size=1, max_size=10),
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
             min_size=1, max_size=10),
)
@settings(max_examples=150, deadline=None)
def test_dtw_rowsweep_equals_recursion(a, b):
    """dtw_alignment_distance's row-sweep DP (and the oracle's
    anti-diagonal unroll, same recurrence) must equal the memoized
    textbook recursion on any pair of series."""
    aa, bb = tuple(a), tuple(b)
    assert abs(_dtw_rowsweep(a, b) - _dtw_recursive(aa, bb)) < 1e-9


@given(
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
             min_size=2, max_size=10)
)
@settings(max_examples=100, deadline=None)
def test_dtw_upper_bounded_by_l1_and_zero_on_self(a):
    """Identity alignment is a legal warping path, so DTW <= L1 for
    equal-length series; DTW of a series with itself is exactly 0."""
    b = [x + 1.0 for x in a]
    assert _dtw_rowsweep(a, b) <= sum(abs(x - y) for x, y in zip(a, b)) + 1e-9
    assert _dtw_rowsweep(a, a) == 0.0


# ---- Zhang-Suen: every deleted pixel is a 4-boundary pixel -----------------


_ZS_OFF = {
    "p2": (-1, 0), "p3": (-1, 1), "p4": (0, 1), "p5": (1, 1),
    "p6": (1, 0), "p7": (1, -1), "p8": (0, -1), "p9": (-1, -1),
}


def _zs_subpass(grid, masks):
    h, wdt = grid.shape
    out = grid.copy()
    ring = ["p2", "p3", "p4", "p5", "p6", "p7", "p8", "p9"]
    for y in range(h):
        for x in range(wdt):
            if grid[y, x] != 1:
                continue
            nb = {}
            for nm, (dy, dx) in _ZS_OFF.items():
                yy, xx = y + dy, x + dx
                nb[nm] = int(grid[yy, xx]) if 0 <= yy < h and 0 <= xx < wdt else 0
            bsum = sum(nb.values())
            seq = [nb[n] for n in ring] + [nb["p2"]]
            a = sum(1 for u, v in zip(seq, seq[1:]) if u == 0 and v == 1)
            m1 = nb[masks[0][0]] * nb[masks[0][1]] * nb[masks[0][2]]
            m2 = nb[masks[1][0]] * nb[masks[1][1]] * nb[masks[1][2]]
            if 2 <= bsum <= 6 and a == 1 and m1 == 0 and m2 == 0:
                out[y, x] = 0
    return out


@given(st.integers(min_value=0, max_value=2**25 - 1))
@settings(max_examples=100, deadline=None)
def test_zhangsuen_deletes_only_4boundary_pixels(bits):
    """skeletonize_zhangsuen_1iter's masks force one of N/E/S and one
    of E/S/W to be background, so every deleted pixel must have a
    4-adjacent background neighbor (interior pixels survive) and the
    result is always a subset of the input."""
    grid = np.array(
        [(bits >> k) & 1 for k in range(25)], dtype=np.int64
    ).reshape(5, 5)
    t1 = _zs_subpass(grid, (("p2", "p4", "p6"), ("p4", "p6", "p8")))
    t2 = _zs_subpass(t1, (("p2", "p4", "p8"), ("p2", "p6", "p8")))
    assert np.all(t2 <= grid)
    for step_in, step_out in ((grid, t1), (t1, t2)):
        deleted = (step_in == 1) & (step_out == 0)
        ys, xs = np.nonzero(deleted)
        for y, x in zip(ys, xs):
            four = []
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                yy, xx = y + dy, x + dx
                four.append(
                    int(step_in[yy, xx])
                    if 0 <= yy < 5 and 0 <= xx < 5 else 0
                )
            assert 0 in four, (grid, y, x)
