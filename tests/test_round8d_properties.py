"""Property tests for the third round-8 continuation batch: independent
numpy/pure-Python references for the formulas the new graded queries embed
(bilinear zoom mapping, L-inf two-phase distance decomposition, EWMA
closed form vs recurrence, Kendall tau-b vs merge-count, interval-merge
coverage vs sweep line). No Spark — these check the math the Spark and
DuckDB sides share, on arbitrary inputs the fixture can't cover."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ---- endpoint-aligned bilinear zoom -----------------------------------------


def _zoom_bilinear(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Reference: scipy-style grid_mode=False mapping src = out*(in-1)/(out-1),
    computed per-pixel with explicit corner weights (the query's formula)."""
    in_h, in_w = a.shape
    out = np.empty((out_h, out_w))
    for yo in range(out_h):
        fy = yo * (in_h - 1) / (out_h - 1)
        y0 = int(np.floor(fy))
        y1 = min(y0 + 1, in_h - 1)
        ty = fy - y0
        for xo in range(out_w):
            fx = xo * (in_w - 1) / (out_w - 1)
            x0 = int(np.floor(fx))
            x1 = min(x0 + 1, in_w - 1)
            tx = fx - x0
            out[yo, xo] = (
                (1 - ty) * (1 - tx) * a[y0, x0]
                + (1 - ty) * tx * a[y0, x1]
                + ty * (1 - tx) * a[y1, x0]
                + ty * tx * a[y1, x1]
            )
    return out


@given(
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=50, deadline=None)
def test_zoom_preserves_corners_and_interpolates_linearly(h, w, seed):
    """Two invariants any correct endpoint-aligned bilinear zoom holds:
    the four corners are reproduced exactly, and a bilinear (plane)
    input is reproduced exactly everywhere (order-1 interpolation is
    exact on order-1 signals)."""
    rng = np.random.RandomState(seed)
    a = rng.rand(h, w)
    z = _zoom_bilinear(a, 2 * h, 2 * w)
    assert z[0, 0] == a[0, 0]
    assert z[0, -1] == a[0, -1]
    assert z[-1, 0] == a[-1, 0]
    assert z[-1, -1] == a[-1, -1]

    yy, xx = np.mgrid[0:h, 0:w]
    plane = 0.3 * yy + 0.7 * xx + 1.25
    zp = _zoom_bilinear(plane, 2 * h, 2 * w)
    yo, xo = np.mgrid[0 : 2 * h, 0 : 2 * w]
    expect = (
        0.3 * yo * (h - 1) / (2 * h - 1)
        + 0.7 * xo * (w - 1) / (2 * w - 1)
        + 1.25
    )
    assert np.allclose(zp, expect, atol=1e-12)


# ---- L-inf distance transform two-phase decomposition ------------------------


@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_chessboard_two_phase_equals_brute_force(h, w, seed):
    """The graded query's decomposition — vertical L1 pass then per-row
    min over max(|dx|, D1) — must equal brute-force min over mask of
    max(|dy|, |dx|) on ANY mask (at least one seed pixel)."""
    rng = np.random.RandomState(seed)
    mask = rng.rand(h, w) < 0.3
    if not mask.any():
        mask[rng.randint(h), rng.randint(w)] = True
    ys, xs = np.nonzero(mask)

    # brute force
    yy, xx = np.mgrid[0:h, 0:w]
    brute = np.min(
        np.maximum(
            np.abs(yy[..., None] - ys[None, None, :]),
            np.abs(xx[..., None] - xs[None, None, :]),
        ),
        axis=2,
    )

    # two-phase
    INF = 1 << 20
    d1 = np.full((h, w), INF)
    for x in range(w):
        rows = np.nonzero(mask[:, x])[0]
        if len(rows):
            d1[:, x] = np.min(
                np.abs(np.arange(h)[:, None] - rows[None, :]), axis=1
            )
    two = np.empty((h, w), dtype=int)
    for y in range(h):
        for x in range(w):
            two[y, x] = min(
                max(abs(x - xp), d1[y, xp]) for xp in range(w)
            )
    assert np.array_equal(two, brute)


# ---- EWMA closed form vs recurrence ------------------------------------------


@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=200, deadline=None)
def test_ewma_closed_form_matches_recurrence(xs):
    """The oracle's telescoped prefix-sum form (1-a)^t * sum(x_i * a_i *
    (1-a)^-i) must equal the engine's literal recurrence y_t = a x_t +
    (1-a) y_{t-1} on any bounded series."""
    a = 0.6
    y = xs[0]
    rec = [y]
    for x in xs[1:]:
        y = a * x + (1 - a) * y
        rec.append(y)
    oma = 1 - a
    acc = 0.0
    closed = []
    for i, x in enumerate(xs):
        coef = 1.0 if i == 0 else a
        acc += x * coef * oma ** (-i)
        closed.append(oma**i * acc)
    assert np.allclose(rec, closed, rtol=1e-9, atol=1e-9)


# ---- Kendall tau-b pair counting ---------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_kendall_tau_b_matches_definition(pairs):
    """The query's (C - D)/sqrt((n0-tx)(n0-ty)) with tx/ty counting ALL
    x-tied / y-tied pairs must equal the textbook tau-b computed from
    tie-group counts: denominator sqrt((n0 - sum tx_g)(n0 - sum ty_g))."""
    from collections import Counter

    n = len(pairs)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    gx = sum(t * (t - 1) // 2 for t in Counter(p[0] for p in pairs).values())
    gy = sum(t * (t - 1) // 2 for t in Counter(p[1] for p in pairs).values())
    assert tx == gx and ty == gy
    if n0 > gx and n0 > gy:
        tau_query = (c - d) / np.sqrt((n0 - tx) * (n0 - ty))
        tau_text = (c - d) / np.sqrt((n0 - gx) * (n0 - gy))
        assert abs(tau_query - tau_text) < 1e-12
        assert -1.0 - 1e-12 <= tau_query <= 1.0 + 1e-12


# ---- interval merge coverage ---------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=0, max_value=1000),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_interval_merge_coverage_matches_sweep(starts, length):
    """The gaps-and-islands window formulation (island breaks where
    start > running max end) must produce the same total coverage and
    island count as a direct boolean sweep over the covered line."""
    iv = sorted((s, s + length) for s in starts)
    # window formulation
    islands = []
    cur_s, cur_e = iv[0]
    n_isl = 1
    for s, e in iv[1:]:
        if s > cur_e:
            islands.append((cur_s, cur_e))
            cur_s, cur_e = s, e
            n_isl += 1
        else:
            cur_e = max(cur_e, e)
    islands.append((cur_s, cur_e))
    cov = sum(e - s for s, e in islands)
    # boolean sweep
    line = np.zeros(max(e for _, e in iv) + 1, dtype=bool)
    for s, e in iv:
        line[s:e] = True
    assert cov == int(line.sum())
    # island count == runs of True
    runs = int(np.diff(np.concatenate(([0], line.view(np.int8), [0]))).clip(min=0).sum())
    assert n_isl == runs


# ---- GMM EM step --------------------------------------------------------------


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
        min_size=5,
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_gmm_em_step_increases_loglik_and_matches_direct(xs):
    """The query's sufficient-statistics M-step (log-domain logistic
    responsibilities, q/n - mu^2 variance) must match a direct numpy
    EM step, and one EM step must not decrease the log-likelihood
    (the EM monotonicity guarantee) given non-degenerate updates."""
    x = np.array(xs)
    mu = np.array([30.0, 70.0])
    V = 100.0
    g = -((x[:, None] - mu[None, :]) ** 2) / (2 * V)
    r = 1.0 / (1.0 + np.exp(g[:, ::-1] - g))  # logistic form, as the query
    r_direct = np.exp(g) / np.exp(g).sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore"):
        # where exp(g) underflows both ways the direct form is nan; the
        # logistic form still yields the correct saturated limit
        mask = ~np.isnan(r_direct).any(axis=1)
    assert np.allclose(r[mask], r_direct[mask], atol=1e-12)
    assert np.allclose(r.sum(axis=1), 1.0, atol=1e-12)

    n_k = r.sum(axis=0)
    if (n_k > 1e-9).all():
        pi_new = n_k / len(x)
        mu_new = (r * x[:, None]).sum(axis=0) / n_k
        q_over_n = (r * x[:, None] ** 2).sum(axis=0) / n_k
        v_new = q_over_n - mu_new**2
        # suff-stat variance equals direct weighted central moment
        v_direct = (r * (x[:, None] - mu_new[None, :]) ** 2).sum(axis=0) / n_k
        assert np.allclose(v_new, v_direct, atol=1e-6)

        def loglik(mus, vs, pis):
            gg = -((x[:, None] - mus[None, :]) ** 2) / (2 * vs[None, :])
            c = np.log(pis[None, :]) - 0.5 * np.log(2 * np.pi * vs[None, :])
            m = (gg + c).max(axis=1, keepdims=True)
            return (m[:, 0] + np.log(np.exp(gg + c - m).sum(axis=1))).sum()

        if (v_new > 1e-6).all():
            l0 = loglik(mu, np.array([V, V]), np.array([0.5, 0.5]))
            l1 = loglik(mu_new, v_new, pi_new)
            assert l1 >= l0 - 1e-7


# ---- AdaBoost weight algebra ---------------------------------------------------


@given(
    st.lists(st.booleans(), min_size=4, max_size=200).filter(
        lambda b: 0 < sum(b) < len(b)
    )
)
@settings(max_examples=200, deadline=None)
def test_adaboost_round2_two_weight_identity(misses):
    """After round 1, AdaBoost weights take exactly TWO values
    (exp(+a)/Z on h1-misses, exp(-a)/Z elsewhere), and the
    normalization Z cancels in any weighted-error RATIO — the identity
    that lets the query keep weights as a scalar CASE instead of a
    materialized column. Also: the round-1 stump's own weighted error
    under the updated weights is exactly 1/2 (the boosting
    orthogonality property)."""
    m = np.array(misses)
    n = len(m)
    eps = m.mean()
    alpha = 0.5 * np.log((1 - eps) / eps)
    w = np.where(m, np.exp(alpha), np.exp(-alpha))
    wn = w / w.sum()
    # ratio form (unnormalized) == normalized form
    sel = np.arange(n) % 3 == 0  # arbitrary candidate-error subset
    assert abs(w[sel].sum() / w.sum() - wn[sel].sum()) < 1e-12
    # h1's re-weighted error is exactly 1/2
    assert abs(wn[m].sum() - 0.5) < 1e-12


# ---- Euler number quad counting ------------------------------------------------


def _euler_quads(mask: np.ndarray) -> tuple[float, float]:
    """Quad counts via the QUERY'S OWN (nfg, diag) classification
    (``measure_euler_number``'s ``euler_quad_class``), not an
    independent re-derivation — so the engine/oracle condition and this
    topology check can never drift pairwise (VERDICT r9 item 1: the old
    independent reference disagreed with the shipped ``diag = 2``
    condition on ~76% of random masks and nothing connected them)."""
    from dask_image_spark.queries.imaging import euler_quad_class

    h, w = mask.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    counts = {"q1": 0, "q3": 0, "qd": 0}
    for y in range(h + 1):
        for x in range(w + 1):
            q = pad[y : y + 2, x : x + 2]
            nfg = int(q.sum())
            diag = int(q[0, 0]) + int(q[1, 1])  # fg pixels on main diag
            cls = euler_quad_class(nfg, diag)
            if cls is not None:
                counts[cls] += 1
    q1, q3, qd = counts["q1"], counts["q3"], counts["qd"]
    return (q1 - q3 + 2 * qd) / 4.0, (q1 - q3 - 2 * qd) / 4.0


def _euler_label(mask: np.ndarray, conn8: bool) -> int:
    """chi = components - holes via BFS labeling of fg (given conn) and
    of bg holes (dual connectivity), the topology definition."""
    from collections import deque

    h, w = mask.shape

    def comps(grid, conn8_):
        seen = np.zeros_like(grid, dtype=bool)
        n = 0
        nbrs = (
            [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
            if conn8_
            else [(-1, 0), (1, 0), (0, -1), (0, 1)]
        )
        for y in range(grid.shape[0]):
            for x in range(grid.shape[1]):
                if grid[y, x] and not seen[y, x]:
                    n += 1
                    dq = deque([(y, x)])
                    seen[y, x] = True
                    while dq:
                        cy, cx = dq.popleft()
                        for dy, dx in nbrs:
                            ny, nx = cy + dy, cx + dx
                            if (
                                0 <= ny < grid.shape[0]
                                and 0 <= nx < grid.shape[1]
                                and grid[ny, nx]
                                and not seen[ny, nx]
                            ):
                                seen[ny, nx] = True
                                dq.append((ny, nx))
        return n

    n_fg = comps(mask, conn8)
    # holes: bg components (dual connectivity) not touching the border
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    bg = ~pad
    n_bg = comps(bg, not conn8)
    return n_fg - (n_bg - 1)


@given(
    st.integers(min_value=2, max_value=7),
    st.integers(min_value=2, max_value=7),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_euler_quad_counts_match_topology(h, w, seed):
    """Gray's quad-count formulas must equal components-minus-holes from
    an actual labeling, for BOTH connectivities, on arbitrary masks."""
    rng = np.random.RandomState(seed)
    mask = rng.rand(h, w) < 0.45
    e4, e8 = _euler_quads(mask)
    assert e4 == _euler_label(mask, conn8=False)
    assert e8 == _euler_label(mask, conn8=True)


# ---- Shapley efficiency axiom --------------------------------------------------


@given(
    st.integers(min_value=2, max_value=5),
    st.integers(min_value=2, max_value=5),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_shapley_two_player_efficiency(nv, nh, seed):
    """The interventional two-player closed form must satisfy the
    efficiency axiom phi_v + phi_h = f(cell) - baseline EXACTLY for
    any cell table and any marginal weights."""
    rng = np.random.RandomState(seed)
    f = rng.rand(nv, nh)
    wv = rng.rand(nv)
    wv /= wv.sum()
    wh = rng.rand(nh)
    wh /= wh.sum()
    fv = f @ wh            # f(v, .)
    fh = wv @ f            # f(., h)
    f0 = wv @ f @ wh       # f(., .)
    for i in range(nv):
        for j in range(nh):
            phi_v = 0.5 * (f[i, j] - fh[j]) + 0.5 * (fv[i] - f0)
            phi_h = 0.5 * (f[i, j] - fv[i]) + 0.5 * (fh[j] - f0)
            assert abs(phi_v + phi_h - (f[i, j] - f0)) < 1e-12


# ---- Haar DWT Parseval --------------------------------------------------------


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=4,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_haar_two_level_preserves_energy(xs):
    """The orthonormal pairwise cascade must satisfy Parseval exactly:
    approx2 + detail2 + detail1 energies == energy of the truncated
    input (the invariant the graded query's three columns carry)."""
    n = len(xs) - len(xs) % 4
    x = np.array(xs[:n])
    if n == 0:
        return
    s2 = np.sqrt(2.0)
    a1 = (x[0::2] + x[1::2]) / s2
    d1 = (x[0::2] - x[1::2]) / s2
    a2 = (a1[0::2] + a1[1::2]) / s2
    d2 = (a1[0::2] - a1[1::2]) / s2
    lhs = float((a2**2).sum() + (d2**2).sum() + (d1**2).sum())
    rhs = float((x**2).sum())
    assert abs(lhs - rhs) <= 1e-9 * max(1.0, rhs)


# ---- Sinkhorn scaling ---------------------------------------------------------


@given(
    st.lists(st.floats(min_value=0.1, max_value=10, allow_nan=False),
             min_size=3, max_size=6),
    st.lists(st.floats(min_value=0.1, max_value=10, allow_nan=False),
             min_size=3, max_size=6),
)
@settings(max_examples=100, deadline=None)
def test_sinkhorn_column_marginal_exact_after_col_scale(aw, bw):
    """After a column scaling the plan's COLUMN marginals match b
    exactly (the alternating-projection invariant the query's v-steps
    rely on); more iterations shrink the row-marginal error."""
    k = min(len(aw), len(bw))
    a = np.array(aw[:k]); a /= a.sum()
    b = np.array(bw[:k]); b /= b.sum()
    C = np.abs(np.subtract.outer(np.arange(k), np.arange(k)))
    K = np.exp(-C / 0.5)
    u = np.ones(k)
    v = b / (K.T @ u)
    u = a / (K @ v)
    v = b / (K.T @ u)
    P = u[:, None] * K * v[None, :]
    assert np.allclose(P.sum(axis=0), b, atol=1e-12)
    err1 = np.abs(P.sum(axis=1) - a).sum()
    # one more full iteration cannot increase the row error
    u2 = a / (K @ v)
    v2 = b / (K.T @ u2)
    P2 = u2[:, None] * K * v2[None, :]
    err2 = np.abs(P2.sum(axis=1) - a).sum()
    assert err2 <= err1 + 1e-12


# ---- facility location submodularity ------------------------------------------


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_facility_location_gains_monotone_nonincreasing(seed):
    """Greedy marginal gains of the facility-location objective must be
    non-increasing round over round (submodularity) and non-negative."""
    rng = np.random.RandomState(seed)
    pts = rng.rand(40, 2)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    S = np.exp(-d2 / (2 * 0.02))
    best = np.zeros(len(pts))
    chosen: list[int] = []
    gains = []
    for _ in range(5):
        cand_gain = np.maximum(S - best[None, :], 0).sum(axis=1)
        cand_gain[chosen] = -1
        c = int(np.argmax(cand_gain))
        gains.append(cand_gain[c])
        chosen.append(c)
        best = np.maximum(best, S[c])
    assert all(g >= 0 for g in gains)
    assert all(b <= a + 1e-9 for a, b in zip(gains, gains[1:]))


# ---- empirical Bayes shrinkage ------------------------------------------------


@given(
    st.floats(min_value=0.5, max_value=50, allow_nan=False),
    st.floats(min_value=0.5, max_value=50, allow_nan=False),
    st.integers(min_value=1, max_value=100),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=200, deadline=None)
def test_eb_posterior_between_prior_and_raw(alpha, beta, n, k):
    """The Beta-Binomial posterior mean must lie between the prior mean
    and the raw rate, and approach the raw rate as n grows."""
    k = min(k, n)
    prior = alpha / (alpha + beta)
    raw = k / n
    post = (alpha + k) / (alpha + beta + n)
    lo, hi = min(prior, raw), max(prior, raw)
    assert lo - 1e-12 <= post <= hi + 1e-12
    post_big = (alpha + 100 * k) / (alpha + beta + 100 * n)
    assert abs(post_big - raw) <= abs(post - raw) + 1e-12


# ---- Mahalanobis affine invariance --------------------------------------------


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_mahalanobis_invariant_under_affine_map(seed):
    """d^2 computed with the closed-form 2x2 inverse must be invariant
    under any invertible affine transform of the data — the defining
    property (and a direct check of the adj/det algebra)."""
    rng = np.random.RandomState(seed)
    X = rng.randn(200, 2) * [2.0, 0.5] + [1.0, -3.0]
    A = rng.randn(2, 2)
    while abs(np.linalg.det(A)) < 0.1:
        A = rng.randn(2, 2)
    Y = X @ A.T + rng.randn(2)

    def d2(Z):
        mu = Z.mean(axis=0)
        c = np.cov(Z.T, bias=True)
        a, b, cc = c[0, 0], c[0, 1], c[1, 1]
        det = a * cc - b * b
        dx = Z[:, 0] - mu[0]
        dy = Z[:, 1] - mu[1]
        return (cc * dx * dx - 2 * b * dx * dy + a * dy * dy) / det

    assert np.allclose(d2(X), d2(Y), atol=1e-8)


# ---- LOF inlier baseline ------------------------------------------------------


def test_lof_uniform_grid_scores_near_one():
    """On a perfectly regular grid every interior point's LOF must be
    ~1 (the inlier fixed point of the density ratio)."""
    xs, ys = np.mgrid[0:12, 0:12]
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(float)
    k = 5
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    kdist = d[np.arange(len(pts))[:, None], idx].max(axis=1)
    reach = np.maximum(kdist[idx], d[np.arange(len(pts))[:, None], idx])
    lrd = k / reach.sum(axis=1)
    lof = lrd[idx].mean(axis=1) / lrd
    interior = (
        (pts[:, 0] > 2) & (pts[:, 0] < 9) & (pts[:, 1] > 2) & (pts[:, 1] < 9)
    )
    assert np.all(np.abs(lof[interior] - 1.0) < 1e-9)
