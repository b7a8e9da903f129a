"""Property tests for the algorithm EQUIVALENCES the round-7 query pairs
rely on — each graded query proves engine == oracle on the fixture; these
prove the underlying reformulation (scan-line skyline, pointer doubling,
sweep line, gaps-and-islands) equals its brute-force definition on
ARBITRARY inputs, catching the tie/empty/degenerate cases a fixture
can't cover. Pure Python mirrors of the exact SQL logic — no Spark.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# ---- Pareto skyline: scan-line == dominance definition ---------------------

def _skyline_bruteforce(rows):
    """rows: list of (key, size, price). Non-dominated per the query's
    definition (need one strict inequality)."""
    out = []
    for i, (ki, si, pi) in enumerate(rows):
        dominated = any(
            j != i
            and ((sj > si and pj <= pi) or (sj >= si and pj < pi))
            for j, (kj, sj, pj) in enumerate(rows)
        )
        if not dominated:
            out.append(ki)
    return sorted(out)


def _skyline_scanline(rows):
    """The engine's formulation: sort by size desc; survive iff
    (min price among strictly larger sizes) > price AND
    (min price among size >= own, self included) >= price."""
    out = []
    for ki, si, pi in rows:
        m_strict = min(
            (pj for _, sj, pj in rows if sj > si), default=None
        )
        m_incl = min(pj for _, sj, pj in rows if sj >= si)
        if (m_strict is None or m_strict > pi) and m_incl >= pi:
            out.append(ki)
    return sorted(out)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.floats(0, 100, allow_nan=False)),
        min_size=1, max_size=40,
    )
)
def test_skyline_scanline_equals_definition(points):
    rows = [(i, s, round(p, 2)) for i, (s, p) in enumerate(points)]
    assert _skyline_scanline(rows) == _skyline_bruteforce(rows)


# ---- Pointer doubling: log-rounds == sequential walk -----------------------

@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=400), st.integers(2, 8))
def test_pointer_doubling_equals_walk(n, rounds):
    parent = {0: 0, **{v: (v - 1) // 2 for v in range(1, n)}}

    def walk_depth(v):
        d = 0
        while v != 0:
            v = parent[v]
            d += 1
        return d

    # the engine's state: (ancestor, steps) composed with itself per round
    anc = {v: (parent[v], 0 if v == 0 else 1) for v in range(n)}
    for _ in range(rounds):
        anc = {
            v: (anc[a][0], d + anc[a][1]) for v, (a, d) in anc.items()
        }
    import math

    max_depth = max(walk_depth(v) for v in range(n))
    if 2 ** rounds >= max_depth:
        for v in range(n):
            a, d = anc[v]
            assert a == 0 and d == walk_depth(v), (v, a, d)


# ---- Sweep line: running-sum peak == brute-force interval stabbing ---------

@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=40),
    st.integers(1, 20),
)
def test_sweepline_peak_equals_bruteforce(starts, length):
    intervals = [(s, s + length) for s in starts]  # half-open [s, e)
    # brute force: max over all start points of open-interval count
    brute = max(
        sum(1 for (s, e) in intervals if s <= t < e)
        for (t, _) in intervals
    )
    # sweep: +1 at s (kind 1), -1 at e (kind 0); ends before starts on ties
    bounds = [(s, 1, +1) for s, _ in intervals] + [
        (e, 0, -1) for _, e in intervals
    ]
    bounds.sort()
    peak, cur = 0, 0
    for _, _, d in bounds:
        cur += d
        peak = max(peak, cur)
    assert peak == brute


# ---- Gaps and islands: day - rank == maximal consecutive runs --------------

@settings(max_examples=300, deadline=None)
@given(st.sets(st.integers(0, 60), min_size=1, max_size=40))
def test_islands_trick_equals_run_scan(days):
    ordered = sorted(days)
    islands = {}
    for rn, day in enumerate(ordered, start=1):
        islands.setdefault(day - rn, []).append(day)
    # brute force: longest run of consecutive integers
    longest, cur = 1, 1
    for a, b in zip(ordered, ordered[1:]):
        cur = cur + 1 if b == a + 1 else 1
        longest = max(longest, cur)
    assert max(len(v) for v in islands.values()) == longest
    assert sum(len(v) for v in islands.values()) == len(days)


# ---- Separable L1 distance transform == brute-force nearest search ---------

@settings(max_examples=200, deadline=None)
@given(
    st.integers(2, 12), st.integers(2, 12),
    st.sets(st.integers(0, 143), min_size=1, max_size=30),
)
def test_l1_dt_separable_equals_bruteforce(h, w, mask_cells):
    import numpy as np

    mask = np.zeros((h, w), dtype=bool)
    any_set = False
    for c in mask_cells:
        y, x = c // 12, c % 12
        if y < h and x < w:
            mask[y, x] = True
            any_set = True
    if not any_set:
        mask[0, 0] = True
    INF = 1 << 20
    g = np.where(mask, 0, INF)
    xs = np.arange(w)
    # row pass: the two running-min frames
    dr = np.minimum(
        np.minimum.accumulate(g - xs, axis=1) + xs,
        np.minimum.accumulate((g + xs)[:, ::-1], axis=1)[:, ::-1] - xs,
    )
    ys = np.arange(h)[:, None]
    dt = np.minimum(
        np.minimum.accumulate(dr - ys, axis=0) + ys,
        np.minimum.accumulate((dr + ys)[::-1, :], axis=0)[::-1, :] - ys,
    )
    # brute force
    my, mx = np.nonzero(mask)
    brute = np.min(
        np.abs(np.arange(h)[:, None, None] - my)
        + np.abs(np.arange(w)[None, :, None] - mx),
        axis=2,
    )
    assert (dt == brute).all()
