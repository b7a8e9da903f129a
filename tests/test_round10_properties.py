"""Property tests for the round-10 x16-tier fixes: pure-Python references
for the math the fixed queries embed, on arbitrary inputs the fixtures
can't cover. No Spark — these pin the ALGORITHM, so engine, oracle and
property can never three-way drift.

The headline is the tree_depth_doubling invariant: pointer doubling over
the dense-rank heap must equal the sequential parent walk for ARBITRARY
sparse id sets — exactly the class the x16 tier caught (the old raw-id
map silently dropped every node whose arithmetic parent fell in an id
gap; dask_image_spark/queries/ranking.py::tree_depth_doubling)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---- pointer doubling over the dense-rank heap ------------------------------


def _depth_by_walk(v: int) -> int:
    """Sequential parent walk in the implicit binary heap (the oracle's
    recursive-CTE form)."""
    d = 0
    while v > 0:
        v = (v - 1) // 2
        d += 1
    return d


def _depths_by_doubling(ranks: list[int], rounds: int) -> dict[int, int]:
    """The query's doubling: seed each rank with (arithmetic parent, 1)
    — root gets a (self, 0) loop — then compose the TOTAL map with
    itself `rounds` times. Mirrors the join exactly: a rank's ancestor
    must exist in the map (totality over the dense 0..N-1 domain is
    what the dense-rank fix guarantees)."""
    amap = {
        v: ((v - 1) // 2, 1) if v > 0 else (0, 0) for v in ranks
    }
    for _ in range(rounds):
        nxt = {}
        for v, (a, d) in amap.items():
            ra, rd = amap[a]  # KeyError here == the sparse-id bug
            nxt[v] = (ra, d + rd)
        amap = nxt
    return {v: d for v, (a, d) in amap.items()}


@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_dense_rank_heap_doubling_matches_walk(ids):
    """For ANY sparse id set: dense-rank to 0..N-1, then 6 doubling
    rounds must produce exactly the sequential-walk depth for every
    node (6 rounds cover 2^6 = 64 levels >= log2(N) for any N < 2^64,
    the unroll bound the query documents)."""
    ranks = list(range(len(ids)))  # dense rank of the sorted id set
    got = _depths_by_doubling(ranks, rounds=6)
    for v in ranks:
        assert got[v] == _depth_by_walk(v), (v, got[v], _depth_by_walk(v))


@given(
    ids=st.sets(
        st.integers(min_value=0, max_value=10**9), min_size=2, max_size=64
    ),
)
@settings(max_examples=50, deadline=None)
def test_raw_id_heap_doubling_drops_gap_nodes(ids):
    """The negative control — the bug the x16 tier caught: over RAW
    sparse ids the ancestor map is not total, so the doubling's inner
    join (the KeyError in the reference) loses nodes whenever any id's
    arithmetic parent is absent. This asserts the failure MODE exists
    for every id set with at least one gap node, i.e. the dense-rank
    fix is necessary, not cosmetic."""
    idset = set(ids)
    has_gap = any(v > 0 and (v - 1) // 2 not in idset for v in idset)
    try:
        _depths_by_doubling(sorted(idset), rounds=6)
        survived = True
    except KeyError:
        survived = False
    assert survived == (not has_gap)


# ---- Box-Cox / geomean log-domain -------------------------------------------


@given(
    xs=st.lists(
        st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
        min_size=1, max_size=200,
    ),
)
@settings(max_examples=100, deadline=None)
def test_geomean_log_identity_on_positive_domain(xs):
    """exp(mean(ln x)) == (prod x)^(1/n) on the filtered x > 0 domain —
    the identity the udaf_geomean oracle relies on (pipeline.py).
    Computed in log space on both sides so the product can't overflow."""
    n = len(xs)
    lhs = math.exp(sum(math.log(x) for x in xs) / n)
    rhs = math.exp(math.fsum(math.log(x) for x in xs) / n)
    assert math.isclose(lhs, rhs, rel_tol=1e-9)


def test_geomean_zero_poisons_unfiltered_domain():
    """The caught failure shape: one exact zero drives the numpy-side
    log-mean to -inf while SQL LN(0) errors — the value > 0 filter is a
    domain requirement, not a convenience (udaf_geomean,
    boxcox_lambda_grid)."""
    import numpy as np

    with np.errstate(divide="ignore"):
        logs = np.log(np.array([1.0, 2.0, 0.0]))
    assert np.isneginf(logs).any()
    assert np.exp(logs.mean()) == 0.0


# ---- LOF ring blocking ------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=2, max_size=80, unique=True,
    ),
)
@settings(max_examples=100, deadline=None)
def test_offset_fanout_equals_theta_ring(pts):
    """The 9-offset fan-out equi-join produces EXACTLY the theta ring's
    candidate set (|dcx|<=1 and |dcy|<=1, a != b) with no duplicates —
    the rewrite local_outlier_factor relies on (curation.py): each
    b-cell matches exactly one (dx, dy) per probe."""
    cells = {i: (x, y) for i, (x, y) in enumerate(pts)}
    theta = {
        (i, j)
        for i in cells for j in cells
        if i != j
        and abs(cells[i][0] - cells[j][0]) <= 1
        and abs(cells[i][1] - cells[j][1]) <= 1
    }
    fanout = []
    for i, (cx, cy) in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                probe = (cx + dx, cy + dy)
                for j, c in cells.items():
                    if j != i and c == probe:
                        fanout.append((i, j))
    assert len(fanout) == len(set(fanout))  # no duplicate candidates
    assert set(fanout) == theta


# ---- two-phase (local-then-global) top-k ------------------------------------


@given(
    cand=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),   # ib
            st.floats(min_value=0.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False),  # d
            st.integers(min_value=0, max_value=8),     # cell group
            st.integers(min_value=0, max_value=15),    # salt group
        ),
        min_size=0, max_size=120,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_local_then_global_topk_equals_global_topk(cand, k):
    """Global top-k of per-group top-ks == global top-k of everything,
    for ANY partition of the candidates into groups, provided the order
    is total and each candidate occurs in exactly one group — the
    equivalence both local_outlier_factor's engine (local rank per
    (cell, salt) inside the join stage, then the global rank) and its
    oracle (per-offset-branch rank, then the global rank) rely on
    (curation.py). The order is the query's own: (round(d + eps, 9), ib),
    total because ib is unique per candidate."""
    key = lambda t: (round(t[1] + 1.2345e-8, 9), t[0])  # noqa: E731
    direct = sorted(cand, key=key)[:k]
    by_group: dict = {}
    for t in cand:
        by_group.setdefault((t[2], t[3]), []).append(t)
    survivors = [
        t for g in by_group.values() for t in sorted(g, key=key)[:k]
    ]
    two_phase = sorted(survivors, key=key)[:k]
    assert two_phase == direct
