"""Property tests for the continuation-session operators: pure-Python
mirrors of the exact SQL logic on arbitrary inputs (ties, empties, key
collisions) that the graded fixtures can't cover. No Spark."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from dask_image_spark.queries.curation import _POIS1_CDF


# ---- Poisson bootstrap: the CDF table IS Poisson(1) ------------------------


def test_pois1_cdf_table_is_exact():
    """The hard-coded thresholds must equal exp(-1) * sum(1/i!) — a typo
    in any digit silently biases every resample weight on BOTH engines
    (the shared-table design makes parity blind to it, so this test is
    the only guard)."""
    acc = 0.0
    for k, expected in enumerate(_POIS1_CDF):
        acc += 1.0 / math.factorial(k)
        assert abs(expected - acc * math.exp(-1)) < 1e-15, k
    # truncation point: P(X > 5) is far below any CI resolution
    assert 1.0 - _POIS1_CDF[-1] < 1e-3


@given(st.floats(min_value=0.0, max_value=1.0, exclude_max=True))
def test_pois1_case_is_monotone_inverse_cdf(u):
    """The CASE rendering maps u to the smallest k with u < CDF[k] —
    the textbook inverse-CDF draw (monotone, total)."""
    k = next((i for i, p in enumerate(_POIS1_CDF) if u < p), 6)
    if k < 6:
        assert u < _POIS1_CDF[k]
        assert k == 0 or u >= _POIS1_CDF[k - 1]


# ---- LPA: struct-max pick == (count DESC, label ASC) pick ------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 200)),
        min_size=1, max_size=40,
    )
)
def test_lpa_structmax_equals_ordered_pick(votes):
    """The engine picks the plurality label via max(struct(count, -label));
    the oracle via ROW_NUMBER() ORDER BY count DESC, label ASC. Equal for
    every vote multiset, including full ties."""
    counts: dict[int, int] = {}
    for lab, _ in votes:
        counts[lab] = counts.get(lab, 0) + 1
    oracle = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    engine = max((c, -lab) for lab, c in counts.items())
    assert -engine[1] == oracle


# ---- Containment vs Jaccard ------------------------------------------------


@given(
    st.sets(st.integers(0, 30), min_size=1, max_size=20),
    st.sets(st.integers(0, 30), min_size=1, max_size=20),
)
def test_containment_dominates_jaccard(a, b):
    """C(A->B) = |A∩B|/|A| >= J(A,B) always (the union contains A), with
    equality iff A ⊇ B — the asymmetry the query exists to expose."""
    i = len(a & b)
    c = i / len(a)
    j = i / (len(a) + len(b) - i)
    assert c >= j - 1e-12
    if b - a:
        assert c > j or i == 0


# ---- three-way MERGE: relational form == imperative apply ------------------


@given(
    st.dictionaries(st.integers(0, 30), st.integers(0, 100), max_size=15),
    st.dictionaries(
        st.integers(0, 40),
        st.tuples(st.sampled_from(["U", "D", "I"]), st.integers(0, 100)),
        max_size=15,
    ),
)
def test_merge_full_outer_equals_imperative_apply(target, batch):
    """The full-outer-join + CASE + delete-filter formulation must equal
    the imperative MERGE semantics for every (target, change-batch) pair:
    matched U rewrites, matched D drops, unmatched I/U inserts (MERGE
    upserts), unmatched D is a no-op delete."""
    # relational form (mirrors the query exactly)
    rel = {}
    for k in set(target) | set(batch):
        t, s = target.get(k), batch.get(k)
        if s is not None and s[0] == "D":
            if t is None:
                continue  # delete of a missing key: emits nothing
            continue  # matched delete: filtered out
        if s is not None:
            rel[k] = s[1]  # U or I takes the source value
        elif t is not None:
            rel[k] = t
    # imperative apply
    imp = dict(target)
    for k, (op, v) in batch.items():
        if op == "D":
            imp.pop(k, None)
        else:
            imp[k] = v
    assert rel == imp


# ---- checksum audit: flags exactly the corrupted buckets -------------------


def test_checksum_audit_flags_exactly_the_corrupted_buckets():
    """Independent of the hash arithmetic: a bucket must mismatch IFF it
    contains at least one row hit by the modified stripe or the dropped
    stripe (computed here WITHOUT hashes). Ties the audit's detection to
    ground truth; parity then ties the engine to this oracle."""
    import duckdb

    from dask_image_spark import queries as q

    q.load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
    )
    flagged = {
        b for b, m in con.execute(
            f"SELECT bucket, match FROM ({q.all_oracles()['table_checksum_audit']})"
        ).fetchall() if not m
    }
    expected = {
        b for (b,) in con.execute(
            """
            SELECT DISTINCT l_orderkey % 64 FROM lineitem
            WHERE (l_orderkey * 31 + l_linenumber) % 997 = 0
               OR (l_orderkey * 7 + l_linenumber) % 1009 = 0
            """
        ).fetchall()
    }
    assert flagged == expected
    assert flagged and len(flagged) < 64  # both outcome classes nonempty


# ---- floor-clamped balance: window identity == recursion -------------------


@given(st.lists(st.integers(-20, 20), min_size=1, max_size=50))
def test_balance_floor_identity_equals_recursion(deltas):
    """b_t = max(0, b_{t-1} + d_t) must equal
    prefix_t - min(0, running_min(prefix)) for every sequence — the
    identity that turns the sequential recurrence into two stacked
    window aggregates."""
    b = 0.0
    pfx = 0.0
    low = 0.0
    for d in deltas:
        b = max(0.0, b + d)
        pfx += d
        low = min(low, pfx)
        assert abs(b - (pfx - min(0.0, low))) < 1e-9, (deltas, b, pfx, low)


# ---- spatial blocking: 3x3 neighborhood covers the radius ------------------


@given(
    st.floats(min_value=40.0, max_value=49.9999),
    st.floats(min_value=0.0, max_value=9.9999),
    st.floats(min_value=40.0, max_value=49.9999),
    st.floats(min_value=0.0, max_value=9.9999),
)
def test_spatial_cells_cover_radius(la, loa, lb, lob):
    """Blocking completeness: any pair within 20 km must land in cells
    differing by at most 1 per axis at 0.3-degree cells — otherwise the
    equi-join on the 3x3 neighborhood silently DROPS true pairs (the
    failure mode a radius-join can't detect from its own output)."""
    km = 2 * 6371.0 * math.asin(
        math.sqrt(
            math.sin(math.radians(lb - la) / 2) ** 2
            + math.cos(math.radians(la))
            * math.cos(math.radians(lb))
            * math.sin(math.radians(lob - loa) / 2) ** 2
        )
    )
    if km <= 20.0:
        assert abs(math.floor(la / 0.3) - math.floor(lb / 0.3)) <= 1
        assert abs(math.floor(loa / 0.3) - math.floor(lob / 0.3)) <= 1


# ---- FIFO allocation: interval intersection == queue draining --------------


@given(
    st.lists(st.integers(1, 9), min_size=0, max_size=12),
    st.lists(st.integers(1, 9), min_size=0, max_size=12),
)
def test_fifo_intervals_equal_queue_drain(lots, demands):
    """The cumulative-axis interval intersection must equal the
    imperative FIFO drain (pop units off the oldest lot) for every
    (lots, demands) sequence — including exhausted supply, oversupply,
    and exact-boundary lots, the off-by-one hotspots."""
    # relational form
    rel = {}
    slo = 0
    for li, lq in enumerate(lots):
        shi = slo + lq
        dlo = 0
        for di, dq in enumerate(demands):
            dhi = dlo + dq
            ov = min(shi, dhi) - max(slo, dlo)
            if ov > 0:
                rel[(di, li)] = ov
            dlo = dhi
        slo = shi
    # imperative drain
    imp = {}
    queue = [[i, q] for i, q in enumerate(lots)]
    for di, dq in enumerate(demands):
        need = dq
        while need > 0 and queue:
            li, avail = queue[0]
            take = min(need, avail)
            imp[(di, li)] = imp.get((di, li), 0) + take
            need -= take
            if take == avail:
                queue.pop(0)
            else:
                queue[0][1] -= take
    assert rel == imp, (lots, demands, rel, imp)


# ---- BPE merge: island parity == imperative greedy-left --------------------


@given(
    st.lists(st.sampled_from("ab"), min_size=2, max_size=14),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")]),
)
def test_bpe_island_parity_equals_greedy_merge(syms, pair):
    """The gaps-and-islands parity rule (merge even offsets of each
    consecutive-occurrence island) must reproduce the imperative
    greedy-left BPE merge for every symbol sequence and pair — including
    self-pairs inside odd- and even-length runs, the overlap cases."""
    a, b = pair
    # imperative greedy-left
    imp = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            imp.append(a + b)
            i += 2
        else:
            imp.append(syms[i])
            i += 1
    # relational form: occurrences -> islands -> even offsets
    occ = [
        p for p in range(len(syms) - 1)
        if syms[p] == a and syms[p + 1] == b
    ]
    islands: list[list[int]] = []
    for p in occ:
        if islands and p == islands[-1][-1] + 1:
            islands[-1].append(p)
        else:
            islands.append([p])
    starts = {p for isl in islands for k, p in enumerate(isl) if k % 2 == 0}
    rel = []
    p = 0
    for p in range(len(syms)):
        if p in starts:
            rel.append(a + b)
        elif (p - 1) in starts:
            continue
        else:
            rel.append(syms[p])
    assert rel == imp, (syms, pair, rel, imp)
