"""Property tests for the mergeable-sketch guarantees the ranking queries
rest on — no SparkSession needed; these test the exact functions the
Arrow-batched closures call.

The load-bearing property: `mg_heavy_hitters` is EXACT because the
Misra-Gries candidate set is a guaranteed superset of the true heavy
hitters (the exact rescan only prunes). If the merge rule ever broke that
superset guarantee, the graded query would silently drop a heavy hitter —
this suite makes that a loud local failure on randomized streams instead
of a driver-round surprise.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from dask_image_spark.operators.sketches import mg_merge_counts, mg_summarize


@settings(max_examples=200, deadline=None)
@given(
    items=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=2000),
    k=st.integers(min_value=2, max_value=20),
    batch_size=st.integers(min_value=1, max_value=257),
)
def test_mg_superset_guarantee(items, k, batch_size):
    """Every item with frequency > n/k must survive in the summary,
    regardless of batch split."""
    summary = mg_summarize(items, k, batch_size=batch_size)
    n = len(items)
    true_counts = Counter(items)
    heavy = {it for it, c in true_counts.items() if c * k > n}
    missing = heavy - set(summary)
    assert not missing, (
        f"heavy hitters lost by the sketch: {missing} "
        f"(n={n}, k={k}, batch={batch_size})"
    )
    assert len(summary) <= k - 1 or len(true_counts) <= k - 1


@settings(max_examples=200, deadline=None)
@given(
    items=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=2000),
    k=st.integers(min_value=2, max_value=20),
    batch_size=st.integers(min_value=1, max_value=257),
)
def test_mg_count_error_bound(items, k, batch_size):
    """The summary's count underestimates by at most n/k (the classic MG
    bound) — what keeps the candidate set small AND complete."""
    summary = mg_summarize(items, k, batch_size=batch_size)
    n = len(items)
    true_counts = Counter(items)
    for it, est in summary.items():
        assert 0 < est <= true_counts[it]
        assert true_counts[it] - est <= n / k + 1e-9


@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.integers(min_value=0, max_value=20), max_size=500),
    b=st.lists(st.integers(min_value=0, max_value=20), max_size=500),
    k=st.integers(min_value=2, max_value=10),
)
def test_mg_batch_split_invariance_of_guarantee(a, b, k):
    """Merging two counted batches preserves the guarantee over the
    CONCATENATED stream (the per-partition situation: Arrow hands the
    rows in arbitrary batch splits)."""
    items = a + b
    if not items:
        return
    summary = mg_merge_counts(
        mg_merge_counts({}, Counter(a), k), Counter(b), k
    )
    n = len(items)
    heavy = {it for it, c in Counter(items).items() if c * k > n}
    assert heavy <= set(summary)
