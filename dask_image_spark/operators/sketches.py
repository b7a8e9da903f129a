"""Mergeable-summary sketch primitives shared by the ranking queries and
their property tests.

The Spark queries (queries/ranking.py) embed these inside Arrow-batched
closures; the pure functions live here so the mathematical guarantees —
the properties the 100 TB designs rest on — are Hypothesis-testable
without a SparkSession:

* Misra-Gries merge (Agarwal et al., "Mergeability of Summaries",
  PODS'12): any item with global frequency > n/K survives in the
  summary of the partition where it is heavy (pigeonhole), and merging
  counted batches preserves that, because the total decrement applied
  never exceeds n_p/K.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable, Mapping


def mg_merge_counts(
    counters: dict, batch_counts: Mapping, k: int
) -> dict:
    """Merge one counted batch into a Misra-Gries summary of ≤ k-1
    counters. Returns the new summary (may be the same dict mutated).

    Combine rule: add the batch's counts, and if more than k-1 counters
    remain, subtract the k-th largest count from ALL counters and drop
    the non-positive ones — at most k-1 strictly-greater values survive,
    and the decrement charged to any single item is bounded by the mass
    removed / k, preserving the standard MG error bound
    (true_freq - summary_count <= n/k)."""
    for it, c in batch_counts.items():
        counters[it] = counters.get(it, 0) + c
    if len(counters) > k - 1:
        vals = sorted(counters.values(), reverse=True)
        m = vals[k - 1]
        counters = {key: v - m for key, v in counters.items() if v > m}
    return counters


def mg_summarize(items: Iterable, k: int, batch_size: int = 1024) -> dict:
    """Run the batched MG merge over an item stream (the exact loop the
    ``mg_heavy_hitters`` mapInPandas closure runs per partition)."""
    counters: dict = {}
    batch: list = []
    for it in items:
        batch.append(it)
        if len(batch) >= batch_size:
            counters = mg_merge_counts(counters, Counter(batch), k)
            batch = []
    if batch:
        counters = mg_merge_counts(counters, Counter(batch), k)
    return counters
