"""Salted equi-join: the shared skew/parallelism-ceiling idiom.

Round 10 applied the identical hand-rolled pattern in five places
(``dedup_semantic``, ``cluster_medoid``, ``local_outlier_factor``,
``join_salted_skew``, and the two-stage ``agg_salted_skew`` variant);
SCALE.md counts eight measured instances of the underlying rule
("partition Python/pair stages by CPU work, not byte size"). This module
factors the join-side idiom into one audited helper so the next instance
is a one-liner and the plan pins point at a single implementation.

The problem it solves: an equi-join whose key domain is SMALL (k-means
cluster ids, grid cells, one hot user) is a parallelism ceiling — the
pair work inside each key is quadratic-ish CPU while the rows are tiny in
bytes, so AQE's byte-based coalescing shrinks the stage to a handful of
tasks and one dense key becomes a multi-minute straggler (measured: 550 s
-> 35 s for cluster_medoid at the x16 parity tier, a 20+-minute LOF
straggler at x32, 208 s -> 21 s for SemDeDup).

The fix, exactly as in the hand-rolled sites:

- ``b`` is salted DETERMINISTICALLY (``pmod(b_salt, n_salt)``) — each b
  row gets exactly one salt;
- ``a`` is replicated across ALL ``n_salt`` salts via an exploded array
  literal — a map-side generator, NO broadcast exchange and no
  BroadcastNestedLoopJoin in the plan (the hand-rolled sites used a
  broadcast range cross join; explode is plan-for-plan cheaper) — so
  every (a, b) pair still meets exactly once and the pair set is
  IDENTICAL to the unsalted join (no duplicates, no drops);
- both sides get an explicit USER-SPECIFIED ``repartition(width,
  *on, "_salt")`` — AQE leaves user exchanges alone, so the join width
  is pinned by the CPU work, not the byte size, and the composite
  (on..., _salt) key fans the hot keys over ``n_salt`` times more tasks.

Width derives from the session (``max(defaultParallelism,
spark.sql.shuffle.partitions)``) so a larger cluster automatically gets a
wider join — never a hard-coded constant that becomes the next ceiling
(ADVICE r10 on local_outlier_factor's ``repartition(128, ...)``).

Upstream dask-image has no equivalent (it never shuffles); the pattern is
the standard Spark salting recipe (e.g. Spark SQL docs' skew-join
guidance) applied to CPU-bound pair stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def session_width(spark, factor: int = 1) -> int:
    """The partition width a CPU-bound stage should fan out to: the max of
    the executor-core count and the configured shuffle width, times an
    optional ``factor`` for stages whose per-key work is known-dense
    (LOF's eps-cells). Deriving from the session means a 1000-executor
    cluster gets a 1000-executor-wide join with no code change."""
    base = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return base * max(1, factor)


def salted_pair_join(
    a: DataFrame,
    b: DataFrame,
    on: Sequence[str],
    b_salt: Column,
    *,
    n_salt: int = 16,
    width: int | None = None,
    width_factor: int = 1,
    join_hint: str | None = None,
) -> DataFrame:
    """Inner-join ``a`` and ``b`` on the shared key columns ``on`` with a
    composite salt appended to the equi-keys.

    ``b_salt`` is any deterministic integer Column over ``b``'s columns
    (typically the row id or its hash); it is taken mod ``n_salt``. The
    output carries every column of ``a`` and ``b`` plus the ``_salt``
    column (kept deliberately: per-key local windows downstream can
    partition by (on..., _salt, ...) and stay exchange-free because the
    join output is already hash-partitioned on the subset (on..., _salt)).
    Callers that don't need it just never select it.

    ``join_hint`` (e.g. ``"merge"``) pins the physical strategy when the
    salting exists precisely because neither side is broadcastable —
    without it Spark may broadcast at fixture scale and hide the skew the
    query is demonstrating.

    The pair set is exactly the unsalted ``a.join(b, on)``: each b row
    carries one salt, each a row is replicated across all salts, so each
    (a, b) key-match meets on exactly one composite key. Apply any
    inequality/threshold conditions as post-filters — Catalyst pushes
    them into the join.

    ``b_salt`` may evaluate to NULL (ADVICE r11: ``pmod(NULL, n)`` is
    NULL, and an inner equi-join on a NULL ``_salt`` would silently DROP
    that b row, breaking the exactly-the-unsalted-join contract); it is
    coalesced to ``pmod(hash(*on), n_salt)`` (ADVICE r12 — a constant-0
    fallback would collapse ALL NULL-salt rows into one bucket) so
    NULL-salt rows land in a deterministic per-key bucket and still meet
    every replicated a row once. Any fallback placement is pair-set
    neutral because ``a`` is replicated across every salt. Limitation,
    by construction: if the caller's salt expression is NULL precisely
    on the rows of ONE hot key, the key-derived fallback still puts them
    all in the same bucket and the skew mitigation degenerates to the
    unsalted hotspot for that key — pick a ``b_salt`` that is non-NULL
    on skewed keys (a row id, or a hash over columns that vary within
    the hot key).
    """
    spark = a.sparkSession
    if width is None:
        width = session_width(spark, width_factor)
    on = list(on)
    a_rep = a.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salt)])),
    ).repartition(width, *on, SALT_COL)
    # The join STRATEGY must be pinned, not just the exchanges: the
    # user repartitions guarantee the distribution, but the planner is
    # still free to broadcast one side on top of them (the replicated
    # side is explode-derived, so its static size estimate is
    # Generate-blind — the round-11 x256 audit caught exactly this on
    # cluster_medoid), which ships a corpus-linear frame to every
    # executor and silently voids the salt. Default to a merge hint
    # (sort-within-partition, zero new exchange, spill-safe); callers
    # may pass a different join_hint but never an unpinned join.
    a_rep = a_rep.hint(join_hint or "merge")
    b_s = b.withColumn(
        SALT_COL,
        F.pmod(
            F.coalesce(b_salt, F.hash(*[F.col(c) for c in on])),
            F.lit(n_salt),
        ).cast("int"),
    ).repartition(width, *on, SALT_COL)
    return a_rep.join(b_s, on + [SALT_COL])
