"""The shared salted-join helper (operators/salted.py) must be a pure
plan transformation: the pair set is EXACTLY the unsalted equi-join, the
salt genuinely lands in the physical join keys, and the width derives
from the session (never a hard-coded constant — ADVICE r10 on LOF's
repartition(128, ...))."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from dask_image_spark.operators.salted import (
    salted_pair_join,
    session_width,
)


def _frames(spark):
    a = spark.range(200).select(
        F.pmod(F.col("id"), F.lit(3)).alias("k"),
        F.col("id").alias("ia"),
    )
    b = spark.range(150).select(
        F.pmod(F.col("id"), F.lit(3)).alias("k"),
        (F.col("id") * 7).alias("ib"),
        F.col("id").alias("bid"),
    )
    return a, b


def test_pair_set_identical_to_unsalted_join(spark):
    a, b = _frames(spark)
    plain = sorted(
        (r.ia, r.ib) for r in a.join(b, "k").select("ia", "ib").collect()
    )
    salted = sorted(
        (r.ia, r.ib)
        for r in salted_pair_join(a, b, ["k"], F.col("bid"), n_salt=16)
        .select("ia", "ib")
        .collect()
    )
    assert salted == plain  # no duplicates, no drops


def test_salt_is_in_the_physical_join_keys(spark):
    a, b = _frames(spark)
    df = salted_pair_join(a, b, ["k"], F.col("bid"), n_salt=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    i = plan.index("Left keys")
    assert "_salt" in plan[i : i + 200], plan[i : i + 400]
    # the replication is a map-side generator, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the user repartition that pins the width must survive planning
    assert "REPARTITION_BY_NUM" in plan


def test_width_derives_from_session(spark):
    base = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    assert session_width(spark) == base
    assert session_width(spark, 4) == 4 * base


def test_nonuniform_salt_expression_still_exact(spark):
    # hash-based salts (the LOF form) must give the same pair set too
    a, b = _frames(spark)
    plain = a.join(b, "k").count()
    assert (
        salted_pair_join(a, b, ["k"], F.hash("ib"), n_salt=5).count()
        == plain
    )


def test_null_salt_rows_are_never_dropped(spark):
    """ADVICE r11: pmod(NULL, n) is NULL and an inner equi-join on a NULL
    _salt silently drops that b row, diverging from the unsalted join.
    The helper coalesces the salt to bucket 0, so a b_salt expression
    that evaluates NULL on some rows must still yield EXACTLY the
    unsalted pair set."""
    a, b = _frames(spark)
    # NULL salt on every third b row
    nullable = F.when(F.col("bid") % 3 == 0, F.lit(None)).otherwise(
        F.col("bid")
    )
    plain = sorted(
        (r.ia, r.ib) for r in a.join(b, "k").select("ia", "ib").collect()
    )
    salted = sorted(
        (r.ia, r.ib)
        for r in salted_pair_join(a, b, ["k"], nullable, n_salt=16)
        .select("ia", "ib")
        .collect()
    )
    assert salted == plain  # NULL-salt rows land in bucket 0, not dropped
