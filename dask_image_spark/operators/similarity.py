"""Similarity search over embedding vectors (``array<float>`` columns).

Brute-force cosine is the correctness baseline: JVM-side ``zip_with`` +
``aggregate`` (whole-stage-codegen'd, no Python). The scale path is LSH
bucketing: deterministic sign-projection buckets turn the O(n^2) pair space
into per-bucket joins — the same reasoning as MinHash-LSH for text.

All arithmetic casts float32 elements to double *before* multiplying so the
DuckDB oracle (which computes in double) sees identical sums: both engines
then fold the same doubles in the same list order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def brute_force_topk(
    emb: DataFrame, query_id: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the row with ``query_id``.

    The 1-row query side is broadcast; the scan side never shuffles. The
    final top-k is a TakeOrderedAndProject — per-partition heaps merged on
    the driver, no global sort even at 10^9 vectors.
    """
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    return (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --- LSH sign-projection buckets --------------------------------------------
#
# Deterministic pseudo-random hyperplane b: coefficient for dimension i is
# ((b*131 + i*31) % 17) - 8  — integer arithmetic any engine reproduces.

def _proj_expr(vec_col: str, b: int, dim: int) -> Column:
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.element_at(F.col(vec_col), i + 1).cast("double")
            * (((F.lit(b) * 131 + i * 31) % 17) - 8).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(vec_col: str = "embedding", n_bits: int = 8, dim: int = 64) -> Column:
    """Sign-projection LSH bucket id (0 .. 2^n_bits - 1)."""
    out = F.lit(0)
    for b in range(n_bits):
        out = out + F.when(_proj_expr(vec_col, b, dim) > 0, F.lit(1 << b)).otherwise(0)
    return out


def lsh_bucket_sql(vec_expr: str = "embedding", n_bits: int = 8, dim: int = 64) -> str:
    """DuckDB expression for the identical bucket id."""
    terms = []
    for b in range(n_bits):
        proj = (
            f"list_aggregate(list_transform(generate_series(0, {dim - 1}), "
            f"i -> {vec_expr}[i + 1]::DOUBLE * "
            f"CAST((({b} * 131 + i * 31) % 17) - 8 AS DOUBLE)), 'sum')"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
