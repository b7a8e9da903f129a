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

from dask_image_spark.queries.base import r as _eps_round


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
            _eps_round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("cos_sim"),
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


def centroids_by(
    emb: DataFrame, cluster_col: str = "label",
    vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Per-cluster element-wise mean vector → (cluster_col, cvec).

    posexplode → groupBy(cluster, dim) keeps the aggregation partial-
    aggregatable (map-side combine) — a per-cluster ``collect_list`` of whole
    vectors would move every vector through one reducer per cluster instead.
    """
    dims = (
        emb.select(
            cluster_col,
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "v"),
        )
        .groupBy(cluster_col, "i")
        .agg(F.avg("v").alias("m"))
    )
    return dims.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def ivf_topk(
    emb: DataFrame, query_id: int, k: int = 10, n_probe: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cluster_col: str = "label", dim: int = 64,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize by ``cluster_col``, search only the
    ``n_probe`` clusters whose centroids are nearest the query.

    The scale story: centroids are tiny (n_clusters rows) and broadcast; the
    candidate scan is an equi-filter on the cluster column — with the vector
    table partitioned/bucketed by cluster, only probed partitions are read.
    Brute force within probed clusters is the exact IVF-Flat search step.
    """
    cents = centroids_by(emb, cluster_col, vec_col, dim)
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select(
            cluster_col,
            cosine(F.col("cvec"), F.col("_qvec").cast("array<double>")).alias("_cdist"),
        )
        .orderBy(F.col("_cdist").desc(), F.col(cluster_col))
        .limit(n_probe)
        .select(cluster_col)
    )
    cands = emb.join(F.broadcast(probed), on=cluster_col).filter(
        F.col(id_col) != query_id
    )
    return (
        cands.crossJoin(F.broadcast(q))
        .select(
            id_col,
            _eps_round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_lsh(
    emb: DataFrame, threshold: float = 0.9, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket-pruned.

    Sign-projection buckets shrink the O(n^2) pair space to per-bucket
    self-joins (near-identical vectors agree on every projection sign with
    high probability); exact cosine then filters candidates. At scale the
    bucket column is the shuffle key — one hash partition per bucket —
    instead of a full cross join.
    """
    b = emb.select(
        id_col, vec_col, lsh_bucket(vec_col, n_bits, dim).alias("bucket")
    )
    lhs, rhs = b.alias("l"), b.alias("r")
    cos = cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
    return (
        lhs.join(
            rhs,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
            _eps_round(cos, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


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
