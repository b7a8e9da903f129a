from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

# Cross-engine float determinism: Spark and DuckDB aggregate doubles in
# different orders, so sums/avgs differ in the last ulps. Rounding alone is
# not enough — the data has 2-decimal values, so aggregates frequently land
# *exactly on* a .00005 decimal boundary where a 1-ulp difference flips the
# rounded digit. The epsilon shifts every value off that grid (it is far
# below the 1e-4 comparison resolution, far above cross-engine noise) and
# also normalizes -0.0 to +0.0. Both engines apply the identical shift.
EPS = 1.2345e-8


def r(col: Column | str, n: int = 4) -> Column:
    """Deterministic cross-engine rounding (engine side)."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(EPS), n)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> weak rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
