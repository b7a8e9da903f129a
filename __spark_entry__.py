"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` / ``oracle_sql()`` are
the per-operator correctness registry (see dask_image_spark/queries/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_image_spark import queries as _q  # noqa: E402

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-ish Q1 pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from dask_image_spark.queries.relational import q1_impl

    return q1_impl(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every strong-checkable query."""
    return _q.all_oracles()
