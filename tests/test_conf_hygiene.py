"""Session-conf hygiene: queries that flip SQL confs for their own scan or
parse path must restore them before returning (ADVICE r9 — a leaked
``parquet.aggregatePushdown`` silently changes every later DSv2 aggregate's
plan shape; a leaked ``scripting.enabled`` widens the SQL surface for every
later ``spark.sql`` call)."""

from __future__ import annotations

from dask_image_spark.queries.base import REGISTRY
from tests.conftest import SF_MID

WATCHED = (
    "spark.sql.parquet.aggregatePushdown",
    "spark.sql.sources.useV1SourceList",
    "spark.sql.scripting.enabled",
)


def _snapshot(spark):
    return {k: spark.conf.get(k) for k in WATCHED}


def test_scan_agg_pushdown_restores_confs(spark):
    before = _snapshot(spark)
    REGISTRY["scan_agg_pushdown"].fn(spark, SF_MID).collect()
    assert _snapshot(spark) == before


def test_sql_scripting_block_restores_confs(spark):
    before = _snapshot(spark)
    REGISTRY["sql_scripting_block"].fn(spark, SF_MID).collect()
    assert _snapshot(spark) == before
