"""Loaders for the driver's parquet tables (plus generic scan helpers).

The reference's ingest surface is ``dask_image.imread.imread`` — a lazy,
per-slab file scan (upstream ``dask_image/imread/__init__.py``). Spark's
equivalent is the built-in lazy file scan: ``spark.read.parquet/csv/json``
splits files into tasks, pushes filters/prunes columns at the source, and
needs no custom code. Image-file ingest (binaryFile + decode) lives in
``operators/multimodal.py``.

Scale note: these are plain parquet scans — at 100 TB the same code holds
because Spark parallelizes by file/row-group split
(``spark.sql.files.maxPartitionBytes``); nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; fixes the ``events.ts`` timestamp[ns] column.

    With ``spark.sql.legacy.parquet.nanosAsLong=true`` the ns-precision ``ts``
    arrives as a long. ``ts div 1000`` (integer division — float division
    would round at ~2^53 and corrupt microseconds) then ``timestamp_micros``
    recovers a timestamp truncated to microseconds, matching how the DuckDB
    oracle's ns timestamps truncate when cast to regular (µs) timestamps.
    """
    # Defensive: the driver may hand us a session built without the engine
    # confs; both are runtime-settable and required for correct reads.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # a default-built session shuffles into 200 partitions — pure task
        # overhead at harness scale (AQE coalescing still applies either way)
        ("spark.sql.shuffle.partitions", "32"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views (``spark.sql`` access)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
