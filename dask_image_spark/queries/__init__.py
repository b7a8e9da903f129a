"""Driver-graded query registry.

Each module under this package registers named (Spark callable, DuckDB oracle
SQL) pairs via ``base.register``. ``__spark_entry__.py`` exposes them as
``queries()`` / ``oracle_sql()``; the driver runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value-hash.

Float determinism policy: every compared float column is rounded (ROUND(x, 4)
or finer) on BOTH sides. Spark and DuckDB aggregate doubles in different
orders; last-ulp differences are expected and rounding makes the comparison
deterministic without hiding real bugs (which diverge at >= 1e-3).
"""

from dask_image_spark.queries.base import (  # noqa: F401
    REGISTRY,
    all_oracles,
    all_queries,
    release_caches,
)


def load_all() -> None:
    """Import every query module so its registrations run."""
    from dask_image_spark.queries import (  # noqa: F401
        curation,
        imaging,
        interp,
        pipeline,
        ranking,
        relational,
        streaming_ops,
        timeseries,
    )
