from dask_image_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    register_views,
)
