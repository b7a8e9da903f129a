from dask_image_spark.functions import boundary, kernels, pixelgrid  # noqa: F401
