from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_image_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dask-image-spark-tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_MID


@pytest.fixture(autouse=True)
def _release_query_caches():
    """Unpersist tracked intermediates after every test so cached count /
    posting tables never accumulate across the 500-test session."""
    yield
    from dask_image_spark import queries as q

    q.release_caches()
