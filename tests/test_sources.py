

def test_rangegen_partition_plan_honored(spark):
    """The connector's declared split plan IS the task layout: 8 declared
    InputPartitions -> 8 scan partitions, and each holds exactly its
    residue class."""
    from pyspark.sql import functions as F

    from dask_image_spark.sources.pyds import register_rangegen

    register_rangegen(spark)
    df = (
        spark.read.format("rangegen")
        .option("n", 1000).option("parts", 8).load()
    )
    assert df.rdd.getNumPartitions() == 8
    bad = df.filter((F.col("id") % 8) != F.col("part")).count()
    assert bad == 0
    assert df.count() == 1000


def test_rangegen_uneven_split(spark):
    """Remainder handling: n not divisible by parts must still cover the
    id range exactly once (residue-class partitioning has no stragglers
    to mis-assign)."""
    from dask_image_spark.sources.pyds import register_rangegen

    register_rangegen(spark)
    df = (
        spark.read.format("rangegen")
        .option("n", 10).option("parts", 3).load()
    )
    rows = sorted((r["id"], r["part"]) for r in df.collect())
    assert [i for i, _ in rows] == list(range(10))
    from collections import Counter

    sizes = Counter(p for _, p in rows)
    assert sizes == {0: 4, 1: 3, 2: 3}
