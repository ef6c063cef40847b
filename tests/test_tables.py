"""Table IO abstraction: parquet backend write/read, partition overwrite,
empty-write schema retention, additive schema evolution (S12)."""

import pytest
from pyspark.sql import functions as F

from driftmind_spark.sources.tables import TableIO, iceberg_available


@pytest.fixture()
def io(spark):
    return TableIO(spark, backend="parquet")


def test_auto_backend_is_parquet_in_sandbox(spark):
    assert not iceberg_available(spark)
    assert TableIO(spark, backend="auto")._resolved() == "parquet"


def test_write_read_partitioned(spark, io, tmp_path):
    df = spark.range(100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    target = str(tmp_path / "t1")
    io.write(df, target, partition_by=("bucket",))
    back = io.read(target)
    assert back.count() == 100
    assert set(back.columns) == {"id", "bucket"}


def test_overwrite_partitions_only_touched(spark, io, tmp_path):
    target = str(tmp_path / "t2")
    df = spark.range(40).withColumn("bucket", (F.col("id") % 4).cast("int"))
    io.write(df, target, partition_by=("bucket",))
    # overwrite only bucket 0 with new values
    patch = (
        spark.range(1000, 1005)
        .withColumn("bucket", F.lit(0).cast("int"))
    )
    io.write(patch, target, partition_by=("bucket",), mode="overwrite_partitions")
    back = io.read(target)
    assert back.filter("bucket = 0").count() == 5
    assert back.filter("bucket != 0").count() == 30


def test_empty_write_keeps_schema(spark, io, tmp_path):
    target = str(tmp_path / "t3")
    df = spark.range(10).filter("id < 0").withColumn(
        "bucket", (F.col("id") % 4).cast("int")
    )
    io.write(df, target, partition_by=("bucket",))
    back = io.read(target)
    assert back.count() == 0
    assert set(back.columns) == {"id", "bucket"}


def test_additive_schema_evolution(spark, io, tmp_path):
    """S12: old rows readable after new columns appear (mergeSchema)."""
    target = str(tmp_path / "t4")
    v1 = spark.range(5).select("id", F.lit("a").alias("col_a"))
    io.write(v1, target)
    v2 = spark.range(5, 10).select(
        "id", F.lit("b").alias("col_a"), F.lit(1.5).alias("col_new")
    )
    io.write(v2, target, mode="append")
    evolved = io.add_columns_read(target)
    assert set(evolved.columns) == {"id", "col_a", "col_new"}
    assert evolved.filter(F.col("col_new").isNull()).count() == 5
