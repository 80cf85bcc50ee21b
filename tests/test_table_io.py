"""TableIO provider: Parquet-dir fallback for the Iceberg API surface."""

from anisearch_model_spark.sources.table_io import TableIO


def test_parquet_roundtrip(spark, tmp_path):
    tio = TableIO(spark, fmt="parquet", warehouse=str(tmp_path))
    df = spark.range(10).withColumnRenamed("id", "v")
    assert not tio.exists("ns.t1")
    tio.write_overwrite(df, "ns.t1")
    assert tio.exists("ns.t1")
    assert tio.table("ns.t1").count() == 10
    tio.write_append(df, "ns.t1")
    assert tio.table("ns.t1").count() == 20


def test_partitioned_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    tio = TableIO(spark, fmt="parquet", warehouse=str(tmp_path))
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("int"))
    tio.write_overwrite(df, "t2", partition_by=["p"])
    only_p0 = spark.range(3).withColumn("p", F.lit(0))
    tio.write_overwrite(only_p0, "t2", partition_by=["p"])  # dynamic: p=1 kept
    out = tio.table("t2").groupBy("p").count().toPandas().set_index("p")["count"]
    assert out[0] == 3 and out[1] == 5
