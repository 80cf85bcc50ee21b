"""Table provider abstraction: Iceberg API surface, Parquet-dir fallback.

The north rule targets Iceberg tables, but no Iceberg runtime jar ships in
this offline sandbox (pyspark 4.1.2 alone).  This thin provider exposes the
subset of the Iceberg surface the engine uses — ``table()``, ``write_append``,
``write_overwrite_partitions`` — over either backend, so the swap is pure
configuration (set ``ASMS_TABLE_FORMAT=iceberg`` + the usual
``spark.sql.catalog.*`` confs when a jar is present).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, fmt: str | None = None,
                 warehouse: str | None = None):
        self.spark = spark
        self.fmt = fmt or os.environ.get("ASMS_TABLE_FORMAT", "parquet")
        self.warehouse = warehouse or os.environ.get("ASMS_WAREHOUSE", "/tmp/asms_warehouse")

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name.replace(".", "/"))

    def table(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.table(name)
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.fmt == "iceberg":
            return self.spark.catalog.tableExists(name)
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write_append(self, df: DataFrame, name: str) -> None:
        if self.fmt == "iceberg":
            df.writeTo(name).append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def write_overwrite(self, df: DataFrame, name: str,
                        partition_by: list[str] | None = None) -> None:
        if self.fmt == "iceberg":
            w = df.writeTo(name)
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by).option(
                    "partitionOverwriteMode", "dynamic"
                )
            w.parquet(self._path(name))
