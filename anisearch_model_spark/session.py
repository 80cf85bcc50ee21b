"""SparkSession factory tuned for this engine.

Local mode stands in for a multi-executor cluster; parallelism is a
parameter so the N-vs-4N scaling run (BASELINE.json north rule) can build
the same index at local[8] and local[32].
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def package_zip(dest: str | None = None) -> str:
    """Zip this package for ``spark-submit --py-files`` / ``addPyFile``.

    Executor Python workers do not inherit the driver's ``sys.path``, so
    any UDF that imports ``anisearch_model_spark`` needs the package shipped
    explicitly (north rule: runs via spark-submit --py-files).
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # we are ALREADY running from a zip (spark-submit --py-files):
        # re-zipping would walk an empty path and truncate the very
        # archive we are imported from — return that archive instead
        archive = pkg_dir
        while archive and not os.path.isfile(archive):
            parent = os.path.dirname(archive)
            if parent == archive:
                return pkg_dir
            archive = parent
        return archive
    root = os.path.dirname(pkg_dir)
    dest = dest or os.path.join("/tmp", "anisearch_model_spark_pyfiles.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith((".py",)):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return dest


def get_spark(
    app_name: str = "anisearch_model_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
