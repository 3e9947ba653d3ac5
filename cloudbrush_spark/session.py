"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` but every conf here is chosen for the
1000-executor / 100 TB deployment: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), broadcast threshold generous enough to
keep dimension joins shuffle-free, Arrow on for the few Pandas-UDF
operators, shuffle partitions sized by cores locally and overridable by
env for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cloudbrush-spark", extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle_partitions = os.environ.get("CLOUDBRUSH_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("CLOUDBRUSH_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("CLOUDBRUSH_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver's parquet tables and register them as temp views.

    Returns a dict name -> DataFrame.  Registering views lets operators be
    written either in the DataFrame API or via ``spark.sql``.
    """
    names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
