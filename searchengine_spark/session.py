"""SparkSession factory with the engine's scale-oriented defaults.

Local mode here stands in for a multi-executor cluster; every setting is
chosen to survive a 1000-executor / 100 TB deployment:
  * AQE on (runtime coalesce + skew-join splitting),
  * Arrow on (all Python UDFs are vectorized pandas UDFs),
  * shuffle partitions sized explicitly (never the 200 default blindly),
  * broadcast threshold left to AQE but small dims are broadcast
    explicitly at call sites.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
        shuffle_partitions = max(8, cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Janino class cache (STATIC conf — must be set at session build):
        # the default 100 entries thrashes under the crawler's round loop
        # (~30 generated fragments/round, identical source round-over-round
        # — e.g. the J7 gram pipeline carries no per-round literals), so
        # every round recompiled ~0.8 s of driver-serial Janino. 4096
        # entries lets steady-state rounds hit the cache instead.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # Batch-engine broadcast timeout: a BroadcastExchange starts its
        # 300 s default clock at plan-execute time, but in a saturated
        # batch cluster (or a 2-core sandbox leg running multi-minute
        # extract tasks) the tiny broadcast job can QUEUE behind running
        # tasks longer than that — a scheduling artifact, not a hang.
        # One hour is the standard batch setting; streaming/serving
        # deployments that want fail-fast can override per session.
        .config("spark.sql.broadcastTimeout", "3600")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
