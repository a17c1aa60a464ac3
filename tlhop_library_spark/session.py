"""SparkSession construction with scale-oriented defaults.

Defaults chosen for the 100 TB design point, scaled down by
``shuffle_partitions`` for local testing:

- AQE on (runtime coalescing + skew-join splitting).
- Arrow execution on (all our Python kernels are Arrow-batched).
- Bounded Arrow batch size so giant posting groups stream in chunks.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tlhop_library_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # scan-parallelism floor: small local inputs (one parquet file)
        # must still fan out across cores — the reference sets the same
        # knob (shodan_dataset_manager.py:60-61, 6×parallelism)
        .config("spark.sql.files.minPartitionNum", str(3 * shuffle_partitions))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # 16g sweet spot: ≥48g heaps trigger a severe GC/paging pathology
        # in this sandbox's JVM at 32 threads (measured 4× slowdown)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle scratch on tmpfs when available — the sandbox's /tmp sits
    # on a slow virtio disk that serializes the shuffle at high
    # parallelism (on a real cluster this is per-executor local SSD)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark_local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
