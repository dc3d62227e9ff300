"""SparkSession construction with the engine's standard configuration.

The reference runs one Solr JVM with hand-tuned batch sizes
(solrconfig.xml autoCommit, AthenaExportMt.java:363 batch=500k). Our
equivalents are Spark/AQE knobs set here once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nexlt-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("NEXLT_SHUFFLE_PARTITIONS", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of small shuffle partitions + skew-join
        # splitting; our explicit hot-term salting handles groupBy skew
        # (SURVEY.md P6), AQE handles the rest.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere — all our UDFs are pandas_udf/applyInPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # JVM↔Python socket buffers (both sides read spark.buffer.size:
        # PythonRunner's BufferedOutputStream and the worker's
        # sock.makefile via SPARK_BUFFER_SIZE). The 64 KiB default costs
        # one write+read syscall pair per 64 KiB of Arrow traffic; at
        # 1 MiB the same traffic crosses in 16× fewer syscalls — the
        # r4 scaling forensics isolated host scheduler/IPC latency on
        # exactly this syscall-heavy socket path as the binding resource
        # (BENCH.md §4), so the pipeline now does fewer, larger hops.
        .config(
            "spark.buffer.size",
            os.environ.get("NEXLT_BUFFER_SIZE", str(1024 * 1024)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Deterministic timestamp behavior for parquet round-trips.
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.driver.memory", os.environ.get("NEXLT_DRIVER_MEM", "8g"))
    )
    # Shuffle/spill local dirs: tmpfs when available. On a real cluster
    # this is the NVMe scratch volume; on this single box the OS disk
    # (~600 MB/s) serializes every shuffle-heavy stage — measured: the
    # 85M-row postings encode shuffle plateaus at ~25 s regardless of
    # core count until local dirs move off-disk.
    # Memory trade-off: tmpfs spill consumes RAM — a shuffle larger than
    # free /dev/shm can OOM the box instead of spilling to disk, so the
    # default only engages when the tmpfs has ample free capacity.
    # NEXLT_LOCAL_DIR always wins; set it to "" to force Spark's default.
    if "NEXLT_LOCAL_DIR" in os.environ:
        local_dir = os.environ["NEXLT_LOCAL_DIR"] or None
    else:
        local_dir = None
        if os.path.isdir("/dev/shm"):
            try:
                st = os.statvfs("/dev/shm")
                if st.f_bavail * st.f_frsize >= 16 << 30:  # ≥16 GiB free
                    local_dir = "/dev/shm/nexlt-spark-local"
            except OSError:
                pass
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from nexlt_spark.deploy import ensure_shipped

    ensure_shipped(spark)  # spark-submit --py-files equivalence
    return spark
