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
        # sock.makefile via SPARK_BUFFER_SIZE). Tunable because a real
        # network shuffle may want larger buffers; the DEFAULT stays at
        # Spark's 64 KiB because the r5 measurement campaign
        # (tools/ipc_probe.py, BENCH.md §4 r5 subsection) REFUTED the
        # r4 syscall hypothesis on this box: the whole 4.5M-turn build
        # issues only ~0.15-0.17 read/write syscalls and ~0.02 voluntary
        # context switches per turn, invariant to a 16× buffer raise,
        # and the 16×-buffer + 6.5×-Arrow-batch combination measured a
        # 22% LOWER 8-core median over 5 interleaved pairs.
        .config(
            "spark.buffer.size",
            os.environ.get("NEXLT_BUFFER_SIZE", "65536"),
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
