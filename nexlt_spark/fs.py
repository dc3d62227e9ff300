"""Scheme-aware small-file I/O for store sidecars and metadata.

Store payloads (postings blocks, stats tables, IVF cells) are written
with ``DataFrame.write.parquet`` and therefore work on any Hadoop
filesystem (``hdfs://``, ``s3a://``, …). Sidecar metadata — the one-row
stats table, the IVF centroid JSON — is a driver-side write the size of
an Iceberg manifest, where scheduling a Spark job per file is waste.
These helpers keep the ``open()``/pyarrow fast path for local paths and
route URI-scheme paths through the JVM's ``org.apache.hadoop.fs
.FileSystem`` (already on the classpath — it is what the parquet writes
use), so ``save_blocked("s3a://bucket/store")`` produces a complete
store instead of dying after the postings flush.

The *incremental manifest* layer (index/incremental.py,
index/checkpoint.py) intentionally stays plain-``open()``: it is the
documented parquet-plus-manifest stand-in for Iceberg commits
(README "Iceberg mapping"), and on a real deployment those commits go
through the Iceberg catalog API, not filesystem writes.
"""

from __future__ import annotations

from typing import Optional


def local_path(path: str) -> Optional[str]:
    """The local-filesystem form of ``path`` when it has no scheme (or
    the ``file:`` scheme), else None — callers branch to the driver-local
    fast path vs the Hadoop FileSystem route."""
    if path.startswith("file:"):
        # file:///x, file:/x and file://localhost/x all name local /x
        from urllib.parse import urlparse

        p = urlparse(path)
        if p.netloc not in ("", "localhost"):
            return None
        return p.path or "/"
    if "://" not in path:
        return path
    return None


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def write_bytes(spark, path: str, data: bytes) -> None:
    """Write ``data`` to ``path`` on whatever filesystem its scheme
    names. Local paths go through ``open()``; remote ones through the
    JVM Hadoop FileSystem (no Spark job — this is a driver-side metadata
    write, the Iceberg-manifest analog)."""
    lp = local_path(path)
    if lp is not None:
        with open(lp, "wb") as fh:
            fh.write(data)
        return
    fs, jpath, _ = _hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_bytes(spark, path: str) -> bytes:
    lp = local_path(path)
    if lp is not None:
        with open(lp, "rb") as fh:
            return fh.read()
    fs, jpath, jvm = _hadoop_fs(spark, path)
    stream = fs.open(jpath)
    try:
        # py4j passes byte[] by value, so readFully(buf) can't fill a
        # Python buffer — copy through a JVM-side stream instead.
        bos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 65536, False)
        return bytes(bos.toByteArray())
    finally:
        stream.close()
