"""Disk-throughput probe — third forensic axis for BENCH.md §4.

The build pipeline reads the parquet fileset and flushes the bucketed
store to local disk; neither the forked-CPU kernel probe nor the DRAM
triad probe touches storage. If the shared host's disk throughput
degrades, the 8-core build hits an I/O ceiling the 2-core build never
reaches — exactly the "both probes clean, pipeline still slow" signature.

Measures, on the target directory's filesystem:
  - buffered sequential WRITE + fsync (the store-flush shape),
  - sequential READ after dropping the page cache when permitted
    (root: /proc/sys/vm/drop_caches), else a cache-warm read labeled so.

Usage: python tools/disk_probe.py [--dir /tmp] [--mb 1024]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

CHUNK = 8 * 1024 * 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp")
    ap.add_argument("--mb", type=int, default=1024)
    args = ap.parse_args()

    buf = os.urandom(CHUNK)
    n_chunks = (args.mb * 1024 * 1024) // CHUNK
    fd, path = tempfile.mkstemp(dir=args.dir, prefix="diskprobe_")
    try:
        t0 = time.perf_counter()
        with os.fdopen(fd, "wb") as f:
            for _ in range(n_chunks):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
        w_dt = time.perf_counter() - t0

        dropped = False
        try:
            with open("/proc/sys/vm/drop_caches", "w") as dc:
                dc.write("3\n")
            dropped = True
        except OSError:
            pass
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            while f.read(CHUNK):
                pass
        r_dt = time.perf_counter() - t0
    finally:
        os.unlink(path)

    mb = n_chunks * CHUNK / 1e6
    print(
        json.dumps(
            {
                "metric": "disk_probe",
                "dir": args.dir,
                "write_mbps": round(mb / w_dt, 1),
                "read_mbps": round(mb / r_dt, 1),
                "read_cache_dropped": dropped,
            }
        )
    )


if __name__ == "__main__":
    main()
