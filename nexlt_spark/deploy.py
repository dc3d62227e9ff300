"""Packaging for spark-submit --py-files (BASELINE.json north_rule).

``build_pyfiles_zip()`` produces the zip a production job ships with
``spark-submit --py-files nexlt_spark.zip job.py``. ``get_spark`` also
calls ``ensure_shipped`` so interactive/driver-local use works on any
cluster without a pre-set executor PYTHONPATH.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(out_path: str | None = None) -> str:
    if out_path is None:
        out_path = os.path.join(os.path.dirname(_PKG_DIR), "dist", "nexlt_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join("nexlt_spark", os.path.relpath(full, _PKG_DIR))
                z.write(full, rel)
    return out_path


def ensure_shipped(spark) -> None:
    """Make the package importable on executors (idempotent)."""
    sc = spark.sparkContext
    if getattr(sc, "_nexlt_shipped", False):
        return
    import tempfile

    zip_path = build_pyfiles_zip(
        os.path.join(tempfile.mkdtemp(prefix="nexlt_pyfiles_"), "nexlt_spark.zip")
    )
    sc.addPyFile(zip_path)
    sc._nexlt_shipped = True


if __name__ == "__main__":
    # python -m nexlt_spark.deploy → build dist/nexlt_spark.zip for
    # spark-submit --py-files (tools/submit_job.py docstring)
    print(build_pyfiles_zip())
