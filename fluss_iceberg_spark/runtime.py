"""Runtime shipping: make the engine package importable on Spark workers.

Pandas-UDF / mapInPandas kernels are pickled by reference to this package,
so every Python worker must be able to import ``fluss_iceberg_spark`` —
regardless of the driver process's cwd/sys.path. The cluster-correct
mechanism is ``SparkContext.addPyFile`` with a zip of the package (exactly
how code ships to a 1000-executor cluster); it also covers local mode when
the host application (e.g. the verification driver) runs from elsewhere.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_fluss_iceberg_spark_shipped"


def package_zip() -> str:
    """Zip this package (idempotent, content-addressed by mtime)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    latest = max(
        (
            os.path.getmtime(os.path.join(r, f))
            for r, _, fs in os.walk(pkg_dir)
            for f in fs
            if f.endswith(".py")
        ),
        default=0,
    )
    out = f"/tmp/fluss_iceberg_spark_{int(latest)}.zip"
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, parent))
        os.replace(tmp, out)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    """Add the package zip to the session's Python path once per context."""
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _FLAG, True)
