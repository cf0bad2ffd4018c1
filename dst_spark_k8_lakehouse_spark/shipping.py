"""Ship this package to Python workers.

Closures sent to executors (pandas UDFs, ``mapInPandas``) may reference
module-level helpers; cloudpickle serializes those *by reference*, so the
worker must be able to ``import dst_spark_k8_lakehouse_spark`` — true on
a driver launched from the repo, false for an arbitrary-cwd driver or a
real cluster unless the package is distributed. ``spark-submit
--py-files`` is the deploy-time answer (reference submits jobs exactly
that way, ``k8s/spark-apps/pyspark-example.yaml:12``); this helper is
the runtime equivalent: zip the package once per session and
``addPyFile`` it, making every query self-contained.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently distribute this package to executor Python workers."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = os.path.join(
        tempfile.gettempdir(), f"dst_spark_k8_lakehouse_spark-{app_id}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, f"{pkg_dir.name}/{py.relative_to(pkg_dir)}")
    spark.sparkContext.addPyFile(zip_path)
    # The driver-side Python-DataSource STREAMING runner is special:
    # the JVM hands it `<spark files root>/streaming_job` as its files
    # dir and sends ZERO python includes (probed empirically — batch
    # planner workers get the includes, the streaming runner does
    # not), so addPyFile never reaches it and a stream read from an
    # arbitrary cwd dies with ModuleNotFoundError. The runner always
    # executes on the DRIVER host, so a driver-local copy of the
    # package into that exact directory (which the runner add_path()s)
    # makes it importable — correct in local mode and on a cluster.
    import shutil

    from pyspark import SparkFiles

    stream_dir = os.path.join(
        SparkFiles.getRootDirectory(), "streaming_job", pkg_dir.name
    )
    if not os.path.isdir(stream_dir):
        shutil.copytree(
            pkg_dir, stream_dir,
            ignore=shutil.ignore_patterns("__pycache__"),
        )
    _SHIPPED.add(app_id)
