"""Ship the rse_spark package to executors (the --py-files pattern).

Python workers import ``rse_spark`` when unpickling UDFs. When the
driver process happens to run from the repo root, the module resolves
via cwd; from anywhere else it does not. ``ensure_shipped`` zips the
package and registers it with ``sparkContext.addPyFile`` — exactly
what ``spark-submit --py-files rse_spark.zip`` does on a cluster —
making every UDF work regardless of the driver's cwd or PYTHONPATH.
Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    import rse_spark

    pkg_dir = os.path.dirname(os.path.abspath(rse_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"rse_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        arc = os.path.join(
                            "rse_spark", os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, arc)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
