"""Ship the engine package to executor Python workers.

An external driver imports ``__spark_entry__`` with a ``sys.path``
insert, which fixes imports only in the *driver* process. Any operator
that runs Python on executors (pandas UDFs, ``mapInPandas``,
``applyInPandas(WithState)``) unpickles functions whose globals
reference :mod:`ex_hivent_spark` — on a worker without the package on
``PYTHONPATH`` that raises ``ModuleNotFoundError``.

The fix is the standard Spark mechanism: zip the package and
``sparkContext.addPyFile`` it once per context — workers prepend the
zip to their ``sys.path``. On a real cluster the same call distributes
the package to every executor; locally it is a no-op-cost symlink into
the context's file server.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently add a zip of this package to the Spark context."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"ex_hivent_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, parent))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
