"""SparkSession factory + self-shipping of the package to executors.

The engine is driven by ``spark-submit --py-files engine.zip`` on a real
cluster (BASELINE.json north_rule). ``build_pyfiles_zip()`` produces that
zip; ``get_session()`` additionally ships it via ``addPyFile`` so ad-hoc
drivers (pytest, bench.py, notebooks) work without the flag — executors
unpickle pandas-UDF closures by importing this package, so it must be on
every worker's path either way.

Config mirrors the reference's job bootstrap (AQE + coalescePartitions,
/root/reference/scripts/bronze_digit.py:14-20) plus the Arrow/image-payload
tuning from SURVEY.md §4.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the package for --py-files / addPyFile distribution.

    When the package already IMPORTS from a zip (a spark-submit
    --py-files driver), that zip is the distributable — return it
    instead of walking a zip-interior path (which yields nothing and
    would truncate the very zip spark-submit distributed)."""
    if not os.path.isdir(_PKG_DIR):
        container = _PKG_DIR
        while container and not os.path.isfile(container):
            container = os.path.dirname(container)
        if container and zipfile.is_zipfile(container):
            return container
        raise RuntimeError(f"package dir {_PKG_DIR!r} is not walkable")
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), f"{_PKG_NAME}.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(_PKG_DIR):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return dest


def get_session(
    master: str = "local[*]",
    app_name: str = "aws_medallion_datalake_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    ship_package: bool = True,
) -> SparkSession:
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image payloads are KB–MB each: bound Arrow batch size (SURVEY §4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # maintenance shuffles route wide binary rows into up-to-4096
        # output partitions; the bypass writer opens one file PER REDUCE
        # PARTITION per map task (a handle storm that also diverges from
        # the >200-partition production path, which always uses the
        # serialized sorter). Route everything wider than 64 through the
        # serialized sort writer: one spill file per map task.
        .config("spark.shuffle.sort.bypassMergeThreshold", "64")
        # the format("medallion") connector implements pushFilters; Spark
        # refuses such readers unless pushdown is explicitly enabled
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local-mode driver == all executors; the 1g default heap OOMs on
        # binary image shuffles (irrelevant on a real cluster where
        # spark-submit sizes executors explicitly)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # startup-time self-ship: addPyFile (below) reaches executor Python
    # workers, but the DRIVER-SIDE Python runners Spark forks for the
    # Python Data Source API (the streaming source runner in particular)
    # build their PYTHONPATH from the JVM's inherited env, not from
    # late addPyFile includes — without this, readStream.format(
    # "medallion") dies with ModuleNotFoundError when the driver script
    # lives outside the repo. `spark-submit --py-files` does exactly
    # this for real drivers; we mirror it for ad-hoc ones. Must happen
    # BEFORE the JVM launches (a reused session keeps its env).
    if ship_package and os.path.isdir(_PKG_DIR):
        z = build_pyfiles_zip()
        b = b.config("spark.submit.pyFiles", z)
        pp = os.environ.get("PYTHONPATH", "")
        if z not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = z + (os.pathsep + pp if pp else "")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Under `spark-submit --py-files engine.zip` the package already
    # imports FROM a shipped zip: re-adding a freshly built (hence
    # byte-different) zip of the same name makes addFile fail with
    # "exists and does not match contents". The files are already on
    # every worker's path in that mode — skip the self-ship.
    if ship_package and os.path.isdir(_PKG_DIR):
        spark.sparkContext.addPyFile(build_pyfiles_zip())
    return spark
