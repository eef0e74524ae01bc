"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry
(ag_data_ingestion_github_to_snowflake_spark/plans/) for the
DuckDB-oracle differential check.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ag_data_ingestion_github_to_snowflake_spark.plans.registry import all_specs

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship the engine package to executor Python workers via addPyFile.

    The driver's ``sys.path`` does not propagate to executor Python
    workers, so any mapInPandas/pandas-UDF kernel that closes over
    engine modules fails with ModuleNotFoundError when the driver
    process runs outside the repo root. Zipping the package and
    ``addPyFile``-ing it is the same mechanism a real cluster submit
    uses (``--py-files``), so local behaviour matches the 1000-executor
    deployment path.
    """
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    pkg = Path(__file__).resolve().parent / "ag_data_ingestion_github_to_snowflake_spark"
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="agdi_pkg_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, arcname=str(p.relative_to(pkg.parent)))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine settings the fixtures require (ns-parquet, UTC)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    _ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    specs = all_specs()
    return specs["top_revenue_nations"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in all_specs().items():
        def make(s):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _configure(spark)
                return s.build(spark, sf_dir)

            return run

        out[name] = make(spec)
    return out


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracle twins for every oracle-checkable query."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
