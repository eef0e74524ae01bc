"""SparkSession factory tuned for the engine.

The reference (``/root/reference/src/extract_github_data.py``) is a
single-threaded, single-process pipeline; this engine replaces it with a
Spark-native design. All scale-sensitive knobs live here so every entry
point (driver contract, tests, bench) gets the same tuned session.

Scale notes (100 TB design):
- AQE on: runtime join-strategy switching, skew-join splitting, and
  post-shuffle partition coalescing are the main levers that make the
  same logical plans survive a 1000-executor cluster.
- ``spark.sql.shuffle.partitions`` is a *default*; AQE coalesces down.
  On a real cluster set it to ~2-3x total cores; locally 32 matches
  the local[32] harness.
- Arrow enabled for every pandas-UDF boundary (the slow-path escape
  hatch used by dedup/similarity/multimodal operators).
- UTC session timezone: fixtures carry timestamp columns and the DuckDB
  oracle runs in UTC; anything else breaks value-hash parity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "ag-data-ingestion-spark", master: str | None = None) -> SparkSession:
    """Build (or get) a SparkSession with the engine's tuned defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        # AQE: coalesce small shuffle partitions, convert to broadcast
        # joins at runtime, split skewed partitions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r14 (guide §2.4/§5): let AQE re-optimize the partitioning of
        # CACHED plans too. Spark defaults this off for plan-stability
        # compatibility, which pins every persist() materialization at
        # the static shuffle width — the 19 registry queries that
        # persist a small intermediate then paid full-width task launch
        # on every cached read. Interleaved A/B (min over 3-5 reps,
        # sf0.1): dau_mau_stickiness 1.23->0.42 s, burrows_delta
        # 1.98->0.99, bpe_train_merges 2.73->1.98, jaccard_link
        # 1.99->1.32, clustering_coefficient 1.52->1.02, entropy_rate
        # 1.09->0.73, js_divergence 0.84->0.54, +6 more 1.2-1.5x; the
        # suspected regressions (semdedup, cluster_topic, ivf_recall)
        # dissolved at 5 reps (<=3%, inside the box's noise band).
        # Scale-sound: AQE coalescing targets the advisory partition
        # size, so production-sized caches keep their parallelism —
        # only fixture-scale caches collapse.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # Arrow for pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # Fixtures store TIMESTAMP(ns), which the Spark parquet reader
        # rejects; read nanos as LongType and let the catalog convert to
        # microsecond timestamps (matches DuckDB's ns->us cast).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Deterministic float formatting helps oracle parity.
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # Single-JVM local mode: driver heap IS executor heap. 8g was
        # measured GC-thrashing the 100x streaming drains (the complete-
        # mode memory sink holds millions of rows; same run varied
        # 65 s <-> 344 s); 16g removes the thrash with 8x headroom on
        # the 128 GiB dev box. Real clusters size executors per SF.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    return builder.getOrCreate()
