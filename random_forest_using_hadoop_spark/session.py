"""SparkSession factory with the engine's scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default all cores), but
every conf below is chosen to also be the right default on a large
cluster reading ~100 TB:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting) so
  static ``shuffle.partitions`` only needs to be an upper bound;
- Arrow transfer on for any Pandas-UDF path;
- ``nanosAsLong`` for the events table (Spark 4 hard-errors on
  TIMESTAMP(NANOS) parquet otherwise — SURVEY.md §1.2);
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rf_engine", extra_conf: dict | None = None) -> SparkSession:
    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # keep saveAsTable metadata out of the repo working tree
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="spark_wh_"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_caches(spark: SparkSession) -> None:
    """Session-scoped cache hygiene: drop every storage block the engine
    has deliberately left cached past a query function's return.

    A few operators cache frames their returned (lazy) plan reads twice
    (simhash fingerprints, CC edge lists, the ML train/predict split) —
    documented as LRU-bounded, but a long grading or test session is
    cleaner releasing them at module boundaries than relying on
    eviction. Safe whenever no previously-returned plan will be
    re-collected afterwards (unpersisted localCheckpoints are
    non-recomputable; everything else just recomputes).
    """
    from random_forest_using_hadoop_spark.ml import forest
    from random_forest_using_hadoop_spark.operators import dedup_lsh

    forest._CACHE.clear()
    dedup_lsh._PAIR_MEMO.clear()
    dedup_lsh._PAIR_PINS.clear()
    # _CC_MEMO holds localCheckpoint-backed label frames — once the
    # RDD sweep below unpersists their blocks they are NON-recomputable,
    # so the memo must never outlive this call
    dedup_lsh._CC_MEMO.clear()
    dedup_lsh._CC_PINS.clear()
    # transient vocab-rank pins from unmemoized _bitmap_encode calls —
    # their storage falls to the sweeps below; drop the references too
    dedup_lsh._TRANSIENT_PINS.clear()
    # all DataFrame/table-level caches (simhash `sh`, CC `edges`, ...)
    spark.catalog.clearCache()
    # RDD-level blocks clearCache can't see: localCheckpoints from the
    # iterative loops. py4j map iteration; guarded — hygiene must never
    # turn into a failure.
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:
        pass


def cached_block_count(spark: SparkSession) -> int:
    """Number of persistent RDDs the session currently tracks (cached
    DataFrames appear here once materialized) — the observability hook
    for the no-cache-growth regression test."""
    try:
        return int(spark.sparkContext._jsc.getPersistentRDDs().size())
    except Exception:
        return -1
