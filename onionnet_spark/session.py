"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config
block is what we would ship to a 1000-executor cluster (AQE on,
skew-join handling on, Arrow on for the few pandas interchanges).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    try:
        phys_gb = (
            os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        ) // (1 << 30)
    except (ValueError, OSError, AttributeError):
        return "8g"
    return f"{max(4, min(32, phys_gb // 4))}g"


def get_spark(
    app_name: str = "onionnet-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # mapInPandas/Arrow UDF workers are separate Python processes that
    # do NOT inherit the driver's sys.path — only PYTHONPATH. Without
    # this, any UDF importing onionnet_spark (the multimodal codecs)
    # fails unless the driver happens to run from the repo root. On a
    # real cluster the equivalent is shipping the package via
    # --py-files / a wheel; for local[] the env var is the mechanism.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("ONIONNET_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Adaptive execution: runtime coalescing of shuffle partitions,
        # skew-join splitting, dynamic join strategy switch.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas interchange (mapInPandas multimodal path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in the test parquet are TIMESTAMP_MICROS; keep
        # session TZ fixed so window bucketing is deterministic.
        .config("spark.sql.session.timeZone", "UTC")
        # The events table stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type, so read as long and convert in the loader
        # (sources/tpch_graph.py) via integer division to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local[] mode: the driver IS the executor; with the whole
        # bench's caches (graph + canonical/symmetrized views + table
        # readers) in one JVM, 8g left so little headroom that GC
        # inflated every query ~40% on the 128 GiB test box. Derived
        # from physical RAM (a quarter, clamped to [4g, 32g]) so a
        # 16 GiB laptop isn't handed a 32g heap it cannot start.
        .config("spark.driver.memory", os.environ.get("ONIONNET_DRIVER_MEM", _default_driver_mem()))
        # ContextCleaner frees out-of-scope localCheckpoint / shuffle /
        # broadcast blocks only after a DRIVER JVM GC; the default
        # periodic-GC interval is 30min, so a long session (the bench
        # runs ~40 queries, many with per-level checkpoint blocks)
        # accumulates dead blocks that crowd the block manager and
        # slow later iterative queries. The interval is a tradeoff
        # measured both ways: 30min lets dead blocks crowd live
        # caches in long sessions (the r3 triangle_count eviction),
        # while 2min lands a JVM-wide System.gc() INSIDE iterative
        # queries often enough to double their in-bench latency
        # (r5: graph_kcore 9.5-16.5s erratic at 2min vs 4.8s steady
        # at 30min, same plan). 10min fires between query groups,
        # not inside them, and still bounds the ledger.
        .config("spark.cleaner.periodicGC.interval", "10min")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
