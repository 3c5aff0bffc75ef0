"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     -> flagship multilayer k-hop ego query on sf0.001.
queries()        -> every implemented operator from SURVEY.md §2.
oracle_sql()     -> DuckDB-equivalent SQL per query (where
                    SQL-expressible; approximate/streaming-native ops
                    are rows-only by design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> None:
    """Session confs our queries rely on, applied defensively (the
    driver owns the session): nanos-parquet reads + UTC windows."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multilayer ego search (reference searcher.search) —
    2-hop upstream expansion from region 0 on the sf0.001 graph."""
    _prepare(spark)
    from onionnet_spark.queries.graph_queries import khop_upstream

    return khop_upstream(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _make = lambda fn: (lambda spark, sf_dir: (_prepare(spark), fn(spark, sf_dir))[1])
    from onionnet_spark.queries import load_all

    return {name: _make(fn) for name, (fn, _) in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from onionnet_spark.queries import load_all

    return {name: sql for name, (_, sql) in load_all().items() if sql is not None}
