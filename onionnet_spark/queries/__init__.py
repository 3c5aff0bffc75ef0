"""Query registry: every SURVEY §2 operator exposed as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible)
a DuckDB oracle SQL string.

Modules register into REGISTRY: name -> (callable, oracle_sql | None).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, tuple[QueryFn, str | None]]:
    from onionnet_spark.queries import (  # noqa: F401
        graph_queries,
        pipeline_queries,
        relational,
        streaming_queries,
    )

    return REGISTRY
