"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship frontier-generation query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (crawl engine) plus the training-data-pipeline operators
(dedup / similarity / text / multimodal) with DuckDB oracles.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from crawler_spark.plans.oracle_queries import q_frontier_generation

    return q_frontier_generation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline ops).

    Both registries are load-bearing — an import failure must surface here,
    not silently shrink the query surface.
    """
    from crawler_spark.plans.analytics_queries import ANALYTICS_QUERIES
    from crawler_spark.plans.oracle_queries import CRAWL_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for reg in (CRAWL_QUERIES, ANALYTICS_QUERIES):
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each queries() key (omitted ⇒ rows-only)."""
    from crawler_spark.plans.analytics_queries import ANALYTICS_QUERIES
    from crawler_spark.plans.oracle_queries import CRAWL_QUERIES

    out: dict[str, str] = {}
    for reg in (CRAWL_QUERIES, ANALYTICS_QUERIES):
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return out
