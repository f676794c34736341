"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator as ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` gives each one's DuckDB twin (omitted for non-SQL
operators → rows-only check). The real registry lives in
``quty_server_spark.plans.registry``; importing
``quty_server_spark.operators`` populates it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import quty_server_spark.operators  # noqa: F401,E402  (registers all queries)
from quty_server_spark.plans.registry import registry  # noqa: E402
from quty_server_spark.session import configure  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return registry.queries["flagship_delivery_report"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.queries)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(registry.oracles)
