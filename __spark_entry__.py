"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the package's query registry
(nexmark_vanilla_flink_spark/plans/registry.py): each implemented operator
from SURVEY.md §2 (plus the pipeline extensions) registers a Spark
implementation and, where SQL-expressible, a DuckDB oracle producing
identical rows.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nexmark_vanilla_flink_spark.plans import all_oracles, all_queries  # noqa: E402
from nexmark_vanilla_flink_spark.plans.nexmark import q5_hot_items  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q5_hot_items(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each oracle-checkable query in ``queries()``."""
    return all_oracles()
