"""The query registry — the single source of truth the driver contract
(`__spark_entry__.py`), the tests, and `bench.py` all read.

Every implemented operator from SURVEY.md §2 (plus the pipeline extensions)
registers here with:
  * a Spark implementation `(spark, sf_dir) -> DataFrame` (DataFrame API,
    Catalyst-optimizable), and
  * optionally a DuckDB oracle SQL string producing identical rows on the
    same parquet tables (driver registers them as views). Queries whose
    semantics aren't SQL-expressible (custom stateful streaming) omit the
    oracle and get a rows-only check.

Output discipline for hash-stable cross-engine comparison:
  * no raw TIMESTAMP outputs — time buckets are epoch-second BIGINTs derived
    with pure integer arithmetic on the epoch-nanos columns;
  * no order-sensitive float aggregates — SUM/AVG go through DECIMAL(38,4)
    (exact, associative) and are cast to DOUBLE at the end; bare MIN/MAX on
    stored doubles are fine (no arithmetic);
  * every computed column is aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}
