"""A PySpark-native analytics engine with the query surface of
VenturaDelMonte/nexmark-vanilla-flink, rebuilt Spark-first.

The reference (see SURVEY.md) is a Nexmark streaming benchmark on vanilla
Flink 1.8: Person/Auction/Bid event streams, hand-built DataStream DAGs for
windowed aggregation (Q5/CM), stream-stream joins (Q8/Q11), interval-join
winning bids (QX), and session windows. This package re-expresses every
operator declaratively on the DataFrame/SQL API so Catalyst + Tungsten pick
the physical plan, plus Structured Streaming twins, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference never had.

Layout:
  session.py    SparkSession construction + runtime conf normalization
  sources/      parquet loaders, derived Nexmark stream views, synthetic
                skewed generators, streaming sources
  plans/        the query registry: every query = Spark impl + DuckDB oracle
  operators/    reusable operator building blocks (windows, joins, dedup,
                similarity, text)
  functions/    small column-expression helpers (time buckets, hashing,
                vector math)
  streaming/    Structured Streaming runners, sinks, stateful replicas
"""

__version__ = "0.1.0"
