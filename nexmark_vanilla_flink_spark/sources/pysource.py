"""`nexmark` as a registered Spark data source (Python DataSource API,
Spark 4): ``spark.read.format("nexmark")`` and
``spark.readStream.format("nexmark")``.

The reference packages its generators as first-class *source operators*
(source/NexmarkPersonSource.java:11-57, NexmarkAuctionSource.java:34-72,
NexmarkBidSource.java:34-70) with rate limiting and, for files, replayable
mmap readers. This module is the connector-surface twin: the same
interleaved 1:4:4 event stream exposed through Spark's pluggable source
API — bounded reads with explicit input partitions, and an exactly-once
streaming reader that tracks offsets (initialOffset / read(start) /
commit), the replay contract the reference's bounded mmap sources rely on.

Two deliberate design points:

* **This is the connector capability pin, not the throughput path.** Rows
  here are produced by Python workers (that is how the Python DataSource
  API executes); the high-rate generator used by benchmarks stays
  `generator.py::generate_events_batch` — pure Catalyst column expressions
  over ``spark.range`` that never leave the JVM. Same schema, same
  1:4:4/hot-key structure, different hash function (Python's crc32 vs
  Spark's murmur3), so the two are structurally — not row-for-row —
  equivalent.
* **Determinism**: every row is a pure function of (id, seed), so any
  partition split or replay of an offset range yields identical rows —
  asserted in tests/test_pysource.py.

Options: ``events`` (bounded row count, batch), ``partitions``,
``seed``, ``eventsPerSec`` (event-time rate), ``rowsPerBatch``
(streaming micro-batch size).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .generator import (
    AUCTIONS_PER_EPOCH,
    EPOCH,
    HOT_PROB_PCT,
    HOT_RATIO,
    MAX_PRICE,
    PERSONS_PER_EPOCH,
)

NS_PER_SEC = 1_000_000_000

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", IntegerType()),
        StructField("ts_ns", LongType()),
        StructField("person_id", LongType()),
        StructField("ref_person_id", LongType()),
        StructField("ref_auction_id", LongType()),
        StructField("price", DoubleType()),
    ]
)


def _h(event_id: int, seed: int) -> int:
    """Deterministic 32-bit mix of (id, seed) — the Python stand-in for the
    JVM generator's murmur3 `F.hash(id, seed)`."""
    return zlib.crc32(f"{event_id}:{seed}".encode())


def _row(event_id: int, seed: int, events_per_sec: int) -> tuple:
    """One interleaved event row; mirrors generator.py::_event_columns
    (slot mapping NexmarkEvent.getEventType(): 0 auction, 1 bid, 2 person;
    hot keys NexmarkBidSource.java:47-63)."""
    slot = event_id % EPOCH
    epoch = event_id // EPOCH
    ts_ns = event_id * NS_PER_SEC // events_per_sec
    is_hot = _h(event_id, seed) % 100 > HOT_PROB_PCT
    person_key = (
        (epoch // HOT_RATIO) * HOT_RATIO
        if is_hot
        else _h(event_id, seed + 1) % (epoch + 1)
    )
    auction_key = (
        (epoch * AUCTIONS_PER_EPOCH // HOT_RATIO) * HOT_RATIO
        if is_hot
        else _h(event_id, seed + 2) % ((epoch + 1) * AUCTIONS_PER_EPOCH)
    )
    price = _h(event_id, seed + 3) % 10_000_000 / 10_000_000 * MAX_PRICE
    if slot < PERSONS_PER_EPOCH:
        etype = 2
    elif slot < PERSONS_PER_EPOCH + AUCTIONS_PER_EPOCH:
        etype = 0
    else:
        etype = 1
    return (event_id, etype, ts_ns, epoch, person_key, auction_key, price)


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class NexmarkBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("events", 10_000))
        self.n_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.events_per_sec = int(options.get("eventsPerSec", 10_000))

    def partitions(self):
        # contiguous id strides — the same per-subtask striding the
        # reference sources use (NexmarkPersonSource.java:40-47)
        step = max(1, -(-self.n_events // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n_events))
            for lo in range(0, self.n_events, step)
        ]

    def read(self, partition: _RangePartition):
        for event_id in range(partition.start, partition.end):
            yield _row(event_id, self.seed, self.events_per_sec)


class NexmarkStreamReader(DataSourceStreamReader):
    """Exactly-once replayable stream: offsets are plain event ids, so any
    committed range replays bit-identically after failure — the property
    the reference gets from bounded mmap files + Kafka offsets."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.events_per_sec = int(options.get("eventsPerSec", 10_000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        self._latest = 0

    def initialOffset(self):
        return {"id": 0}

    def latestOffset(self):
        self._latest += self.rows_per_batch
        return {"id": self._latest}

    def partitions(self, start, end):
        lo, hi = start["id"], end["id"]
        step = max(1, -(-(hi - lo) // self.n_partitions))
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for event_id in range(partition.start, partition.end):
            yield _row(event_id, self.seed, self.events_per_sec)

    def commit(self, end):
        pass


class NexmarkDataSource(DataSource):
    """``spark.dataSource.register(NexmarkDataSource)`` →
    ``spark.read.format("nexmark").option("events", N).load()``."""

    @classmethod
    def name(cls):
        return "nexmark"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return NexmarkBatchReader(self.options)

    def streamReader(self, schema):
        return NexmarkStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(NexmarkDataSource)
