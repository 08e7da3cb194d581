"""Synthetic Nexmark event generators — the Spark-first re-expression of the
reference's source functions:

  NexmarkPersonSource   (source/NexmarkPersonSource.java:11-57)  — rate-limited
      synthetic persons, per-subtask id stride
  NexmarkAuctionSource  (source/NexmarkAuctionSource.java:34-72) — 15% hot
      sellers: ``rand(100) > 85 → (personId/100)*100``, end = ts + 10 s
  NexmarkBidSource      (source/NexmarkBidSource.java:34-70)     — hot auctions
      (HOT_AUCTIONS_PROB=85, common/NexmarkCommon.java:24), price U[0, 1e7)
  GeneratorPipeline     (generator/GeneratorPipeline.java:93-180) — one
      interleaved stream, ratio 1 person : 4 auctions : 4 bids
      (common/NexmarkCommon.java:9-12)

Instead of imperative per-subtask loops, everything is a column expression
over ``spark.range`` (batch) or the ``rate-micro-batch`` source (streaming):
the generator scales to any parallelism because ``id`` already partitions
evenly, and the skew/ratio logic is pure Catalyst-optimizable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference constants (common/NexmarkCommon.java:9-27)
PERSONS_PER_EPOCH = 1  # ratio 1:4:4 per 9-event epoch
AUCTIONS_PER_EPOCH = 4
BIDS_PER_EPOCH = 4
EPOCH = PERSONS_PER_EPOCH + AUCTIONS_PER_EPOCH + BIDS_PER_EPOCH
HOT_PROB_PCT = 85  # rand(100) > 85 → hot key (15%)
HOT_RATIO = 100  # hot id = (id/100)*100
MAX_PRICE = 10_000_000.0


def _u32(id_col, seed: int, field: str, draw: str = "md5"):
    """Deterministic uniform non-negative draw for (id, seed, field). All
    generator randomness goes through this one function, in one of two
    modes:

    ``draw="md5"`` (default): the first 8 hex chars of
    ``md5('<id>:<seed>:<field>')`` as a BIGINT — identical in ANSI SQL
    (DuckDB: ``('0x' || substr(md5(...), 1, 8))::BIGINT``), which is what
    puts generated-data queries under the cross-engine oracle gate. Costs
    one md5 per draw (~6 M events/s generate-only at 32 cores).

    ``draw="fast"``: murmur3 ``F.hash(id, seed, field)`` — the throughput
    path (~65 M events/s), matching the reference's cheap per-event PRNG
    (ThreadLocalRandom). No SQL twin, so fast-mode streams are pinned by
    pytest (mix/skew/determinism), not the DuckDB oracle; the two modes
    share every downstream expression (skew, ratio, price scaling), so the
    oracle on the md5 mode gates the SHAPE logic for both."""
    if draw == "fast":
        # cast BEFORE abs: murmur3 can yield Integer.MIN_VALUE, whose
        # 32-bit abs overflows back to itself (negative) — widening to
        # long first keeps the documented non-negative contract (ADVICE r4)
        return F.abs(F.hash(id_col, F.lit(seed), F.lit(field)).cast("long"))
    s = F.concat(id_col.cast("string"), F.lit(f":{seed}:{field}"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _u32_sql(id_expr: str, seed: int, field: str) -> str:
    """The DuckDB twin of ``_u32`` (same md5 preimage, same 8-hex-char
    slice) — used by oracle SQL for generated-data registry entries."""
    return (
        f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || "
        f"':{seed}:{field}'), 1, 8)) AS BIGINT)"
    )


def _event_columns(
    df: DataFrame, events_per_sec: int, seed: int, draw: str = "md5"
) -> DataFrame:
    """Map a monotonically increasing ``id`` column to an interleaved,
    skewed Nexmark event row. Deterministic given (id, seed, draw) — and,
    in the default md5 mode, reproducible in ANSI SQL via
    ``_u32``/``_u32_sql``."""
    slot = F.col("id") % EPOCH
    epoch = F.expr(f"id DIV {EPOCH}")
    # event-time advances events_per_sec per second of stream time
    ts_ns = (F.col("id") * F.lit(1_000_000_000) / F.lit(events_per_sec)).cast(
        "long"
    )
    id_col = F.col("id")
    # hot-key selection mirrors NexmarkBidSource.java:47-63
    is_hot = (F.pmod(_u32(id_col, seed, "hot", draw), F.lit(100)) > HOT_PROB_PCT).cast(
        "boolean"
    )
    uniform_person = F.pmod(_u32(id_col, seed, "person", draw), epoch + 1)
    hot_person = F.expr(f"(id DIV {EPOCH} DIV {HOT_RATIO}) * {HOT_RATIO}")
    person_key = F.when(is_hot, hot_person).otherwise(uniform_person)
    uniform_auction = F.pmod(
        _u32(id_col, seed, "auction", draw), (epoch + 1) * AUCTIONS_PER_EPOCH
    )
    hot_auction = F.expr(
        f"(id DIV {EPOCH} * {AUCTIONS_PER_EPOCH} DIV {HOT_RATIO}) * {HOT_RATIO}"
    )
    auction_key = F.when(is_hot, hot_auction).otherwise(uniform_auction)
    price = (
        F.pmod(_u32(id_col, seed, "price", draw), F.lit(10_000_000)).cast("double")
        / F.lit(1_000_000_0)
        * F.lit(MAX_PRICE)
    )
    return df.select(
        F.col("id").alias("event_id"),
        F.when(slot < PERSONS_PER_EPOCH, F.lit(2))  # person tag
        .when(slot < PERSONS_PER_EPOCH + AUCTIONS_PER_EPOCH, F.lit(0))  # auction
        .otherwise(F.lit(1))  # bid
        .alias("event_type"),
        ts_ns.alias("ts_ns"),
        epoch.alias("person_id"),
        person_key.alias("ref_person_id"),
        auction_key.alias("ref_auction_id"),
        F.abs(price).alias("price"),
    ).withColumn("ts", F.timestamp_micros(F.expr("ts_ns DIV 1000")))


def generate_events_batch(
    spark: SparkSession,
    n_events: int,
    events_per_sec: int = 10_000,
    seed: int = 42,
    num_partitions: int | None = None,
    draw: str = "md5",
) -> DataFrame:
    """Bounded interleaved event stream as a batch DataFrame.

    Tag semantics follow NexmarkEvent.getEventType()
    (beans/NexmarkEvent.java:41-43,88-90,131-133): 0 auction, 1 bid, 2 person.
    """
    rng = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return _event_columns(rng, events_per_sec, seed, draw)


def generate_events_stream(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    seed: int = 42,
    draw: str = "md5",
) -> DataFrame:
    """Unbounded interleaved event stream on the rate source — the streaming
    twin of the reference's rate-limited sources (Guava RateLimiter,
    NexmarkPersonSource.java:34). ``rowsPerSecond`` is the backpressure
    shaping knob (vs. reference's genSpeedMin/Max)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "id")
        .drop("timestamp")
    )
    return _event_columns(rate, rows_per_second, seed, draw)


def person_attributes(
    df: DataFrame, id_col: str = "person_id", seed: int = 42, draw: str = "md5"
) -> DataFrame:
    """Attach the reference's dictionary-sampled person string attributes
    (S1 — beans/NewPersonEvent0.java:72-82): city/country/email drawn
    uniformly from dictionary tables, name = firstname + ' ' + lastname,
    and the reference's quirks kept verbatim — province drawn from the
    EMAILS table, homepage from FIRSTNAMES, creditcard/zipcode fixed
    ('00000000000' / '10587'). Sampling index = ``_u32`` md5 draw, so every
    attribute is recomputable in DuckDB oracle SQL (``person_attrs_sql``).

    ``element_at`` over an array literal: the dictionaries are tiny
    constants folded into the plan — no join, no shuffle, scales with the
    scan."""
    from . import dictionaries as D

    c = F.col(id_col)

    def pick(words, field):
        return F.element_at(
            F.array(*[F.lit(w) for w in words]),
            (F.pmod(_u32(c, seed, field, draw), F.lit(len(words))) + 1).cast("int"),
        )

    return (
        df.withColumn(
            "name",
            F.concat(
                pick(D.FIRSTNAMES, "first"), F.lit(" "), pick(D.LASTNAMES, "last")
            ),
        )
        .withColumn("email", pick(D.EMAILS, "email"))
        .withColumn("city", pick(D.CITIES, "city"))
        .withColumn("country", pick(D.COUNTRIES, "country"))
        .withColumn("province", pick(D.EMAILS, "province"))
        .withColumn("homepage", pick(D.FIRSTNAMES, "homepage"))
        .withColumn("creditcard", F.lit(D.CREDITCARD))
        .withColumn("zipcode", F.lit(D.ZIPCODE))
    )


def person_attrs_sql(id_expr: str, seed: int = 42) -> dict[str, str]:
    """DuckDB SQL expressions reproducing ``person_attributes`` draw-for-
    draw (shared md5 preimages via ``_u32_sql``); keys are column names."""
    from . import dictionaries as D

    def pick(words, field):
        arr = "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"
        return f"{arr}[({_u32_sql(id_expr, seed, field)} % {len(words)}) + 1]"

    return {
        "name": f"{pick(D.FIRSTNAMES, 'first')} || ' ' || {pick(D.LASTNAMES, 'last')}",
        "email": pick(D.EMAILS, "email"),
        "city": pick(D.CITIES, "city"),
        "country": pick(D.COUNTRIES, "country"),
        "province": pick(D.EMAILS, "province"),
        "homepage": pick(D.FIRSTNAMES, "homepage"),
        "creditcard": f"'{D.CREDITCARD}'",
        "zipcode": f"'{D.ZIPCODE}'",
    }


def split_streams(
    events: DataFrame, seed: int = 42, draw: str = "md5"
) -> dict[str, DataFrame]:
    """Event-type dispatch of the unified stream (P2,
    NexmarkQuery5b.java:129-136): persons / auctions / bids views. Persons
    carry the dictionary-sampled string attributes (S1)."""
    persons = person_attributes(
        events.filter(F.col("event_type") == 2).select(
            F.col("person_id"),
            F.col("ts").alias("p_ts"),
            F.col("ts_ns").alias("p_ts_ns"),
        ),
        seed=seed,
        draw=draw,
    )
    auctions = events.filter(F.col("event_type") == 0).select(
        F.col("event_id").alias("auction_id"),
        F.col("ref_person_id").alias("seller_id"),
        F.col("ts").alias("start_ts"),
        F.col("ts_ns").alias("start_ts_ns"),
        F.expr("ts + INTERVAL 10 SECONDS").alias("end_ts"),
        F.col("price").alias("initial_price"),
    )
    bids = events.filter(F.col("event_type") == 1).select(
        F.col("event_id").alias("bid_id"),
        F.col("ref_auction_id").alias("auction_id"),
        F.col("ref_person_id").alias("bidder_id"),
        F.col("price").alias("bid"),
        F.col("ts").alias("b_ts"),
        F.col("ts_ns").alias("b_ts_ns"),
    )
    return {"persons": persons, "auctions": auctions, "bids": bids}


def with_zipf_keys(
    df: DataFrame,
    n_keys: int = 10_000,
    exponent: float = 1.1,
    seed: int = 42,
    out_col: str = "zipf_key",
) -> DataFrame:
    """Attach a Zipf-distributed key column (inverse-CDF over ranks 1..n):
    the realistic heavy-tail alternative to the reference's two-level
    hot/uniform skew — rank r gets probability ∝ 1/r^s. Pure column
    expressions (uniform hash → inverse power transform), so the skewed
    workload generator scales like the rest of the pipeline."""
    # u ∈ (0,1] from a hash; rank ≈ ceil(n^( ... )) via the standard
    # approximation rank = ceil(u^(-1/(s-1))) clamped to n (s > 1)
    u = (
        (F.pmod(F.hash(F.col("event_id"), F.lit(seed)), 1_000_000) + 1)
        / 1_000_000.0
    )
    inv = F.pow(u, F.lit(-1.0 / (exponent - 1.0)))
    rank = F.least(F.ceil(inv).cast("long"), F.lit(n_keys))
    return df.withColumn(out_col, rank)
