"""Oracle-gated queries over the SYNTHETIC generator (S1-S4) — closing the
r3 gap that the generator's person string attributes existed only in the
driver testdata and the binary-decode path.

The generator draws all randomness through ``generator._u32`` (an md5-based
uniform draw with an exact ANSI-SQL twin), so the DuckDB oracle REGENERATES
the identical event stream from ``range()`` and recomputes the query — the
full generator surface (interleave ratio, hot-seller skew, dictionary
attributes) sits under the same cross-engine hash gate as every parquet
query. Reference: person attribute sampling beans/NewPersonEvent0.java:72-82
(dictionaries original/{Firstnames,Lastnames,Emails,Cities,Countries}.java),
hot-seller skew source/NexmarkAuctionSource.java:34-72, interleave
generator/GeneratorPipeline.java:93-180.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.generator import (
    EPOCH,
    HOT_PROB_PCT,
    HOT_RATIO,
    generate_events_batch,
    person_attrs_sql,
    split_streams,
    _u32_sql,
)
from .registry import register

_N_EVENTS = 90_000
_SEED = 42
_COUNTRIES = ("Brazil", "Japan", "Norway")


def _generated_q3_oracle() -> str:
    attrs = person_attrs_sql("person_id", _SEED)
    in_list = ", ".join(f"'{c}'" for c in _COUNTRIES)
    return f"""
WITH ids AS (SELECT range AS id FROM range(0, {_N_EVENTS})),
ev AS (
  SELECT id,
         id % {EPOCH} AS slot,
         id // {EPOCH} AS epoch,
         ({_u32_sql('id', _SEED, 'hot')} % 100) > {HOT_PROB_PCT} AS is_hot
  FROM ids
),
persons AS (
  SELECT epoch AS person_id FROM ev WHERE slot < 1
),
persons_attr AS (
  SELECT person_id,
         {attrs['name']} AS name,
         {attrs['city']} AS city,
         {attrs['country']} AS country,
         {attrs['province']} AS province
  FROM persons
),
auctions AS (
  SELECT id AS auction_id,
         CASE WHEN is_hot THEN (epoch // {HOT_RATIO}) * {HOT_RATIO}
              ELSE {_u32_sql('id', _SEED, 'person')} % (epoch + 1)
         END AS seller_id
  FROM ev WHERE slot >= 1 AND slot < 5
)
SELECT p.name, p.city, p.province, p.person_id, a.auction_id
FROM persons_attr p JOIN auctions a ON p.person_id = a.seller_id
WHERE p.country IN ({in_list})
"""


@register(
    "generated_q3_person_join",
    oracle=_generated_q3_oracle(),
    tags=("nexmark", "generator", "source"),
)
def generated_q3_person_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style local-item-suggestion over PURELY GENERATED data: persons
    (with dictionary-sampled attributes) filtered by country, joined to the
    generated auctions on seller id — exercising the interleaved 1:4:4
    generator, the 15% hot-seller skew, and the S1 dictionary attributes
    under the cross-engine oracle (the DuckDB side regenerates the same
    stream from range() via the shared md5 draw). ``sf_dir`` is unused —
    the generator is the source.

    Scale: the generator is a ``spark.range`` projection (no input, no
    shuffle); the join shuffles on seller_id where AQE's skew splitting
    handles the deliberate hot keys."""
    ev = generate_events_batch(spark, _N_EVENTS, seed=_SEED)
    s = split_streams(ev, seed=_SEED)
    persons = s["persons"].select("person_id", "name", "city", "country", "province")
    auctions = s["auctions"].select("auction_id", "seller_id")
    return (
        persons.filter(F.col("country").isin(*_COUNTRIES))
        .join(auctions, persons.person_id == auctions.seller_id)
        .select("name", "city", "province", "person_id", "auction_id")
    )


def _generated_mix_oracle() -> str:
    return f"""
WITH ids AS (SELECT range AS id FROM range(0, {_N_EVENTS})),
ev AS (
  SELECT id,
         id % {EPOCH} AS slot,
         {_u32_sql('id', _SEED, 'price')} % 10000000 AS price_units
  FROM ids
)
SELECT CASE WHEN slot < 1 THEN 'person'
            WHEN slot < 5 THEN 'auction'
            ELSE 'bid' END AS kind,
       count(*) AS n,
       min(price_units) AS min_price_units,
       max(price_units) AS max_price_units,
       CAST(sum(price_units) AS BIGINT) AS sum_price_units
FROM ev
GROUP BY 1
"""


@register(
    "generated_event_mix_stats",
    oracle=_generated_mix_oracle(),
    tags=("nexmark", "generator", "source"),
)
def generated_event_mix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interleaved 1:4:4 event mix (S4 —
    generator/GeneratorPipeline.java:93-180, ratio constants
    common/NexmarkCommon.java:9-12) and the uniform price draw (S3,
    price U[0, 1e7) — NexmarkBidSource.java:34-70) under the cross-engine
    oracle: per-kind counts and exact integer price-unit stats (the price's
    integer numerator — order-insensitive BIGINT sums, no float
    accumulation). The DuckDB side regenerates the stream from range()."""
    from ..sources.generator import _u32

    ev = generate_events_batch(spark, _N_EVENTS, seed=_SEED)
    slot = F.col("event_id") % EPOCH
    price_units = F.pmod(
        _u32(F.col("event_id"), _SEED, "price"), F.lit(10_000_000)
    )
    return (
        ev.select(
            F.when(slot < 1, "person")
            .when(slot < 5, "auction")
            .otherwise("bid")
            .alias("kind"),
            price_units.alias("price_units"),
        )
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("price_units").alias("min_price_units"),
            F.max("price_units").alias("max_price_units"),
            F.sum("price_units").alias("sum_price_units"),
        )
    )


def _generated_skew_oracle() -> str:
    return f"""
WITH ids AS (SELECT range AS id FROM range(0, {_N_EVENTS})),
ev AS (
  SELECT id,
         id % {EPOCH} AS slot,
         id // {EPOCH} AS epoch,
         ({_u32_sql('id', _SEED, 'hot')} % 100) > {HOT_PROB_PCT} AS is_hot
  FROM ids
),
bids AS (
  SELECT CASE WHEN is_hot
              THEN (epoch * 4 // {HOT_RATIO}) * {HOT_RATIO}
              ELSE {_u32_sql('id', _SEED, 'auction')} % ((epoch + 1) * 4)
         END AS auction_key
  FROM ev WHERE slot >= 5
)
SELECT CASE WHEN auction_key % {HOT_RATIO} = 0 THEN 'hot_aligned'
            ELSE 'uniform' END AS bucket,
       count(*) AS n_bids,
       count(DISTINCT auction_key) AS n_keys
FROM bids
GROUP BY 1
"""


@register(
    "generated_hot_seller_histogram",
    oracle=_generated_skew_oracle(),
    tags=("nexmark", "generator", "source", "skew"),
)
def generated_hot_seller_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 15% hot-key skew (S2/S3 — NexmarkAuctionSource.java:34-72
    ``rand(100) > 85 -> (id/100)*100``, HOT_AUCTIONS_PROB
    common/NexmarkCommon.java:24) under the cross-engine oracle: bid
    traffic split into hot-aligned keys (multiples of HOT_RATIO) vs the
    uniform remainder, with per-bucket bid and distinct-key counts — the
    exact numbers the skew tooling (AQE skew split, salted_join) exists
    for, now hash-gated instead of pytest-threshold-checked."""
    ev = generate_events_batch(spark, _N_EVENTS, seed=_SEED)
    s = split_streams(ev, seed=_SEED)
    bids = s["bids"].select(F.col("auction_id").alias("auction_key"))
    return (
        bids.select(
            F.when(F.col("auction_key") % HOT_RATIO == 0, "hot_aligned")
            .otherwise("uniform")
            .alias("bucket"),
            "auction_key",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_bids"),
            F.count_distinct("auction_key").alias("n_keys"),
        )
    )
