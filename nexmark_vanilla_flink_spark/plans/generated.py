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
