"""Registry entry for the fixed-width binary person wire format (S7/P5).

The encoder writes the reference's framed 206-byte person records
(sources/binary.py; reference PersonDeserializationSchema.java:13,41-91) from
the customer table; the registered query decodes them back with a pure Spark
column plan and the oracle recomputes the same derived fields directly from
customer in DuckDB — so any asymmetry between the byte layout written and the
slices read shows up as a value mismatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.binary import (
    decode_person_frames,
    person_frames_path,
    write_person_frames,
)
from .registry import register


@register(
    "person_binary_decode",
    oracle="""
SELECT c_custkey AS person_id,
       c_name || ' S' || (c_custkey % 97) AS full_name,
       c_name || '.S' || (c_custkey % 97) || '@example.com' AS email,
       'CITY_' || (c_custkey % 50) AS city,
       'NATION_' || c_nationkey AS country,
       c_custkey * 7919 + (c_custkey % 104729) AS credit_card,
       (c_custkey % 1000 + 500) - (c_custkey % 400) AS province,
       (c_custkey % 2000 + 300) - (c_custkey % 400) AS zipcode,
       c_custkey * 1000 + 1 AS ts_ms
FROM customer
""",
    tags=("nexmark", "source", "binary", "decode"),
)
def person_binary_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the reference's framed fixed-width person records
    (8192-byte frames, 16-byte header with checksum 0x30011991, 206-byte
    records) into the NewPersonEvent0 surface including the P5 decode-time
    derivations (email concat, name concat, province/zipcode arithmetic,
    credit-card sum). The frame file is encoded once per SF from the customer
    table; the decode itself is binaryFile scan → frame/record explode →
    substring + conv(hex()) slices — zero Python in the decode path."""
    path = person_frames_path(sf_dir)
    if not os.path.exists(path):
        write_person_frames(sf_dir, path)
    return decode_person_frames(spark, path)


@register(
    "bid_binary_decode",
    oracle="""
SELECT user_id AS bidder_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS auction_id,
       value AS price,
       epoch_ns(ts) // 1000000 AS ts_ms
FROM events
WHERE event_type = 'purchase'
""",
    tags=("nexmark", "source", "binary", "decode"),
)
def bid_binary_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the reference's framed 32-byte bid records (8192-byte frames,
    checksum 0xdeedbeaf; layout long bidderId | long auctionId | double
    price | long timestamp — BidDesearializationSchema.java:19,38-49). The
    price double is reconstructed bit-exactly from its IEEE-754 fields with
    pure column arithmetic; the oracle recomputes the same surface straight
    from the events table, so any byte-layout or float-reconstruction
    asymmetry hash-mismatches."""
    from ..sources.binary import (
        bid_frames_path,
        decode_bid_frames,
        write_bid_frames,
    )

    path = bid_frames_path(sf_dir)
    if not os.path.exists(path):
        write_bid_frames(sf_dir, path)
    return decode_bid_frames(spark, path)
