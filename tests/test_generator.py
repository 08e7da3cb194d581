"""Synthetic generator invariants — the reference's configured shapes
(BASELINE.md): event mix 1:4:4, 15% hot-key skew, deterministic by seed."""

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.generator import (
    generate_events_batch,
    split_streams,
)

N = 90_000


def test_mix_ratio(spark):
    ev = generate_events_batch(spark, N)
    counts = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts[2] == N // 9  # persons
    assert counts[0] == 4 * N // 9  # auctions
    assert counts[1] == 4 * N // 9  # bids


def test_hot_key_skew(spark):
    ev = generate_events_batch(spark, N)
    bids = split_streams(ev)["bids"]
    hot_share = (
        bids.filter(F.col("auction_id") % 100 == 0).count() / bids.count()
    )
    # ~15% of bids hit hot auctions (ids divisible by HOT_RATIO), vs ~1%
    # if uniform; allow generous slack for the uniform paths landing there
    assert 0.10 < hot_share < 0.25


def test_deterministic_by_seed(spark):
    a = generate_events_batch(spark, 1000, seed=7).collect()
    b = generate_events_batch(spark, 1000, seed=7).collect()
    assert a == b


def test_event_times_monotone_per_rate(spark):
    ev = generate_events_batch(spark, 1000, events_per_sec=100)
    mm = ev.agg(F.min("ts_ns").alias("lo"), F.max("ts_ns").alias("hi")).collect()[0]
    assert mm["lo"] == 0
    # 1000 events at 100/s → ~10 s of event time
    assert abs(mm["hi"] - 9_990_000_000) < 20_000_000


def test_zipf_keys_heavy_tail(spark):
    from nexmark_vanilla_flink_spark.sources.generator import with_zipf_keys

    ev = with_zipf_keys(generate_events_batch(spark, N), exponent=1.5)
    counts = (
        ev.groupBy("zipf_key").count().orderBy(F.desc("count")).limit(10).collect()
    )
    total = N
    top1 = counts[0]["count"] / total
    top10 = sum(r["count"] for r in counts) / total
    # rank-1 dominates and the head is heavy (zipf s=1.5: rank 1 ≈ 38%)
    assert top1 > 0.2, top1
    assert top10 > 0.6, top10
    # deterministic
    a = with_zipf_keys(generate_events_batch(spark, 1000)).collect()
    b = with_zipf_keys(generate_events_batch(spark, 1000)).collect()
    assert a == b


def test_person_attributes_dictionary_draws(spark):
    """S1 dictionary attributes (NewPersonEvent0.java:72-82): every value
    comes from its dictionary, the reference's quirks hold (province from
    EMAILS, homepage from FIRSTNAMES, fixed creditcard/zipcode), and the
    draws are deterministic by (person_id, seed)."""
    from nexmark_vanilla_flink_spark.sources import dictionaries as D

    persons = split_streams(generate_events_batch(spark, 9_000))["persons"]
    rows = persons.collect()
    assert len(rows) == 1_000
    first = set(D.FIRSTNAMES)
    last = set(D.LASTNAMES)
    for r in rows:
        fn, ln = r["name"].split(" ", 1)
        assert fn in first and ln in last
        assert r["email"] in D.EMAILS
        assert r["city"] in D.CITIES
        assert r["country"] in D.COUNTRIES
        assert r["province"] in D.EMAILS  # reference quirk
        assert r["homepage"] in D.FIRSTNAMES  # reference quirk
        assert r["creditcard"] == D.CREDITCARD
        assert r["zipcode"] == D.ZIPCODE
    # uniform draws should hit most of each dictionary at 1000 persons
    assert len({r["city"] for r in rows}) > len(D.CITIES) * 3 // 4
    # deterministic: same seed, same attributes
    again = split_streams(generate_events_batch(spark, 9_000))["persons"].collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # different seed, different draws (spot check)
    other = split_streams(generate_events_batch(spark, 9_000, seed=7), seed=7)[
        "persons"
    ].collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))
