"""Fixed-width binary person wire format: frame layout, boundary behavior,
and the pure-column decode plan (reference wire contract,
PersonDeserializationSchema.java:13,33-91)."""

import struct

from nexmark_vanilla_flink_spark.plans import REGISTRY
from nexmark_vanilla_flink_spark.sources.binary import (
    CHECKSUM,
    FRAME_SIZE,
    HEADER_SIZE,
    PERSON_RECORD_SIZE,
    RECORDS_PER_FRAME,
    decode_person_frames,
    encode_person,
    person_frames_path,
    write_person_frames,
)


def test_record_size_matches_reference():
    assert PERSON_RECORD_SIZE == 206  # PersonDeserializationSchema.java:13
    assert len(encode_person(7, "Customer#000000007", 3)) == 206
    assert RECORDS_PER_FRAME == 39  # (8192 - 16) // 206


def test_frame_layout(sf_dir, tmp_path):
    path = str(tmp_path / "persons.bin")
    write_person_frames(sf_dir, path)
    blob = open(path, "rb").read()
    assert len(blob) % FRAME_SIZE == 0
    n_frames = len(blob) // FRAME_SIZE
    frames = [
        struct.unpack_from(">iiq", blob, i * FRAME_SIZE) for i in range(n_frames)
    ]
    total = sum(items for _, items, _ in frames)
    for i, (checksum, items, backlog) in enumerate(frames):
        assert checksum == CHECKSUM
        assert 0 < items <= RECORDS_PER_FRAME
        # backlog = records not yet consumed, including this frame's
        assert backlog == total - i * RECORDS_PER_FRAME
    # every frame but the last is full
    assert all(
        struct.unpack_from(">i", blob, i * FRAME_SIZE + 4)[0] == RECORDS_PER_FRAME
        for i in range(n_frames - 1)
    )


def test_decode_round_trips_every_record(spark, sf_dir, tmp_path):
    path = str(tmp_path / "persons.bin")
    write_person_frames(sf_dir, path)
    df = decode_person_frames(spark, path)
    rows = {r.person_id: r for r in df.collect()}
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/customer.parquet")
    assert len(rows) == tbl.num_rows
    k = tbl.column("c_custkey")[0].as_py()
    name = tbl.column("c_name")[0].as_py()
    r = rows[k]
    assert r.full_name == f"{name} S{k % 97}"
    assert r.email == f"{name}.S{k % 97}@example.com"
    assert r.province == (k % 1000 + 500) - (k % 400)
    assert r.credit_card == k * 7919 + k % 104729


def test_decode_plan_is_udf_free(spark, sf_dir):
    df = REGISTRY["person_binary_decode"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # cache path exists after the registry call built it
    import os

    assert os.path.exists(person_frames_path(sf_dir))


def test_bid_frames_round_trip_bit_exact_doubles(spark, sf_dir, tmp_path):
    """The 32-byte bid record (BidDesearializationSchema.java:19,38-49):
    encoded prices must decode to the IDENTICAL double bits through the
    pure-column IEEE-754 reconstruction."""
    import duckdb

    from nexmark_vanilla_flink_spark.sources.binary import (
        BID_CHECKSUM,
        BID_RECORD_SIZE,
        BIDS_PER_FRAME,
        decode_bid_frames,
        write_bid_frames,
    )

    assert BID_RECORD_SIZE == 32 and BIDS_PER_FRAME == 255
    path = str(tmp_path / "bids.bin")
    write_bid_frames(sf_dir, path)
    blob = open(path, "rb").read()
    assert len(blob) % 8192 == 0
    assert struct.unpack_from(">I", blob, 0)[0] == BID_CHECKSUM
    got = {
        (r.bidder_id, r.auction_id, r.ts_ms): r.price
        for r in decode_bid_frames(spark, path).collect()
    }
    con = duckdb.connect()
    want = con.execute(
        "SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT), "
        "epoch_ns(ts) // 1000000, value FROM "
        f"read_parquet('{sf_dir}/events.parquet') WHERE event_type = 'purchase'"
    ).fetchall()
    con.close()
    assert len(got) == len(want)
    for bidder, auction, ts_ms, price in want:
        # bit-exact: struct round-trip equality, not approximate
        assert struct.pack(">d", got[(bidder, auction, ts_ms)]) == struct.pack(
            ">d", price
        )


def test_ieee754_full_domain_decode(spark, tmp_path):
    """The column IEEE-754 decoder is a GENERAL wire decoder: sign-bit-set
    values, subnormals (incl. the minimum 2^-1074), signed zero, ±Inf and
    NaN must all reconstruct bit-exactly (not just the positive normals the
    generated prices happen to use)."""
    import math

    from nexmark_vanilla_flink_spark.sources.binary import (
        BID_CHECKSUM,
        FRAME_SIZE,
        decode_bid_frames,
    )

    vals = [
        0.0,
        -0.0,
        1.5,
        -273.15,
        5e-324,  # min subnormal
        -5e-324,
        2.2250738585072009e-308,  # max subnormal
        2.2250738585072014e-308,  # min normal
        1.7976931348623157e308,  # max double
        -1.7976931348623157e308,
        math.inf,
        -math.inf,
        math.nan,
        3.141592653589793,
        -1e-200,
    ]
    frame = struct.pack(">Iiq", BID_CHECKSUM, len(vals), len(vals))
    for i, v in enumerate(vals):
        frame += struct.pack(">qqdq", i, i * 10, v, i * 100)
    path = str(tmp_path / "edge_bids.bin")
    with open(path, "wb") as f:
        f.write(frame + b"\x00" * (FRAME_SIZE - len(frame)))
    got = {r.bidder_id: r.price for r in decode_bid_frames(spark, path).collect()}
    assert len(got) == len(vals)
    for i, v in enumerate(vals):
        assert struct.pack(">d", got[i]) == struct.pack(">d", v), (i, v, got[i])


def test_auction_arrow_decode_matches_column_plan(spark, sf_dir, tmp_path):
    """The Arrow (numpy structured-dtype) auction decoder and the pure
    column-expression plan are row-identical — the column plan stays the
    oracle-shared reference path, the Arrow path is the hot path."""
    from nexmark_vanilla_flink_spark.sources.binary import (
        decode_auction_frames,
        decode_auction_frames_arrow,
        write_auction_frames,
    )

    path = str(tmp_path / "auctions.bin")
    write_auction_frames(sf_dir, path)
    col = decode_auction_frames(spark, path)
    arrow = decode_auction_frames_arrow(spark, path)
    assert [f.name for f in arrow.schema.fields] == [
        f.name for f in col.schema.fields
    ]
    a = sorted([tuple(r) for r in arrow.collect()])
    c = sorted([tuple(r) for r in col.collect()])
    assert a == c
    assert len(a) > 0


def test_person_arrow_decode_matches_column_plan(spark, sf_dir, tmp_path):
    """The ranged-read Arrow person decoder (r9, the auction twin's shape)
    and the pure column-expression plan are row-identical — the column
    plan stays the oracle-shared reference path and the Kafka value
    decoder, the Arrow path is the hot path."""
    from nexmark_vanilla_flink_spark.sources.binary import (
        decode_person_frames_arrow,
        write_person_frames,
    )

    path = str(tmp_path / "persons.bin")
    write_person_frames(sf_dir, path)
    col = decode_person_frames(spark, path)
    arrow = decode_person_frames_arrow(spark, path)
    assert [f.name for f in arrow.schema.fields] == [
        f.name for f in col.schema.fields
    ]
    assert [f.dataType for f in arrow.schema.fields] == [
        f.dataType for f in col.schema.fields
    ]
    a = sorted([tuple(r) for r in arrow.collect()])
    c = sorted([tuple(r) for r in col.collect()])
    assert a == c
    assert len(a) > 0
