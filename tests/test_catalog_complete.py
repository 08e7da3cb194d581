"""Locks the coverage claims: the full canonical public Nexmark catalog and
all 22 TPC-H shapes stay registered, and every registered query keeps the
driver contract (callable + oracle or documented rows-only check)."""

from nexmark_vanilla_flink_spark.plans import REGISTRY

# canonical public Nexmark catalog (NEXMark paper / Beam / nexmark-flink):
# qN -> the registry entry covering it. q12 (processing-time windows) has no
# deterministic batch oracle by definition — its surface is the q5b
# proc-time flush path (COVERAGE.md).
CANONICAL = {
    0: "nexmark_q0_passthrough",
    1: "nexmark_q1_currency",
    2: "nexmark_q2_selection",
    3: "nexmark_q3_local_suggest",
    4: "nexmark_q4_category_avg",
    5: "q5_hot_items",
    6: "nexmark_q6_seller_avg",
    7: "nexmark_q7_highest_bid",
    8: "q8_new_users_auctions",
    9: "nexmark_q9_winning_bid_rows",
    10: "nexmark_q10_log_partitioned",
    11: "sessions_by_bidder",
    13: "nexmark_q13_side_input_join",
    14: "nexmark_q14_calculation",
    15: "nexmark_q15_bidding_stats",
    16: "nexmark_q16_channel_stats",
    17: "nexmark_q17_auction_stats",
    18: "nexmark_q18_last_bid",
    19: "nexmark_q19_auction_top10",
    20: "nexmark_q20_bid_auction",
    21: "nexmark_q21_channel_id",
    22: "nexmark_q22_url_dirs",
}


def test_canonical_nexmark_catalog_registered():
    for qn, entry in CANONICAL.items():
        assert entry in REGISTRY, f"q{qn} entry {entry} missing"
        assert REGISTRY[entry].oracle, f"q{qn} entry {entry} lost its oracle"


def test_all_22_tpch_shapes_registered():
    nums = {
        int(n.split("_")[1][1:]) for n in REGISTRY if n.startswith("tpch_q")
    }
    assert nums == set(range(1, 23)), sorted(nums)


def test_registry_oracle_coverage():
    # r6: EVERY entry carries an oracle — approx_user_stats (the last
    # rows-only holdout) now emits error-bound verdict booleans under a
    # TRUE-asserting oracle instead of raw engine-specific sketch values
    no_oracle = {n for n, q in REGISTRY.items() if not q.oracle}
    assert no_oracle == set(), no_oracle


def test_streaming_replays_share_batch_oracles():
    replays = [n for n in REGISTRY if n.endswith("_stream_replay")]
    assert len(replays) >= 6
    for n in replays:
        assert REGISTRY[n].oracle, n


def test_driver_head_order_and_size():
    """The correctness driver gates the FIRST 50 entries of queries() —
    DRIVER_HEAD must be exactly 50 registered names and must lead the
    returned ordering verbatim (a silent reorder would swap which queries
    sit under the hard cross-engine gate)."""
    from nexmark_vanilla_flink_spark.plans import all_queries
    from nexmark_vanilla_flink_spark.plans.registry import (
        DRIVER_HEAD,
        REGISTRY,
    )

    assert len(DRIVER_HEAD) == 50
    missing = [n for n in DRIVER_HEAD if n not in REGISTRY]
    assert not missing, missing
    assert list(all_queries())[:50] == DRIVER_HEAD
