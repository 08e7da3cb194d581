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

# Tags whose queries must be (re)CONSTRUCTED inside bench.py's timer because
# construction does real cluster work: streaming replays, sink round-trips,
# iterative drivers, and "eager" plan builds (e.g. a localCheckpoint that
# evaluates at build time). Single source of truth shared by bench.py and
# tests/test_bench_guard.py — a hand-copied set silently desynchronizing was
# ADVICE r3.
EAGER_TAGS = frozenset({"streaming", "sink", "iterative", "eager"})

# The correctness driver evaluates only the FIRST 50 entries of queries()
# (CORRECTNESS_r01.json covers exactly insertion-order indices 0-49), so dict
# order decides which queries sit under the hard cross-engine gate each round.
# DRIVER_HEAD pins the entries that most need driver verification NOW to the
# front of the returned dicts: everything the previous round's cap skipped,
# everything added this round, and everything whose implementation changed
# this round. The remainder follows in module-import order. Entries that fall
# past the cap are still oracled every CI run by tests/test_oracle_parity.py
# and were driver-green in a prior round's CORRECTNESS_r*.json.
# Round-6 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 1 — NEVER driver-checked (added after the r5 head pre-drive; the
# VERDICT r5 task 1 queue). Tier 2 — new in r6: the four training-data
# example-generation operators (plans/training.py) plus approx_user_stats,
# which gained its first-ever oracle this round (error-bound verdict
# booleans, VERDICT r5 task 4) after failing its only rows-only look in
# r2. Tier 3 — the twenty r2-green entries displaced by earlier
# rotations: the nine analytics/curation deferrals plus the eleven
# tier-4 TPC-H/nexmark entries that gave their slots to the r5 linkage
# batch. Tier 4 — implementation changed in r6: the struct-min argmin
# rewrites (kmeans_train/refine, pq_codes, ann_ivf_topk + its replay's
# index build), the funnel shared-exchange restructure, and the
# continuous-mode per-key-timer funnel replay (scd2_stream_replay rides
# along: it shares the sentinel/stateful module that changed). Tier 2b —
# the four entries added mid-r6 AFTER the head was first cut
# (copurchase_pagerank, bpe_learn_merges, skipgram_pairs_stream_replay,
# temporal_holdout_splits): never-gated-new outranks re-gating, so they
# displace the four most redundant tier-5 replays (the sliding/dynamic-gap
# variants whose base shapes still gate, and the two replays whose batch
# twins gate elsewhere in this head — all four stay CI-parity-locked).
# Tier 5 — execution environment changed for EVERY replay (CRC-free local
# FS in get_session + the hashed-replay runner landing beside the sink
# path): the remaining bounded replays re-gate under the new shape.
# Tier 2c — the two entries added latest in r6 (user_value_ewma,
# quality_label_propagation): never-gated-new outranks re-gating again,
# so they displace the two tier-5 replays least sensitive to the runner
# changes — stream_static_enrich (stateless stream-static join, no keyed
# state, no sink readback dependency) and stream_dedup_replay (its
# watermark-dedup state shape re-gates via incremental_dedup's replay
# logic and its batch twin in tier 3) — both stay CI-parity-locked.
# Tier 2d — the five final r6 additions (copurchase_triangles,
# golden_record_merge, event_transition_matrix, dq_expectation_audit,
# user_value_ewma_stream_replay): same rule displaces the four pure-JVM
# replays (q5_hot_items/sessions/q7_highest_bid/cm) — the r6 runner
# change they would re-gate is still exercised by the NINE replays that
# remain in this head (ann_ivf/funnel/scd2/skipgram/ewma Python-stateful,
# q8_join/qx JVM joins, q8_union lowlevel, exactly_once sink path) —
# plus tier-3's nation_distinct_segments (smallest re-gate risk: a tiny
# dimensional distinct, CI-parity-green since r2). All five stay
# CI-parity-locked below the cap.
# Tier 2e — the four entries added latest in r6 (prefix_filter_jaccard_
# pairs, tfidf_cosine_topk, bucketed_colocated_join, key_skew_profile):
# never-gated-new outranks re-gating once more. Displaced, with the
# least re-gate risk in the head: q8_join_stream_replay and
# qx_interval_join_stream_replay (r5-green JVM stream-stream joins; the
# r6 runner change they would re-gate is still exercised by the SEVEN
# replays remaining in this head, including the sink path via
# exactly_once and the lowlevel union join), and kmeans_refine_once and
# pq_codes (the r6 struct-min argmin rewrite they share is gated via
# kmeans_train and ann_ivf_topk + its replay, which stay). All four stay
# CI-parity-locked below the cap. copurchase_triangles' r6 support-
# threshold change re-gates in its existing tier-2d slot.
# Tier 2f — the final r6 additions (bigram_lm_doc_scores — exact-
# arithmetic LM perplexity-filter scoring; partitioned_pruned_scan —
# directory partitioning + plan-asserted partition pruning): same rule,
# displacing the two smallest-risk tier-3 re-gates (user_event_pivot, a
# fixed 1500-row pivot, and events_semi_anti_join, a 2-row membership
# check — both r2-driver-green and CI-parity-locked every run).
# 3 + 5 + 17 + 6 + 4 + 2 + 2 + 5 + 4 + 2 = 50. Everything below the cap
# stays pytest-oracle-locked every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 1: never driver-checked ---
    "bloom_membership_audit",
    "events_upsert_snapshot",
    "user_lag_features",
    # --- tier 2: new in round 6 ---
    "interval_overlap_join",
    "skipgram_pairs",
    "bpe_pair_counts",
    "hard_negative_mining",
    "approx_user_stats",
    # --- tier 3: r2-green rotation queue, finally re-gating ---
    "events_variant_props",
    "incremental_dedup",
    "user_event_gaps",
    "events_cube",
    "token_budget_packing",
    "doc_repetition_scores",
    "nexmark_q15_bidding_stats",
    "nexmark_q16_channel_stats",
    "nexmark_q17_auction_stats",
    "tpch_q7_volume_shipping",
    "tpch_q8_national_share",
    "tpch_q9_product_profit",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q13_order_distribution",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_suppliers",
    # --- tier 4: implementation changed in round 6 ---
    "kmeans_train",
    "ann_ivf_topk",
    "ann_ivf_topk_stream_replay",
    "funnel_conversion",
    "funnel_conversion_stream_replay",
    "scd2_stream_replay",
    # --- tier 2b: added mid-r6 after the first head cut, never gated ---
    "copurchase_pagerank",
    "bpe_learn_merges",
    "skipgram_pairs_stream_replay",
    "temporal_holdout_splits",
    # --- tier 5: replays re-gating under the r6 execution environment ---
    "q8_union_join_lowlevel",
    "exactly_once_sink_replay",
    # --- tier 2c: added latest in r6, never gated ---
    "user_value_ewma",
    "quality_label_propagation",
    # --- tier 2d: final r6 additions, never gated ---
    "copurchase_triangles",
    "golden_record_merge",
    "event_transition_matrix",
    "dq_expectation_audit",
    "user_value_ewma_stream_replay",
    # --- tier 2e: latest r6 additions, never gated ---
    "prefix_filter_jaccard_pairs",
    "tfidf_cosine_topk",
    "bucketed_colocated_join",
    "key_skew_profile",
    # --- tier 2f: final r6 additions, never gated ---
    "bigram_lm_doc_scores",
    "partitioned_pruned_scan",
]


def _ordered_names() -> list[str]:
    head = [n for n in DRIVER_HEAD if n in REGISTRY]
    in_head = set(head)
    return head + [n for n in REGISTRY if n not in in_head]


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
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle
    }
