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
# Round-3 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 1 — the 12 entries never driver-checked in any round (r1/r2 cap
# casualties; closing VERDICT r2 ask #2). Tier 2 — new this round.
# Tier 3 — implementation or oracle changed this round. Tier 4 — regression
# rotation: entries green in r1 but not re-checked in r2 (oldest signal
# first). approx_user_stats (structurally no_oracle) is demoted past the cap
# so it stops burning a head slot. Everything below the cap stays
# pytest-oracle-locked every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 1: never driver-checked ---
    "nexmark_q0_passthrough",
    "nexmark_q1_currency",
    "nexmark_q2_selection",
    "nexmark_q3_local_suggest",
    "nexmark_q7_highest_bid",
    "nexmark_q13_side_input_join",
    "nexmark_q18_last_bid",
    "nexmark_q19_auction_top10",
    "nexmark_q20_bid_auction",
    "nexmark_q21_channel_id",
    "nexmark_q22_url_dirs",
    "stratified_sample",
    # --- tier 2: added in round 3 ---
    "exactly_once_sink_replay",
    "ngram_containment_pairs",
    "pq_codes",
    "incremental_dedup_stream_replay",
    "multimodal_audio_windows",
    "histogram_quantiles",
    "bottomk_consistent_sample",
    "source_dup_matrix",
    "mixture_rebalanced_sample",
    "text_normalize_fingerprints",
    "countmin_sketch_table",
    "leakage_safe_splits",
    "stream_dedup_replay",
    "curation_funnel",
    "sessions_dynamic_gap_stream_replay",
    "kmeans_refine_once",
    "minhash_estimate_error",
    # --- tier 3: implementation/oracle changed in round 3 ---
    "chunk_dedup_stats",       # oracle typing fix (r2 hash-fail)
    "domain_mixing_weights",   # oracle typing fix (r2 hash-fail)
    "doc_bigram_rarity",       # oracle typing fix (r2 hash-fail)
    "chunk_dedup_rewrite",     # oracle typing fix (r2 hash-fail)
    "simhash_neardup_pairs",   # oversized-bucket re-banding guard
    "hot_items_salted_join",   # deterministic row-hash salt
    "dedup_clusters",          # graph.py probe/semi-join changes
    "person_binary_decode",    # shared frame-column decode refactor
    "bid_binary_decode",       # full-domain IEEE-754 decoder
    "auction_binary_decode",   # shared frame-column decode refactor
    # --- tier 4: r1-green, not re-checked since ---
    "q5_hot_items",
    "q5_sliding",
    "q8_new_users_auctions",
    "q11_user_bids",
    "qx_winning_bids",
    "sessions_by_bidder",
    "cm_load_per_job",
    "highest_bid_per_window",
    "event_type_stats",
    "union_tagged_daily",
    "sessions_dynamic_gap",
    # (q8_left_outer, grouped_median_pandas, q5_hot_items_sql, tpch_q1, tpch_q3, tpch_q5_local_volume, tpch_q4, tpch_q6, tpch_q12 and tpch_q14 join the queued
    # tier-4 rotations — slots yielded to the round-3 additions)
    # (tpch_q2_min_cost_supplier and tpch_q10_returned_items join the other
    # ever-green tier-4 rotations queued for next round — slots yielded to
    # the new round-3 entries)
    # (tpch_q18_volume_customers, tpch_q22_global_acctbal,
    # tpch_q16_part_suppliers and dedup_exact_docs — all ever-green —
    # yield their tier-4 slots to the new round-3 entries; they queue
    # first for the next round's rotation)
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
