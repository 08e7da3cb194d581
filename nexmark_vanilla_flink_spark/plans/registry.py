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
# Round-7 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 1 — NEVER driver-checked: the three entries added after the final
# r6 head cut (VERDICT r6 task 2); with these gated, cumulative driver
# coverage reaches 177/177. Tier 3 — changed in r7: the two oracle
# restructures (ngram_jaccard_pairs posting-list rewrite,
# golden_record_merge MATERIALIZED CTEs — copurchase_kcore's oracle also
# changed but it is tier-1 already) and the two layout entries whose
# write mechanics changed (per-process layout root; ordering conf moved
# to session construction). Tier 4 — regression rotation, oldest
# last-green first: the three remaining r2-last-green entries, then 40
# of the 44 r3-last-green entries. Deferred to r8 with the least
# re-gate risk: nexmark_q0_passthrough / q1_currency / q2_selection
# (stateless projections/filters, static since r3) and cm_load_per_job
# (static whitespace-text source, round-trip-tested every CI run) — all
# four stay CI-parity-locked below the cap.
# 3 + 4 + 43 = 50. Everything below the cap stays pytest-oracle-locked
# every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 1: never driver-checked ---
    "cdc_snapshot_delta",
    "bpe_encode_stats",
    "copurchase_kcore",
    # --- tier 3: oracle or write mechanics changed in round 7 ---
    "ngram_jaccard_pairs",
    "golden_record_merge",
    "bucketed_colocated_join",
    "partitioned_pruned_scan",
    # --- tier 4: regression rotation, r2-last-green ---
    "events_semi_anti_join",
    "nation_distinct_segments",
    "user_event_pivot",
    # --- tier 4: regression rotation, r3-last-green ---
    "bid_binary_decode",
    "bottomk_consistent_sample",
    "chunk_dedup_rewrite",
    "chunk_dedup_stats",
    "countmin_sketch_table",
    "curation_funnel",
    "dedup_clusters",
    "doc_bigram_rarity",
    "domain_mixing_weights",
    "event_type_stats",
    "highest_bid_per_window",
    "histogram_quantiles",
    "hot_items_salted_join",
    "kmeans_refine_once",
    "leakage_safe_splits",
    "mixture_rebalanced_sample",
    "multimodal_audio_windows",
    "nexmark_q13_side_input_join",
    "nexmark_q18_last_bid",
    "nexmark_q19_auction_top10",
    "nexmark_q20_bid_auction",
    "nexmark_q21_channel_id",
    "nexmark_q22_url_dirs",
    "nexmark_q3_local_suggest",
    "nexmark_q7_highest_bid",
    "ngram_containment_pairs",
    "person_binary_decode",
    "pq_codes",
    "q11_user_bids",
    "q5_hot_items",
    "q5_sliding",
    "q8_new_users_auctions",
    "qx_winning_bids",
    "sessions_by_bidder",
    "sessions_dynamic_gap",
    "simhash_neardup_pairs",
    "source_dup_matrix",
    "stratified_sample",
    "text_normalize_fingerprints",
    "union_tagged_daily",
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
