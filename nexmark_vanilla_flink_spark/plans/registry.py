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
# Round-5 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 1 — never independently re-checked since r1 (the VERDICT r4 task 3
# queue, all eight taken). Tier 2 — new this round: the streaming ANN
# serving path, the streaming PII scrub, the iterative k-means
# trainer, the SemDeDup pruner, the cluster-rewrite, the MOSS
# winnowing fingerprints + overlap pairs, and the five linkage-class
# entries (funnel pattern matching, CDC→SCD2, blocked entity
# resolution, KMV sketch, model-based quality filter). Tier 3 —
# implementation changed in r5: the mix-stats oracle CAST, the q11/q15
# de-funnel, the embedding block guard, the doc_top_terms zero-shuffle tf,
# and all 13 bounded replays (replay_state_partitions default 8 → 4 +
# eager checkpoint cleanup change execution for every replay). Tier 4 —
# regression rotation: oldest-green entries (last driver-checked r2,
# computed from CORRECTNESS_r0{1..4}.json); events_variant_props,
# incremental_dedup, user_event_gaps, user_event_pivot,
# events_semi_anti_join, events_cube, nation_distinct_segments,
# token_budget_packing and doc_repetition_scores are the nine r2-green
# entries the cap defers to r6 (the last four gave their slots to the
# four new curation/text entries); approx_user_stats is structurally
# no_oracle and stays below the cap by design. Everything below the cap
# stays pytest-oracle-locked every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 2: new in round 5 ---
    "ann_ivf_topk_stream_replay",
    "pii_scrub_stream_replay",
    "kmeans_train",
    "semdedup_prune",
    "dedup_cluster_rewrite",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "funnel_conversion",
    "scd2_user_state",
    "entity_resolution_pairs",
    "kmv_distinct_estimate",
    "quality_classifier_scores",
    "funnel_conversion_stream_replay",
    "bigram_pmi_lift",
    "value_outliers",
    "user_history_sequences",
    "scd2_stream_replay",
    "user_value_resample_ffill",
    # --- tier 1: last driver-checked in r1 ---
    "corpus_curation",
    "deterministic_splits",
    "scalar_quantize_embeddings",
    "srp_lsh_buckets",
    "multimodal_resize",
    "doc_chunks_udtf",
    "orders_rollup",
    "top_customers_per_nation",
    # --- tier 3: implementation changed in round 5 ---
    "generated_event_mix_stats",  # oracle typing fix (CAST sum AS BIGINT)
    "tpch_q11_important_parts",   # scalar-agg + broadcast cross join
    "tpch_q15_top_supplier",      # scalar-agg + broadcast cross join
    "embedding_neardup_pairs",    # oversized-block IVF-refinement guard
    "doc_top_terms",              # per-row run-length tf, corpus shuffle cut
    # state-partition default 8 -> 4 + eager ckpt cleanup: all replays
    # re-gate under the new execution shape
    "q5_hot_items_stream_replay",
    "sessions_stream_replay",
    "q8_union_join_lowlevel",
    "q8_join_stream_replay",
    "qx_interval_join_stream_replay",
    "q5_sliding_stream_replay",
    "q7_highest_bid_stream_replay",
    "cm_stream_replay",
    "sessions_dynamic_gap_stream_replay",
    "stream_dedup_replay",
    "exactly_once_sink_replay",
    "stream_static_enrich",
    "incremental_dedup_stream_replay",
    # --- tier 4: oldest-green rotation (last driver-checked r2) ---
    "bids_asof_profile",
    "nexmark_q4_category_avg",
    "nexmark_q6_seller_avg",
    "nexmark_q9_winning_bid_rows",
    "nexmark_q10_log_partitioned",
    "nexmark_q14_calculation",
    # nexmark_q15_bidding_stats, nexmark_q16_channel_stats,
    # nexmark_q17_auction_stats,
    # tpch_q7_volume_shipping, tpch_q8_national_share,
    # tpch_q9_product_profit, tpch_q17_small_qty_revenue,
    # tpch_q20_potential_promotion, tpch_q13_order_distribution,
    # tpch_q19_discounted_revenue and tpch_q21_waiting_suppliers gave
    # their tier-4 slots to the ten new r5 entries above (the seven
    # linkage-class entries incl. both streaming twins + the three
    # corpus-stats entries) and head the r6 rotation queue.
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
