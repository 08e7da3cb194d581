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
# Round-10 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 2 — implementation changed in r10 (11): the two de-quadratic'd
# entries (hard_negative_mining re-pointed at the ivf_index probe path;
# cosine_topk_bruteforce's constant query panel) plus the two IVF
# consumers of the v2 artifact (normed/ now carries label); the three
# consumers of the new materialized dedup cluster-map artifact
# (dedup_clusters, dedup_cluster_rewrite, leakage_safe_splits — the CC
# loop moved into the priced artifact build); and the four sentinel
# replays, now a SINGLE file source over a combined dir (funnel also
# pre-filters to view/click/purchase JVM-side). Tier 4 — regression
# rotation, oldest last-green first: the seven r5-deferred entries lead
# (exactly the r9 freshness floor), then the full r6-last-green cohort
# (31, minus hard_negative_mining already in tier 2), then the two
# alphabetically-first r7 entries to fill the cap. 11 + 7 + 30 + 2 = 50.
# Everything below the cap stays pytest-oracle-locked every CI run
# (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 2: implementation changes this round (r10) ---
    "ann_ivf_topk",
    "ann_ivf_topk_stream_replay",
    "hard_negative_mining",
    "cosine_topk_bruteforce",
    "dedup_clusters",
    "dedup_cluster_rewrite",
    "leakage_safe_splits",
    "funnel_conversion_stream_replay",
    "scd2_stream_replay",
    "skipgram_pairs_stream_replay",
    "user_value_ewma_stream_replay",
    # --- tier 4: the seven r5-last-green deferred from the r9 head ---
    "tpch_q11_important_parts",
    "tpch_q15_top_supplier",
    "user_history_sequences",
    "user_value_resample_ffill",
    "value_outliers",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    # --- tier 4 (cont.): r6-last-green cohort ---
    "approx_user_stats",
    "bpe_pair_counts",
    "doc_repetition_scores",
    "dq_expectation_audit",
    "events_cube",
    "events_upsert_snapshot",
    "events_variant_props",
    "exactly_once_sink_replay",
    "funnel_conversion",
    "interval_overlap_join",
    "key_skew_profile",
    "kmeans_train",
    "nexmark_q15_bidding_stats",
    "nexmark_q16_channel_stats",
    "nexmark_q17_auction_stats",
    "q8_union_join_lowlevel",
    "skipgram_pairs",
    "temporal_holdout_splits",
    "token_budget_packing",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q7_volume_shipping",
    "tpch_q8_national_share",
    "tpch_q9_product_profit",
    "user_event_gaps",
    "user_lag_features",
    "user_value_ewma",
    # --- tier 4 (cont.): r7 cohort, alphabetical head ---
    "bid_binary_decode",
    "bottomk_consistent_sample",
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
