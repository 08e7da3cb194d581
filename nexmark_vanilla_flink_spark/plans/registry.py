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
# Round-11 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 2 — new this round (1): qx_allowed_lateness_replay (the Flink
# allowedLateness re-fire replica). Tier 3 — changed this round (24):
# the four sentinel replays + q8_union_join_lowlevel (single-batch
# end-of-input flush / bucketed union join), kmeans_train (vectorized
# assignment), copurchase_triangles (MATERIALIZED-CTE oracle), and every
# remaining streaming replay — replay_state_partitions' local default
# moved 4 -> 8, a shared-helper change that re-plans ALL of them — plus
# the three artifact-serving entries the r10 VERDICT asked re-checked
# (ngram_containment_pairs, dedup_cluster_rewrite, leakage_safe_splits).
# Tier 4 — regression rotation, oldest last-green first: 25 more of the
# r7-last-green cohort, alphabetically after the two taken in r10.
# 1 + 24 + 25 = 50. Everything below the cap stays pytest-oracle-locked
# every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 2: new this round (r11) ---
    "qx_allowed_lateness_replay",
    # --- tier 3: implementation/oracle changed this round ---
    "skipgram_pairs_stream_replay",
    "scd2_stream_replay",
    "funnel_conversion_stream_replay",
    "user_value_ewma_stream_replay",
    "q8_union_join_lowlevel",
    "kmeans_train",
    "copurchase_triangles",
    "qx_interval_join_stream_replay",
    "q8_join_stream_replay",
    "q5_hot_items_stream_replay",
    "q5_sliding_stream_replay",
    "q7_highest_bid_stream_replay",
    "cm_stream_replay",
    "sessions_stream_replay",
    "sessions_dynamic_gap_stream_replay",
    "stream_dedup_replay",
    "stream_static_enrich",
    "ann_ivf_topk_stream_replay",
    "pii_scrub_stream_replay",
    "incremental_dedup_stream_replay",
    "exactly_once_sink_replay",
    "ngram_containment_pairs",
    "dedup_cluster_rewrite",
    "leakage_safe_splits",
    # --- tier 4: r7-last-green cohort, alphabetical continuation ---
    "bucketed_colocated_join",
    "cdc_snapshot_delta",
    "chunk_dedup_rewrite",
    "chunk_dedup_stats",
    "countmin_sketch_table",
    "curation_funnel",
    "doc_bigram_rarity",
    "domain_mixing_weights",
    "event_type_stats",
    "events_semi_anti_join",
    "golden_record_merge",
    "highest_bid_per_window",
    "histogram_quantiles",
    "hot_items_salted_join",
    "kmeans_refine_once",
    "mixture_rebalanced_sample",
    "multimodal_audio_windows",
    "nation_distinct_segments",
    "nexmark_q13_side_input_join",
    "nexmark_q18_last_bid",
    "nexmark_q19_auction_top10",
    "nexmark_q20_bid_auction",
    "nexmark_q21_channel_id",
    "nexmark_q22_url_dirs",
    "nexmark_q3_local_suggest",
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
