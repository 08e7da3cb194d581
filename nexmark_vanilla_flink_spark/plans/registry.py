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
# Round-4 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 1 — never driver-checked: empty this round (only approx_user_stats,
# structurally no_oracle, permanently below the cap). Tier 2 — new this
# round. Tier 3 — implementation changed this round (the streaming runner
# rework re-gates every bounded replay). Tier 4 — regression rotation:
# oldest-green entries (last green r1), honoring the VERDICT r3 queue.
# Everything below the cap stays pytest-oracle-locked every CI run
# (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 2: added in round 4 ---
    "generated_q3_person_join",   # generator dictionary attributes, md5 oracle
    "generated_event_mix_stats",  # 1:4:4 mix + price draw, oracle-gated
    "generated_hot_seller_histogram",  # 15% hot-key skew, oracle-gated
    "pii_scrub",                  # PII redaction with scrubbed-bytes hash
    # --- tier 3: implementation changed in round 4 ---
    # streaming runner changed execution for every bounded replay (default
    # state partitions, tmpfs scratch checkpoints, append-mode file sink) —
    # all 13 replays re-gate:
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
    "auction_binary_decode",      # ranged-read numpy mapInArrow hot path
    "minhash_estimate_error",     # de-broadcast candidate frames
    "eval_decontamination",       # de-broadcast eval shingle set
    # --- tier 4: oldest-green rotation (last green r1; VERDICT r3 task 5
    # queue honored: q8_left_outer, grouped_median_pandas, q5_hot_items_sql,
    # dedup_exact_docs + the queued TPC-H entries) ---
    "q8_left_outer",
    "grouped_median_pandas",
    "q5_hot_items_sql",
    "dedup_exact_docs",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q12_shipmode_buckets",
    "tpch_q14_promo_share",
    "tpch_q2_min_cost_supplier",
    "tpch_q10_returned_items",
    "tpch_q18_volume_customers",
    "tpch_q22_global_acctbal",
    "tpch_q16_part_suppliers",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "simhash_fingerprints",
    "text_quality_scores",
    "lang_guess",
    "token_counts",
    "doc_fingerprints",
    "cosine_topk_bruteforce",
    "multimodal_meta",
    "ann_ivf_topk",
    "label_centroids",
    "vocab_top_tokens",
    "multimodal_frame_extract",
    # (corpus_curation, deterministic_splits, scalar_quantize_embeddings,
    # srp_lsh_buckets, multimodal_resize, doc_chunks_udtf, orders_rollup,
    # top_customers_per_nation — the eight remaining r1-green entries —
    # queue first for the r5 rotation; the 50-slot cap is full)
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
