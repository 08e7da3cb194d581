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
# Round-8 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 2 — changed in r8: the BPE pair (merge-table materialization,
# VERDICT r7 task 3). scd2/skipgram stream replays were slotted for a
# batching/flush change (r7 task 4) that did NOT ship before the round
# truncated — they stayed in the head as plain regression re-gates
# (correction recorded per VERDICT r8 "What's wrong" #4; the flush work
# lands in r9). Tier 3 — plans changed in r7 but not re-gated then
# (ADVICE r7: branch-reuse caches and the bigram_pmi_lift N/N2
# restructure shipped in the r7 diff after the head was cut). Tier 4 —
# regression rotation, oldest last-green first: the four r3-last-green
# entries deferred from r7 (nexmark_q0/q1/q2 + cm_load_per_job), then
# ALL 33 r4-last-green entries — after r8 the cumulative freshness
# floor moved to r5.
# 4 + 9 + 4 + 33 = 50. Everything below the cap stays pytest-oracle-
# locked every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 2: implementation changes this round (r8) ---
    "bpe_learn_merges",
    "bpe_encode_stats",
    "scd2_stream_replay",
    "skipgram_pairs_stream_replay",
    # --- tier 3: plan changed in r7 after the r7 head was cut ---
    "bigram_pmi_lift",
    "bloom_membership_audit",
    "bigram_lm_doc_scores",
    "semdedup_prune",
    "ann_ivf_topk",
    "entity_resolution_pairs",
    "quality_label_propagation",
    "event_transition_matrix",
    "tfidf_cosine_topk",
    # --- tier 4: regression rotation, r3-last-green (deferred from r7) ---
    "nexmark_q0_passthrough",
    "nexmark_q1_currency",
    "nexmark_q2_selection",
    "cm_load_per_job",
    # --- tier 4: regression rotation, r4-last-green (all 33) ---
    "auction_binary_decode",
    "cosine_topk_bruteforce",
    "dedup_exact_docs",
    "doc_fingerprints",
    "eval_decontamination",
    "generated_hot_seller_histogram",
    "generated_q3_person_join",
    "grouped_median_pandas",
    "label_centroids",
    "lang_guess",
    "minhash_estimate_error",
    "minhash_lsh_pairs",
    "multimodal_frame_extract",
    "multimodal_meta",
    "pii_scrub",
    "q5_hot_items_sql",
    "q8_left_outer",
    "simhash_fingerprints",
    "text_quality_scores",
    "token_counts",
    "tpch_q10_returned_items",
    "tpch_q12_shipmode_buckets",
    "tpch_q14_promo_share",
    "tpch_q16_part_suppliers",
    "tpch_q18_volume_customers",
    "tpch_q1_pricing_summary",
    "tpch_q22_global_acctbal",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "vocab_top_tokens",
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
