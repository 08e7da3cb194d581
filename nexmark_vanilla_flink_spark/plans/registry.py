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
# Round-9 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 2 — implementation changed in r9 (18): every entry re-pointed at
# a materialized corpus-index artifact (similarity3 postings/prefix/
# tfidf: prefix_filter + tfidf; graph edges: pagerank/triangles/kcore;
# bigram model tables: pmi + lm; BPE vocab refactor: both BPE entries;
# dedup index refactor: incremental_dedup + its stream replay), the
# Arrow ranged-read person decode, the three bucketed-state replay
# twins (scd2/skipgram/ewma, VERDICT r8 task 3) plus the funnel replay
# (bucketed in r9 the same way — the per-key-timer replica stays the
# live/continuous form), and the two IVF-ANN entries whose centroid
# sizing changed to nlist ≈ √N (the r9 10× scale sweep caught the
# fixed-modulus assignment going quadratic —
# plans/pipeline.py::ivf_modulus). Tier 4 — regression rotation,
# oldest last-green first: the r5-last-green cohort is 40 entries, one
# of which (incremental_dedup_stream_replay) already sits in tier 2,
# leaving 39; the cap fits 32, so the seven alphabetically-last
# (tpch_q11_important_parts, tpch_q15_top_supplier,
# user_history_sequences, user_value_resample_ffill, value_outliers,
# winnow_fingerprints, winnow_overlap_pairs) are DEFERRED to the r10
# head. 18 + 32 = 50.
# Everything below the cap stays pytest-oracle-locked every CI run
# (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 2: implementation changes this round (r9) ---
    "ann_ivf_topk",
    "ann_ivf_topk_stream_replay",
    "prefix_filter_jaccard_pairs",
    "tfidf_cosine_topk",
    "copurchase_pagerank",
    "copurchase_triangles",
    "copurchase_kcore",
    "bigram_pmi_lift",
    "bigram_lm_doc_scores",
    "person_binary_decode",
    "bpe_learn_merges",
    "bpe_encode_stats",
    "incremental_dedup",
    "incremental_dedup_stream_replay",
    "scd2_stream_replay",
    "skipgram_pairs_stream_replay",
    "user_value_ewma_stream_replay",
    "funnel_conversion_stream_replay",
    # --- tier 4: regression rotation, r5-last-green (32 of 39) ---
    "bids_asof_profile",
    "cm_stream_replay",
    "corpus_curation",
    "dedup_cluster_rewrite",
    "deterministic_splits",
    "doc_chunks_udtf",
    "doc_top_terms",
    "embedding_neardup_pairs",
    "generated_event_mix_stats",
    "kmv_distinct_estimate",
    "multimodal_resize",
    "nexmark_q10_log_partitioned",
    "nexmark_q14_calculation",
    "nexmark_q4_category_avg",
    "nexmark_q6_seller_avg",
    "nexmark_q9_winning_bid_rows",
    "orders_rollup",
    "pii_scrub_stream_replay",
    "q5_hot_items_stream_replay",
    "q5_sliding_stream_replay",
    "q7_highest_bid_stream_replay",
    "q8_join_stream_replay",
    "quality_classifier_scores",
    "qx_interval_join_stream_replay",
    "scalar_quantize_embeddings",
    "scd2_user_state",
    "sessions_dynamic_gap_stream_replay",
    "sessions_stream_replay",
    "srp_lsh_buckets",
    "stream_dedup_replay",
    "stream_static_enrich",
    "top_customers_per_nation",
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
