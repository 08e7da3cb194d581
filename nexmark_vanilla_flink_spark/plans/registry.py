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
# Round-12 head (rotation policy: COVERAGE.md "Driver-gate rotation").
# Tier 2 — new this round: none. Tier 3 — changed this round (21): the
# two r11 in-sweep-regression entries re-adjudicated per VERDICT r11
# task 3 (q8_join re-pinned to 4 state partitions; cm verified noise),
# the five replays whose explicit partition pins were collapsed into the
# shared default, every entry touched by the native array<double> cast /
# Arrow-vectorized cosine rewrite (neardup, semdedup, topk/quantize/PQ,
# kmeans pair, the three IVF-artifact consumers), the kcore
# size-derived local peel, and the two BPE-artifact consumers after the
# driver-side trainer switch, and (session 2) the incremental-dedup
# streaming replay after its shingle-pipeline restage. Tier 4 —
# regression rotation, oldest last-green first (28): the 16 remaining
# r7-last-green entries, then the r8 cohort alphabetically.
# 22 + 16 + 12 = 50. Everything below the cap stays pytest-oracle-locked
# every CI run (tests/test_oracle_parity.py).
DRIVER_HEAD: list[str] = [
    # --- tier 3: implementation changed this round (r12) ---
    "q8_join_stream_replay",
    "cm_stream_replay",
    "funnel_conversion_stream_replay",
    "scd2_stream_replay",
    "skipgram_pairs_stream_replay",
    "user_value_ewma_stream_replay",
    "q8_union_join_lowlevel",
    "embedding_neardup_pairs",
    "semdedup_prune",
    "cosine_topk_bruteforce",
    "label_centroids",
    "scalar_quantize_embeddings",
    "pq_codes",
    "kmeans_refine_once",
    "kmeans_train",
    "ann_ivf_topk",
    "ann_ivf_topk_stream_replay",
    "hard_negative_mining",
    "copurchase_kcore",
    "bpe_learn_merges",
    "bpe_encode_stats",
    # r12 opt session 2: shingle pipeline restaged (split-once ws/hh
    # projections replace the in-lambda split; bit-identical, CSE only)
    "incremental_dedup_stream_replay",
    # r12 opt session 3: tfidf's pair agg + top-k window collapsed onto one
    # doc_a exchange, plus one representative consumer of each rebuilt
    # index builder (doc_postings / bigram_tables / copurchase_pairs lost
    # their plan caches; tables exceptAll-identical)
    "tfidf_cosine_topk",
    "prefix_filter_jaccard_pairs",
    "bigram_pmi_lift",
    "copurchase_pagerank",
    # r12 opt session 4: the dedup_clusters artifact build and the three
    # pair-list-only consumers now take _lsh_candidate_pairs (the banded
    # candidate set WITHOUT the jaccard-scoring joins they discarded);
    # row sets exceptAll/oracle-identical at 3 SFs, plans lose the two
    # wide-signature inner joins (Exchange 28->16 each)
    "corpus_curation",
    "curation_funnel",
    "dedup_clusters",
    # --- tier 4: r7-last-green cohort (all 16 remaining) ---
    "nexmark_q7_highest_bid",
    "ngram_jaccard_pairs",
    "partitioned_pruned_scan",
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
    "user_event_pivot",
    # --- tier 4 cont.: r8-last-green cohort, alphabetical ---
    "auction_binary_decode",
    "bloom_membership_audit",
    "cm_load_per_job",
    "dedup_exact_docs",
    "doc_fingerprints",
    # minhash_estimate_error rotated out (cap 50): r12 session-2 tier-3
    # addition above takes its slot; session 3's four tier-3 additions
    # likewise displace the r8 alphabetical tail (generated_hot_seller_
    # histogram, generated_q3_person_join, grouped_median_pandas,
    # lang_guess), and session 4's three displace entity_resolution_pairs,
    # eval_decontamination, event_transition_matrix (next round's rotation
    # head); all still CI-oracled every run
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
