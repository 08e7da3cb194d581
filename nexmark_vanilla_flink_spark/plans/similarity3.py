"""Exact all-pairs set-similarity operators, round 6 — the two classic
inverted-index similarity-join shapes the corpus tier still lacked (no
reference counterpart; the reference stops at Nexmark analytics):

  * ``prefix_filter_jaccard_pairs`` — EXACT corpus-wide shingle-set
    Jaccard join via prefix filtering (PPJoin-style): unlike the blocked
    (`ngram_jaccard_pairs`) and probabilistic (`minhash_lsh_pairs`)
    variants, this finds *every* pair with J >= tau across the whole
    corpus, and still never forms the quadratic pair space — candidates
    only arise from docs sharing a shingle inside their rarest-first
    prefix.
  * ``tfidf_cosine_topk`` — sparse lexical cosine top-k through an
    inverted index: postings weighted by integer-scaled inverse document
    frequency, stop tokens pruned by a document-frequency cap so no
    posting list (and hence no join group) exceeds df_cap, dot products
    accumulated relationally.

Both stay entirely in codegen'd built-ins (explode / groupBy / HOFs —
no Python UDFs) and follow registry.py's determinism discipline:
candidate *generation* may be engine-specific, but the emitted relation
is defined by exact integer counts, so the DuckDB brute-force oracles
match hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.parallelism import ensure_parallelism
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# prefix_filter_jaccard_pairs — exact Jaccard >= 0.9 via prefix filtering
# ---------------------------------------------------------------------------
# tau = 9/10 keeps every bound in exact integer arithmetic (the driver
# corpus is heavily templated — at tau=0.5 three quarters of ALL pairs
# qualify and the filter prunes nothing, so the near-dup threshold sits
# where the distribution actually separates):
#   required overlap   : J(a,b) >= t  =>  |a∩b| >= t * max(|a|,|b|)
#   prefix length      : p = |T| - ceil(9*|T|/10) + 1 = |T| - (9*|T|+9) DIV 10 + 1
#   length filter      : min(|a|,|b|) >= t * max(|a|,|b|)  <=>  10*min >= 9*max
# Proof sketch (standard PPJoin argument): order all tokens by a single
# global total order (document frequency asc, token asc — rarest first).
# If |a∩b| >= ceil(t*|T|) for both sides, a and b cannot each avoid the
# other inside their first |T| - ceil(t*|T|) + 1 ordered tokens, so any
# qualifying pair shares at least one *prefix* token and survives the
# prefix equi-join. Verification on full token arrays is exact, so the
# result is identical to the brute-force oracle — the filter only prunes
# the candidate space, never the answer.

# The oracle computes intersections through the inverted index (a
# posting-list equi-join — work ∝ sum(df²), bounded because shingle df is
# tiny) instead of walking C(n,2): J >= 0.9 implies a shared shingle, so
# restricting to pairs with i > 0 loses nothing. Same exact result, an
# independently-structured computation.
_PFX_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[j + 1] || ' ' || ws[j + 2] || ' ' || ws[j + 3] AS g
  FROM (SELECT doc_id, ws, unnest(range(0, greatest(len(ws) - 2, 0))) AS j
        FROM w)
),
sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
i AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS BIGINT) AS n_common,
       round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 4) AS jaccard
FROM i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.9
"""


def _doc_token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DISTINCT word-3-gram shingle sets. Shingles, not unigrams:
    the driver corpus is built from a ~31-word template vocabulary, so
    unigram sets make every token a stop token (df ≈ n) and the prefix
    filter degenerates toward C(n,2) — measured 48 s at sf0.1. The shingle
    vocabulary is ~27k with max df 25 at sf0.1: postings are short, the
    rarest-first prefix actually prunes, and the same feature space feeds
    the MinHash tier (pipeline.py), so estimates and exact pairs align.

    No ensure_parallelism: the explode itself fans out the work, and a
    pre-repartition of the wide text column costs more than it buys at
    bench SF (the cosine_topk_bruteforce argument); at scale the parquet
    scan has thousands of splits anyway."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    return ws.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN "
                "transform(sequence(0, size(ws) - 3), "
                "j -> concat_ws(' ', ws[j], ws[j+1], ws[j+2])) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("toks"),
    )


def _doc_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skinny (doc_id, shingle) posting relation — materialized once
    (lineage-cut checkpoint), because it is the base of FOUR consumers
    (df table, prefix build, and both sides of the verification join);
    uncached, Spark recomputes the shingle explode per consumer and the
    string work dominates the query. (A lineage-cut checkpoint variant was
    measured and reverted — see the tfidf posting-table comment below:
    the cut costs AQE stats and broadcast decisions downstream; eviction
    pressure is instead eliminated at the harness, which clears plan
    caches between queries.)"""
    d = _doc_token_sets(spark, sf_dir)
    return d.select("doc_id", F.explode("toks").alias("tok")).cache()


def _prefix_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from the rarest-token prefix join —
    a provable superset of every pair with J >= 0.9, and the relation
    whose size (<< C(n,2)) is the point of the filter
    (tests/test_similarity_quality.py pins the pruning)."""
    toks = _doc_postings(spark, sf_dir)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # one global total order: (df asc, tok asc). Per-doc prefix = one
    # row_number window over the doc's postings in that order — a single
    # doc_id exchange whose partitions are posting-list-sized (AQE turns
    # the df-table join into a broadcast at bench SF; at vocab scale it is
    # an ordinary equi-join). This replaces a collect_list/array_sort/
    # slice/re-explode chain that built per-doc struct arrays only to
    # flatten them again (~1 s slower at sf0.1).
    w_rank = Window.partitionBy("doc_id").orderBy("df", "tok")
    w_sz = Window.partitionBy("doc_id")
    pref = (
        toks.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("sz", F.count(F.lit(1)).over(w_sz))
        .filter(
            F.col("rn")
            <= F.col("sz") - F.expr("(9 * sz + 9) DIV 10") + F.lit(1)
        )
        .select("doc_id", "sz", "tok")
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"), "tok"
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"), "tok"
    )
    return (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter: a true pair needs 10*min(|a|,|b|) >= 9*max(|a|,|b|)
        .filter(
            F.lit(10) * F.least("sz_a", "sz_b")
            >= F.lit(9) * F.greatest("sz_a", "sz_b")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


@register(
    "prefix_filter_jaccard_pairs",
    oracle=_PFX_ORACLE,
    tags=("pipeline", "dedup", "jaccard", "prefix-filter"),
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide shingle-set Jaccard pairs (J >= 0.9) with PPJoin-style
    prefix filtering. The oracle recomputes every intersection through the
    inverted index; this plan additionally prefix-prunes: candidates
    come from an equi-join of rarest-shingle
    prefixes (plus the 10*min>=9*max length filter), then only candidates
    are verified with exact intersections — computed RELATIONALLY from the
    cached posting table (candidate ⋈ postings_a ⋈ postings_b on shingle),
    so verification work is candidate-tokens, stays skinny/codegen, and
    never materializes per-doc arrays twice. Every stage is linear in the
    posting lists — the quadratic blowup of a naive self-join is
    structurally impossible, and unlike LSH there are no false negatives."""
    toks = _doc_postings(spark, sf_dir)
    sz = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cand = _prefix_candidates(spark, sf_dir)
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    u = F.col("sz_a") + F.col("sz_b") - F.col("i")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.col("i").cast("long"))
        .withColumn("jac_exact", F.col("i").cast("double") / u)
        # filter on the EXACT ratio (identical rationals in both engines),
        # round only for display — rounding before the filter would admit
        # J in [0.89995, 0.9) pairs the prefix bound does not guarantee.
        .filter(F.col("jac_exact") >= 0.9)
        .select(
            "doc_a", "doc_b", "n_common", F.round("jac_exact", 4).alias("jaccard")
        )
    )


# ---------------------------------------------------------------------------
# tfidf_cosine_topk — inverted-index sparse cosine, integer-exact weights
# ---------------------------------------------------------------------------
# Weights are integer-scaled inverse document frequency:
#   idf_s = (N * 1000) DIV df        (BIGINT — no libm, no cross-engine ulp)
#   w     = tf * idf_s               (tf = raw term count in the doc)
# Stop tokens (df > N DIV 10) are pruned from the index — the standard
# posting-list cap that bounds every join group (same role as winnow's
# stop-fingerprint df cap). Dot products and squared norms are sums of
# integer products accumulated exactly — decimal(38,0) in Spark, HUGEINT
# in the oracle — so they cannot drift or overflow at any corpus size;
# only the final ratio is a double.

_TFIDF_ORACLE = """
WITH n AS (SELECT count(*) AS n_docs FROM documents),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (
    SELECT doc_id, ws[j + 1] || ' ' || ws[j + 2] || ' ' || ws[j + 3] AS tok
    FROM (SELECT doc_id, ws, unnest(range(0, greatest(len(ws) - 2, 0))) AS j
          FROM w)
  )
  GROUP BY 1, 2
),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
post AS (
  SELECT t.doc_id, t.tok,
         t.tf * ((n.n_docs * 1000) // d.df) AS w
  FROM tf t, dfreq d, n
  WHERE t.tok = d.tok AND d.df <= n.n_docs // 10
),
nrm AS (
  SELECT doc_id, sqrt(CAST(sum(CAST(w AS HUGEINT) * w) AS DOUBLE)) AS nrm
  FROM post GROUP BY 1
),
dot AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(CAST(a.w AS HUGEINT) * b.w) AS DOUBLE) AS dot
  FROM post a JOIN post b ON a.tok = b.tok AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.doc_a, d.doc_b,
         round(d.dot / (na.nrm * nb.nrm), 4) AS cos_sim,
         row_number() OVER (
           PARTITION BY d.doc_a
           ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.doc_b
         ) AS rn
  FROM dot d
  JOIN nrm na ON na.doc_id = d.doc_a
  JOIN nrm nb ON nb.doc_id = d.doc_b
)
SELECT doc_a, doc_b, cos_sim, CAST(rn AS BIGINT) AS rn
FROM scored WHERE rn <= 3
"""


@register(
    "tfidf_cosine_topk",
    oracle=_TFIDF_ORACLE,
    tags=("pipeline", "similarity", "tfidf"),
)
def tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical cosine top-3 per document through an inverted index
    over word-3-gram shingle features: integer-scaled idf weights (exact —
    no transcendental functions to disagree across engines), stop shingles
    dropped by the df cap so the widest posting list is df_cap entries,
    pairwise dot products built by a posting-list self-join. Complements the dense-embedding cosine ops
    (`cosine_topk_bruteforce`, `ann_ivf_topk`): same contract, lexical
    feature space. DECIMAL(38,0) accumulators keep sums exact at any
    scale; the per-doc_a top-k window runs over candidate pairs (already
    sub-quadratic thanks to the df cap), not the corpus."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # corpus size as a broadcast scalar agg — no driver collect, stays lazy
    n1 = docs.agg(F.count("*").alias("n_docs"))
    # word-3-gram shingle features (the corpus' unigram vocabulary is a
    # ~31-token template set — unigram tf-idf is degenerate; shingles give
    # the same feature space the MinHash tier fingerprints)
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    tf = (
        ws.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 3 THEN "
                    "transform(sequence(0, size(ws) - 3), "
                    "j -> concat_ws(' ', ws[j], ws[j+1], ws[j+2])) "
                    "ELSE CAST(array() AS ARRAY<STRING>) END"
                )
            ).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    post = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n1))
        .filter(F.col("df") <= F.expr("n_docs DIV 10"))
        .withColumn(
            # true integer DIV (not double-divide-then-truncate: a 0.5-ulp
            # round-up across an integer boundary would break exactness)
            "w",
            F.expr("tf * ((n_docs * 1000) DIV df)"),
        )
        .select("doc_id", "tok", "w")
        # three consumers (norms + both sides of the dot-product join) —
        # cached for the same reason as _doc_postings: uncached, the
        # shingle-tf build recomputes per consumer and dominates the wall.
        # A lineage-cut localCheckpoint under the cache was tried (r7) to
        # make eviction structurally unable to recompute the explode, and
        # REVERTED on measurement: the cut discards AQE runtime stats, the
        # downstream norm joins lose their broadcast, and steady-state
        # consumption ran 2x slower (save 3.3 s vs 1.5 s at sf0.1, warm
        # same-process A/B) — plus the checkpoint finalizes its upstream
        # stages at plan-build time, which would move the index build out
        # of bench's timer. Eviction-recompute is instead prevented where
        # it arose: bench.py clears ALL plan caches between queries, so no
        # sweep-wide storage pressure exists to evict this one (VERDICT r6
        # task 1/4).
        .cache()
    )
    # products via decimal(19,0) factors -> exact decimal(38,0) sums (the
    # oracle uses HUGEINT for the same exactness); DOUBLE only at the end
    wd = F.col("w").cast("decimal(19,0)")
    nrm = post.groupBy("doc_id").agg(
        F.sqrt(F.sum(wd * wd).cast("double")).alias("nrm")
    )
    pa = post.select(F.col("doc_id").alias("doc_a"), "tok", F.col("w").alias("wa"))
    pb = post.select(F.col("doc_id").alias("doc_b"), "tok", F.col("w").alias("wb"))
    dot = (
        pa.join(pb, "tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.col("wa").cast("decimal(19,0)") * F.col("wb").cast("decimal(19,0)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b"))
    scored = (
        dot.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("score", F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")))
    )
    w = Window.partitionBy("doc_a").orderBy(F.desc("score"), F.asc("doc_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_a", "doc_b", F.round("score", 4).alias("cos_sim"), "rn")
    )
