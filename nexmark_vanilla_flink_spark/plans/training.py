"""Training-data-preparation operators, round 6 — the feature/example
generation classes that sit between the curation core (plans/curation.py,
plans/pipeline.py) and an actual training run (no reference counterpart;
the reference stops at analytics):

  * ``interval_overlap_join`` — pure range-range join between two
    fact-sized interval sets via coarse time-bucket equi-join (the scale
    pattern that keeps Spark off BroadcastNestedLoopJoin);
  * ``skipgram_pairs``       — (center, context) co-occurrence counts
    over per-user event sequences (word2vec-style example generation);
  * ``bpe_pair_counts``      — adjacent-symbol pair frequencies within
    words (one BPE-merge iteration of tokenizer training);
  * ``hard_negative_mining`` — per query embedding, the nearest
    cross-label vectors + triplet margin against the nearest same-label
    vector (contrastive-training example mining).

Determinism discipline follows registry.py: integer epoch-micros, exact
integer bucket arithmetic, round() before any float leaves the plan, and
identical aliases in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.tables import load_table
from ..operators.artifacts import register_artifact
from .registry import register

# ---------------------------------------------------------------------------
# interval_overlap_join — bucketed fact-fact range join
# ---------------------------------------------------------------------------

_IVL_DAY_US = 86_400_000_000
_IVL_BUCKET_US = 21_600_000_000  # 6 h coarse buckets
_IVL_HALF_US = 1_800_000_000  # incidents span ±30 min

_IVL_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
),
act AS (
  SELECT user_id, us // {_IVL_DAY_US} AS day,
         min(us) AS a_start, max(us) AS a_end
  FROM e GROUP BY 1, 2
),
inc AS (
  SELECT event_id AS incident_id,
         us - {_IVL_HALF_US} AS i_start, us + {_IVL_HALF_US} AS i_end
  FROM e WHERE event_type = 'error'
)
SELECT i.incident_id,
       CAST(count(*) AS BIGINT) AS n_user_days,
       CAST(sum(least(a.a_end, i.i_end) - greatest(a.a_start, i.i_start))
            AS BIGINT) AS total_overlap_us
FROM inc i JOIN act a
  ON a.a_start <= i.i_end AND i.i_start <= a.a_end
GROUP BY 1
"""


@register(
    "interval_overlap_join",
    oracle=_IVL_ORACLE,
    tags=("training", "range-join", "interval"),
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range-range join with NO equi key: per-user daily activity
    spans [min_us, max_us] against global incident windows (each 'error'
    event ± 30 min) — which user-days were active during which incidents,
    aggregated per incident. The interval-overlap class (temporal
    correlation, ad attribution, downtime blast radius) that naive SQL
    plans as a quadratic nested-loop join.

    Scale pattern: both interval sets EXPLODE into coarse 6 h time
    buckets, equi-join on the bucket (hash-partitionable — this is what
    keeps the plan off BroadcastNestedLoopJoin when neither side fits a
    broadcast), post-filter the exact overlap predicate, and count each
    pair exactly once by keeping only its FIRST shared bucket — for
    overlapping intervals, max(start_bucket_a, start_bucket_i) lies in
    both bucket ranges, so the dedup needs no distinct. Shuffle volume is
    rows × buckets-per-interval (≤ 5 for a day-span at 6 h buckets), not
    rows²; the oracle runs DuckDB's native IEJoin over the same
    intervals."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts_ns DIV 1000").alias("us"),
    )
    act = (
        ev.groupBy(
            "user_id", F.expr(f"us DIV {_IVL_DAY_US}").alias("day")
        )
        .agg(F.min("us").alias("a_start"), F.max("us").alias("a_end"))
        .withColumn(
            "b",
            F.explode(
                F.sequence(
                    F.expr(f"a_start DIV {_IVL_BUCKET_US}"),
                    F.expr(f"a_end DIV {_IVL_BUCKET_US}"),
                )
            ),
        )
    )
    inc = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            (F.col("us") - _IVL_HALF_US).alias("i_start"),
            (F.col("us") + _IVL_HALF_US).alias("i_end"),
        )
        .withColumn(
            "b",
            F.explode(
                F.sequence(
                    F.expr(f"i_start DIV {_IVL_BUCKET_US}"),
                    F.expr(f"i_end DIV {_IVL_BUCKET_US}"),
                )
            ),
        )
    )
    joined = (
        inc.join(act, "b")
        .filter(
            (F.col("a_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("a_end"))
            # first-shared-bucket dedup: exactly one bucket per pair
            & (
                F.col("b")
                == F.greatest(
                    F.expr(f"a_start DIV {_IVL_BUCKET_US}"),
                    F.expr(f"i_start DIV {_IVL_BUCKET_US}"),
                )
            )
        )
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum(
            F.least("a_end", "i_end") - F.greatest("a_start", "i_start")
        ).alias("total_overlap_us"),
    )


# ---------------------------------------------------------------------------
# skipgram_pairs — word2vec-style (center, context) example generation
# ---------------------------------------------------------------------------

_SKIP_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS et,
         lead(event_type, 1) OVER w AS l1,
         lead(event_type, 2) OVER w AS l2
  FROM (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us, event_id
        FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
pairs AS (
  SELECT et AS center, l1 AS context FROM seq WHERE l1 IS NOT NULL
  UNION ALL
  SELECT l1 AS center, et AS context FROM seq WHERE l1 IS NOT NULL
  UNION ALL
  SELECT et AS center, l2 AS context FROM seq WHERE l2 IS NOT NULL
  UNION ALL
  SELECT l2 AS center, et AS context FROM seq WHERE l2 IS NOT NULL
)
SELECT center, context, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY 1, 2
"""


@register(
    "skipgram_pairs",
    oracle=_SKIP_ORACLE,
    tags=("training", "sequence", "window-function"),
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts over per-user event sequences
    (window ±2, symmetric) — the example-generation pass of
    word2vec-style embedding training, applied to behavioral sequences.

    Scale: ONE exchange on user_id for the sequence window (per-user
    sort, never global); the ±2 context pairs are emitted in-row via
    lead() + an array explode (no self-join on sequence index, which
    would shuffle the corpus once per offset), and the final pair count
    partial-aggregates map-side over a tiny (center, context) key
    space."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts_ns DIV 1000").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("et"),
        F.lead("event_type", 1).over(w).alias("l1"),
        F.lead("event_type", 2).over(w).alias("l2"),
    )
    pair = F.explode(
        F.array_compact(
            F.array(
                F.when(
                    F.col("l1").isNotNull(),
                    F.struct(
                        F.col("et").alias("center"), F.col("l1").alias("context")
                    ),
                ),
                F.when(
                    F.col("l1").isNotNull(),
                    F.struct(
                        F.col("l1").alias("center"), F.col("et").alias("context")
                    ),
                ),
                F.when(
                    F.col("l2").isNotNull(),
                    F.struct(
                        F.col("et").alias("center"), F.col("l2").alias("context")
                    ),
                ),
                F.when(
                    F.col("l2").isNotNull(),
                    F.struct(
                        F.col("l2").alias("center"), F.col("et").alias("context")
                    ),
                ),
            )
        )
    ).alias("p")
    return (
        seq.select(pair)
        .select("p.center", "p.context")
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# bpe_pair_counts — one BPE-merge iteration of tokenizer training
# ---------------------------------------------------------------------------

_BPE_MIN_CNT = 5

_BPE_ORACLE = f"""
WITH w AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS wd
  FROM documents
),
p AS (
  SELECT unnest(list_transform(range(1, length(wd)),
                               j -> substr(wd, CAST(j AS INT), 2))) AS pair
  FROM w WHERE length(wd) >= 2
)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY 1 HAVING count(*) >= {_BPE_MIN_CNT}
"""


@register(
    "bpe_pair_counts",
    oracle=_BPE_ORACLE,
    tags=("training", "tokenizer", "text"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-symbol pair frequencies within words — the counting pass
    of ONE byte-pair-encoding merge iteration (the inner loop of
    tokenizer training: the argmax pair becomes the next merge rule; the
    full trainer repeats this plan with the growing merge table applied,
    the operators/graph.py bounded-loop pattern).

    Scale: corpus scans once; word split + per-word pair explode are
    JVM codegen (split + transform(sequence) HOF, no Python); the only
    exchange carries partial counts over the ≤ 26² pair key space —
    map-side combine collapses it to near-nothing regardless of corpus
    size. The HAVING floor bounds the output."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("wd")
    ).filter(F.length("wd") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(wd) - 1), j -> substring(wd, j, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _BPE_MIN_CNT)
    )


# ---------------------------------------------------------------------------
# hard_negative_mining — contrastive-training example mining
# ---------------------------------------------------------------------------

_HNM_TOPK = 3

# The oracle re-derives the IVF index (√N centroids, nearest-centroid
# assignment, 2-probe candidate lists) exactly like ann_ivf_topk's oracle,
# then mines positives/negatives over the candidate set — the
# fresh-derivation twin of the artifact-served Spark plan below.
# The shared CTEs are MATERIALIZED: plain CTEs are inlined per consumer,
# and `ac` (the N·√N coarse-assignment frame, 2.8 M rows of list dot
# products at 10×) is referenced twice — un-materialized, the r10 sweep
# watched DuckDB grind this oracle past 35 minutes at 53 GB RSS while
# the structurally identical ann_ivf_topk oracle (one `ac` consumer)
# finished in ~13 s. Materialization is an execution hint, not a
# semantic change — the result relation is identical.
_HNM_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS MATERIALIZED (
  SELECT vec_id, label, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
c AS MATERIALIZED (
  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM n
  WHERE vec_id % (SELECT GREATEST(1, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM e) = 0
),
ac AS MATERIALIZED (
  SELECT a.vec_id, c.c_id,
         round(list_aggregate(list_transform(list_zip(a.v, c.cv), s -> s[1] * s[2]), 'sum')
               / (a.nrm * c.cnrm), 6) AS cs
  FROM n a CROSS JOIN c
),
assign AS MATERIALIZED (
  SELECT vec_id, c_id FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
    FROM ac
  ) WHERE rn = 1
),
probes AS MATERIALIZED (
  SELECT vec_id AS q_id, c_id FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id) AS rn
    FROM ac WHERE vec_id % 50 = 0
  ) WHERE rn <= 2
),
cand AS MATERIALIZED (
  SELECT p.q_id, a.vec_id FROM probes p
  JOIN assign a ON a.c_id = p.c_id AND a.vec_id <> p.q_id
),
s AS MATERIALIZED (
  SELECT cand.q_id, q.label AS q_label, cand.vec_id, d.label,
         round(list_aggregate(list_transform(list_zip(q.v, d.v), z -> z[1] * z[2]), 'sum')
               / (q.nrm * d.nrm), 6) AS cos_sim
  FROM cand
  JOIN n q ON q.vec_id = cand.q_id
  JOIN n d ON d.vec_id = cand.vec_id
),
pos AS (
  SELECT q_id, max(cos_sim) AS pos_sim
  FROM s WHERE label = q_label GROUP BY 1
),
neg AS (
  SELECT q_id, vec_id AS neg_id, cos_sim AS neg_sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id) AS neg_rank
  FROM s WHERE label <> q_label
)
SELECT n.q_id, n.neg_id, CAST(n.neg_rank AS INT) AS neg_rank, n.neg_sim,
       p.pos_sim, round(p.pos_sim - n.neg_sim, 6) AS margin
FROM neg n JOIN pos p ON p.q_id = n.q_id
WHERE n.neg_rank <= {_HNM_TOPK}
"""


@register(
    "hard_negative_mining",
    oracle=_HNM_ORACLE,
    tags=("training", "similarity", "contrastive", "ann"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-mined contrastive-training examples: for each query embedding
    (vec_id % 50 == 0), retrieve its IVF probe candidate set (2 nearest
    centroids' inverted lists, served from the materialized ``ivf_index``
    artifact — the exact probe path ``ann_ivf_topk`` serves), then emit the
    3 most-similar CROSS-label candidates (hard negatives) plus the best
    same-label candidate similarity and the triplet margin
    (pos_sim − neg_sim). This is how production retrieval-training
    pipelines mine hard negatives (ANN-retrieved, not exhaustive — the
    pre-r10 registered form scanned the full corpus per query, which the
    10× scale sweep measured at 93 s / 177× growth: O(N²/50) by spec;
    docs/scaling_r9.json).

    Scale: probe selection is (queries × nlist) with nlist ≈ √N; each
    query then scores ~2·N/nlist ≈ 2√N candidates through stream-static
    equi-joins against the artifact frames — N^1.5/50 total, the same
    asymptotics as the serving path, with the N·√N coarse assignment paid
    once offline in the index build (artifact_build_sec)."""
    from ..operators.artifacts import read_artifact_table
    from .pipeline import _ivf_index_dir

    adir = _ivf_index_dir(spark, sf_dir)
    n = read_artifact_table(spark, adir, "normed")
    c = read_artifact_table(spark, adir, "centroids")
    assign = read_artifact_table(spark, adir, "assign")
    dot_vc = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    qn_sub = n.filter(F.col("vec_id") % 50 == 0)
    qc = qn_sub.crossJoin(broadcast(c)).select(
        "vec_id",
        "c_id",
        F.round(dot_vc / (F.col("nrm") * F.col("cnrm")), 6).alias("cs"),
    )
    w_vc = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("c_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w_vc))
        .filter(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("q_id"), "c_id")
    )
    cand = broadcast(probes).join(assign, "c_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
    qv = qn_sub.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    dot_qd = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    s = (
        cand.join(n, "vec_id")
        .join(broadcast(qv), "q_id")
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(dot_qd / (F.col("qn") * F.col("nrm")), 6).alias("cos_sim"),
        )
    )
    pos = (
        s.filter(F.col("label") == F.col("q_label"))
        .groupBy("q_id")
        .agg(F.max("cos_sim").alias("pos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    neg = (
        s.filter(F.col("label") != F.col("q_label"))
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= _HNM_TOPK)
        .select(
            "q_id",
            F.col("vec_id").alias("neg_id"),
            F.col("neg_rank").cast("int").alias("neg_rank"),
            F.col("cos_sim").alias("neg_sim"),
        )
    )
    return neg.join(broadcast(pos), "q_id").select(
        "q_id",
        "neg_id",
        "neg_rank",
        "neg_sim",
        "pos_sim",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
    )


# ---------------------------------------------------------------------------
# skipgram_pairs_stream_replay — online example generation
# ---------------------------------------------------------------------------


@register(
    "skipgram_pairs_stream_replay",
    oracle=_SKIP_ORACLE,  # identical output contract to the batch pass
    tags=("streaming", "training", "sequence", "stateful"),
)
def skipgram_pairs_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skip-gram example generator UNDER STREAMING EXECUTION — mine
    (center, context) pairs from the live clickstream as each event is
    watermark-finalized, instead of a nightly batch window pass. Keyed
    state is TWO strings per user (the ±2 predecessors) plus the
    watermark-lag pending buffer; pairs append incrementally
    (immutable-on-emit) and the flush sentinel settles the final lag.
    The replayed pairs aggregate to EXACTLY the batch counts, so the
    streaming path shares the batch oracle verbatim (caller-side
    count reduction, the qx_winning_bids_stream contract)."""
    from ..streaming.runner import run_available_now
    from ..streaming.stateful import skipgram_stateful_counted
    from .linkage import _sentinel_event_stream

    stream, flush_ms = _sentinel_event_stream(spark, sf_dir)
    out = run_available_now(
        # counted bucketed twin (r11): same fold, pairs pre-counted at
        # the operator boundary (the event-type vocabulary collapses
        # ~400 K raw pairs to <=25 distinct rows per bucket — map-side
        # combine where the data is); count parity with the raw bucketed
        # twin AND the per-key replica `skipgram_stateful` pinned by
        # tests/test_bucketed_stateful.py
        skipgram_stateful_counted(stream, flush_ms),
        output_mode="append",
        # the sentinel end-of-input fast path flushes in the data batch
        # (streaming/stateful.py::bucketed_stateful, r11) — no timers
        # remain armed, so the trailing no-data batch is pure cost
        no_data_batch=False,
        # state partitions: replay_state_partitions() default (8 local
        # since r11, env-overridable) — the old explicit pin duplicated it
    )
    return out.groupBy("center", "context").agg(
        F.sum("cnt").alias("cnt")
    )


# ---------------------------------------------------------------------------
# temporal_holdout_splits — time-based train/val/test partitioning
# ---------------------------------------------------------------------------

_THS_TRAIN_PCT = 70
_THS_VAL_PCT = 85  # train < t1 <= val < t2 <= test

_THS_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
),
bounds AS (
  SELECT min(us) AS mn, max(us) AS mx FROM e
),
cut AS (
  SELECT mn + (mx - mn) * {_THS_TRAIN_PCT} // 100 AS t1,
         mn + (mx - mn) * {_THS_VAL_PCT} // 100 AS t2
  FROM bounds
)
SELECT CASE WHEN e.us < c.t1 THEN 'train'
            WHEN e.us < c.t2 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(min(e.us) AS BIGINT) AS min_us,
       CAST(max(e.us) AS BIGINT) AS max_us
FROM e CROSS JOIN cut c
GROUP BY 1
"""


@register(
    "temporal_holdout_splits",
    oracle=_THS_ORACLE,
    tags=("training", "splits", "temporal"),
)
def temporal_holdout_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/val/test holdout — the split discipline for
    forecasting/recommendation training where random splits leak the
    future into the past: cutoffs at 70% / 85% of the observed time span
    (pure integer arithmetic, engine-identical), events partitioned by
    event time only. Completes the splits family beside the hash-based
    ``deterministic_splits`` and the cluster-aware ``leakage_safe_splits``.

    Scale: the span bounds are ONE scalar aggregate broadcast back over
    the corpus (crossJoin(broadcast) — the q11/q15 de-funnel pattern,
    never a global window); the corpus then scans once into a 3-key
    map-side-combined aggregate. The distinct-user count per split is
    the only real exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("us")
    )
    cut = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).select(
        F.expr(f"mn + (mx - mn) * {_THS_TRAIN_PCT} DIV 100").alias("t1"),
        F.expr(f"mn + (mx - mn) * {_THS_VAL_PCT} DIV 100").alias("t2"),
    )
    tagged = ev.crossJoin(broadcast(cut)).select(
        "user_id",
        "us",
        F.when(F.col("us") < F.col("t1"), "train")
        .when(F.col("us") < F.col("t2"), "val")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("us").alias("min_us"),
        F.max("us").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# bpe_learn_merges — the full iterative BPE trainer
# ---------------------------------------------------------------------------

_BPEL_ITERS = 6
_BPEL_MIN_FREQ = 25

# Symbol sequences travel as "(s1)(s2)...(sn)" strings: each symbol is
# individually delimited, so applying merge (a, b) is a plain non-regex
# replace of "(a)(b)" with "(ab)" — and because `replace` substitutes
# NON-OVERLAPPING occurrences left-to-right in both engines, it implements
# exactly the classic BPE merge pass ("(a)(a)(a)" + (a,a) -> "(aa)(a)").
# Adjacent pairs come from zipping the symbol list against itself shifted
# by one (slice [:-1] x slice [2:]) — no overlapping-regex extraction.

_BPEL_ORACLE_HEAD = r"""
WITH w AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS wd
  FROM documents
),
vc AS (
  SELECT wd, CAST(count(*) AS BIGINT) AS cnt
  FROM w WHERE length(wd) >= 2 GROUP BY wd
),
v0 AS (SELECT regexp_replace(wd, '(.)', '(\1)', 'g') AS rep, cnt FROM vc)
"""

_BPEL_ORACLE_ITER = """,
p{i} AS (
  SELECT unnest(l[:-2]) AS a, unnest(l[2:]) AS b, cnt
  FROM (SELECT str_split(substr(rep, 2, length(rep) - 2), ')(') AS l, cnt
        FROM v{p})
),
m{i} AS (
  SELECT a, b FROM p{i} GROUP BY a, b ORDER BY SUM(cnt) DESC, a, b LIMIT 1
),
v{i} AS (
  SELECT replace(rep, '(' || m.a || ')(' || m.b || ')',
                 '(' || m.a || m.b || ')') AS rep, cnt
  FROM v{p} CROSS JOIN m{i} m
)"""

_BPEL_ORACLE_TAIL = f"""
SELECT tok, CAST(SUM(cnt) AS BIGINT) AS freq
FROM (SELECT unnest(str_split(substr(rep, 2, length(rep) - 2), ')(')) AS tok,
             cnt
      FROM v{_BPEL_ITERS})
WHERE length(tok) >= 2
GROUP BY tok
HAVING CAST(SUM(cnt) AS BIGINT) >= {_BPEL_MIN_FREQ}
"""

_BPEL_ORACLE = (
    _BPEL_ORACLE_HEAD
    + "".join(
        _BPEL_ORACLE_ITER.format(i=i, p=i - 1)
        for i in range(1, _BPEL_ITERS + 1)
    )
    + _BPEL_ORACLE_TAIL
)

_BPEL_SYMS = "split(substring(rep, 2, length(rep) - 2), '\\\\)\\\\(')"


@register_artifact("bpe_vocab")
def _bpe_vocab_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the learned merge table ONCE per corpus state — the
    `_corpus_index_dir` deployment shape (plans/curation.py): a production
    tokenizer is trained once and its merge table shipped as an artifact;
    re-learning the merges inside every consumer (the r7 shape — 6 argmax
    `collect()` barriers per entry per run, VERDICT r7 "What's wrong" #1)
    re-pays training on every encode. Keying, staging/atomic-publish, and
    build-time logging live in the shared helper
    (operators/artifacts.py) — the logic `version` carries the iteration
    count and a spec revision, so changing `_BPEL_ITERS`, the tie-break,
    or the merge-apply logic can never serve a stale artifact from a warm
    host (ADVICE r8 medium)."""
    from ..operators.artifacts import artifact_dir, write_artifact_table

    def _build(stage: str) -> None:
        merged, cached_base = _bpe_learn_loop(spark, sf_dir)
        write_artifact_table(merged, stage, "vocab")
        cached_base.unpersist()

    return artifact_dir(
        spark,
        sf_dir,
        name="bpe_vocab",
        version=f"v1-i{_BPEL_ITERS}-f{_BPEL_MIN_FREQ}",
        source_table="documents",
        build=_build,
    )


def _bpe_merged_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table (wd, rep, cnt), read from the materialized
    per-corpus artifact — see `_bpe_vocab_dir`."""
    from ..operators.artifacts import read_artifact_table

    return read_artifact_table(spark, _bpe_vocab_dir(spark, sf_dir), "vocab")


def _bpe_learn_loop(spark: SparkSession, sf_dir: str):
    """The trainer's merge loop (runs once per corpus state, inside
    `_bpe_vocab_dir`'s materialization): the distinct-word frequency table
    carrying (wd, rep, cnt), with `rep` rewritten through the 6 greedy
    merges. `wd` rides along untouched so the encoder can join documents
    back to their merged representations — the trainer simply ignores it.
    Returns (merged_vocab_df, cached_base_df) so the caller can unpersist
    the loop's working cache after materializing."""
    docs = load_table(spark, sf_dir, "documents")
    cur = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("wd")
        )
        .filter(F.length("wd") >= 2)
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("wd", F.regexp_replace("wd", "(.)", "($1)").alias("rep"), "cnt")
        .cache()
    )
    base = cur
    # SIZE-DERIVED TRAINER SWITCH (r12, VERDICT r11 task 6): the merge loop
    # iterates over the distinct-WORD frequency table, not the corpus — the
    # standard tokenizer-trainer shape (sentencepiece/HF BPE collapse the
    # corpus to word counts distributed, then train the merges single-node
    # over that bounded table). When the vocab fits the driver (cap
    # overridable via SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP; even a web-scale
    # corpus's lowercase-alpha vocab is tens of millions of rows), the six
    # greedy merges run in pure Python: pair sums are exact ints, the
    # argmax tie-break (s DESC, a ASC, b ASC) is the same tuple order, and
    # str.replace substitutes non-overlapping left-to-right exactly like
    # Spark/DuckDB replace — bit-identical merges without six
    # pair-explode + argmax job barriers per build. The distributed
    # per-merge loop below remains the over-cap branch.
    cap = int(os.environ.get("SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP", "2000000"))
    # branch decision by count(), NOT by collecting cap+1 rows (VERDICT r12
    # task 5: the old limit(cap+1).collect() probe shipped up to 2M rows to
    # the driver even when the answer was "take the distributed branch" —
    # a pointless ~100 MB driver transfer at scale). count() materializes
    # the cache and moves one long; rows are collected only on the branch
    # that actually needs them.
    if cur.count() <= cap:
        words = [(r["wd"], r["rep"], r["cnt"]) for r in cur.collect()]
        for _ in range(_BPEL_ITERS):
            pc: dict[tuple[str, str], int] = {}
            for _wd, rep, cnt in words:
                syms = rep[1:-1].split(")(")
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + cnt
            if not pc:
                break
            (a, b), _s = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            pat, rep_to = f"({a})({b})", f"({a}{b})"
            words = [
                (wd, rep.replace(pat, rep_to), cnt) for wd, rep, cnt in words
            ]
        merged = spark.createDataFrame(
            words, schema="wd string, rep string, cnt bigint"
        )
        return merged, base
    for _ in range(_BPEL_ITERS):
        pairs = (
            cur.withColumn("syms", F.expr(_BPEL_SYMS))
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "j -> struct(element_at(syms, j) AS a, "
                        "element_at(syms, j + 1) AS b))"
                    )
                ).alias("pr"),
                "cnt",
            )
            .groupBy("pr.a", "pr.b")
            .agg(F.sum("cnt").alias("s"))
        )
        top = pairs.orderBy(F.desc("s"), "a", "b").limit(1).collect()[0]
        cur = cur.select(
            "wd",
            F.expr(
                f"replace(rep, '({top['a']})({top['b']})', "
                f"'({top['a']}{top['b']})')"
            ).alias("rep"),
            "cnt",
        )
    return cur, base


@register(
    "bpe_learn_merges",
    oracle=_BPEL_ORACLE,
    tags=("training", "tokenizer", "text", "iterative"),
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL byte-pair-encoding trainer — ``bpe_pair_counts`` is one
    counting pass; this runs the actual merge loop: 6 rounds of
    (count adjacent pairs -> pick the most frequent pair, ties broken
    lexicographically -> rewrite every word with the pair fused), then
    reports the learned multi-character subword vocabulary with corpus
    frequencies. The classic trainer shape (Sennrich et al. 2016),
    expressed as a bounded driver loop over declarative plans — the
    kmeans_train/operators/graph.py pattern.

    Scale: the corpus is scanned ONCE, into the distinct-word frequency
    table (vocab is sub-linear in corpus size — the only state the BPE
    trainer ever needs); the 6 iterations run over that cached vocab
    only. Per iteration the sole driver action is the argmax pair —
    one row (the kmeans-centroid-collect justification); pair counting
    is a map-side-combined sum over the bounded pair key space; the
    merge apply is a JVM string `replace`, no Python. Final vocabulary
    aggregation is distributed with a frequency floor.

    r8 (VERDICT r7 task 3): the merge loop runs once per corpus state and
    its (wd, rep, cnt) result is materialized content-keyed
    (`_bpe_vocab_dir`); re-runs and the encoder read the artifact instead
    of re-paying 6 argmax driver barriers each — a production tokenizer
    ships its merge table, it doesn't re-train per consumer. The DuckDB
    oracle still re-learns per run (it is the correctness spec, not the
    deployment shape)."""
    cur = _bpe_merged_vocab(spark, sf_dir)
    return (
        cur.select(F.explode(F.expr(_BPEL_SYMS)).alias("tok"), "cnt")
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.sum("cnt").alias("freq"))
        .filter(F.col("freq") >= _BPEL_MIN_FREQ)
    )


# ---------------------------------------------------------------------------
# bpe_encode_stats — apply the learned tokenizer back to the corpus
# ---------------------------------------------------------------------------
# Completes the tokenizer story: bpe_pair_counts (one counting pass) ->
# bpe_learn_merges (the trainer) -> THIS (the encoder): every document's
# token count under the learned 6-merge BPE vocabulary, plus the
# tokens-per-word fertility ratio the tokenizer literature reports. The
# whole corpus is never re-tokenized row by row — encoding joins each
# document's (word, count) profile to the merged DISTINCT-WORD table, so
# encode work is vocab-sized plus one corpus join, the same sub-linear
# property that makes the trainer viable.

_BPEE_ORACLE_HEAD = r"""
WITH w AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS wd
  FROM documents
),
vc AS (
  SELECT wd, CAST(count(*) AS BIGINT) AS cnt
  FROM w WHERE length(wd) >= 2 GROUP BY wd
),
v0 AS (SELECT wd, regexp_replace(wd, '(.)', '(\1)', 'g') AS rep, cnt FROM vc)
"""

_BPEE_ORACLE_ITER = """,
p{i} AS (
  SELECT unnest(l[:-2]) AS a, unnest(l[2:]) AS b, cnt
  FROM (SELECT str_split(substr(rep, 2, length(rep) - 2), ')(') AS l, cnt
        FROM v{p})
),
m{i} AS (
  SELECT a, b FROM p{i} GROUP BY a, b ORDER BY SUM(cnt) DESC, a, b LIMIT 1
),
v{i} AS (
  SELECT wd, replace(rep, '(' || m.a || ')(' || m.b || ')',
                     '(' || m.a || m.b || ')') AS rep, cnt
  FROM v{p} CROSS JOIN m{i} m
)"""

_BPEE_ORACLE_TAIL = f""",
dw AS (
  SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS wd
        FROM documents)
  WHERE length(wd) >= 2 GROUP BY 1, 2
),
enc AS (
  SELECT wd,
         CAST(len(str_split(substr(rep, 2, length(rep) - 2), ')(')) AS BIGINT)
           AS n_sub
  FROM v{_BPEL_ITERS}
)
SELECT dw.doc_id,
       CAST(sum(dw.c) AS BIGINT) AS n_words,
       CAST(sum(dw.c * enc.n_sub) AS BIGINT) AS n_tokens,
       CAST((sum(dw.c * enc.n_sub) * 10000) // sum(dw.c) AS BIGINT)
         AS tokens_per_word_e4
FROM dw JOIN enc ON enc.wd = dw.wd
GROUP BY 1
"""

_BPEE_ORACLE = (
    _BPEE_ORACLE_HEAD
    + "".join(
        _BPEE_ORACLE_ITER.format(i=i, p=i - 1)
        for i in range(1, _BPEL_ITERS + 1)
    )
    + _BPEE_ORACLE_TAIL
)


@register(
    "bpe_encode_stats",
    oracle=_BPEE_ORACLE,
    tags=("training", "tokenizer", "text", "iterative"),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the learned BPE tokenizer: join
    each document's (word, count) profile against the merged vocabulary
    (shared with `bpe_learn_merges` via `_bpe_merged_vocab` — identical
    merges by construction) and report n_words, n_tokens and the
    tokens-per-word fertility as an exact scaled integer (x 10^4, no
    floats — the bigram_lm_doc_scores discipline). Words are the
    trainer's domain: lowercase letter runs of length >= 2.

    Scale: encode = one vocab-sized projection (symbols per merged word)
    + one corpus equi-join on the word key + one doc_id aggregation; the
    iterative work runs once per corpus state in `_bpe_vocab_dir` and the
    encoder reads the materialized merge table (r8, VERDICT r7 task 3)."""
    vocab = _bpe_merged_vocab(spark, sf_dir)
    enc = vocab.select(
        "wd", F.expr(f"size({_BPEL_SYMS})").cast("long").alias("n_sub")
    )
    docs = load_table(spark, sf_dir, "documents")
    dw = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("wd"),
        )
        .filter(F.length("wd") >= 2)
        .groupBy("doc_id", "wd")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        dw.join(enc, "wd")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).cast("long").alias("n_tokens"),
            F.expr("CAST((sum(c * n_sub) * 10000) DIV sum(c) AS BIGINT)").alias(
                "tokens_per_word_e4"
            ),
        )
    )
