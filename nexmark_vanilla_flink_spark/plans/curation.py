"""Corpus-curation operators, second tranche (no reference counterpart —
BASELINE.json north star): eval-set decontamination, sub-document (chunk)
dedup, domain mixing weights, and corpus-frequency rarity scoring. All run
over the driver's ``documents`` table and are DuckDB-oracled.

Determinism discipline matches `plans/pipeline.py`: md5 digests over explicit
strings, DECIMAL-exact ratios rounded at the end, integer counts everywhere
else.

Scale notes (the 100 TB postures):
  * decontamination scans the training corpus once and only matching n-gram
    rows ever shuffle; the eval side carries no broadcast hint (the synthetic
    stand-in is a corpus fraction) — AQE broadcasts it while small;
  * chunk dedup shuffles md5 digests — uniform keys, no skew — twice (digest
    agg + join back), both map-side combinable;
  * mixing weights aggregate to one row per (lang, source) before any
    global window step, so the share computation touches only the tiny
    aggregated frame;
  * bigram rarity joins the exploded corpus against the bigram-df vocabulary
    on the bigram digest — AQE broadcasts the df side when it is small and
    falls back to a uniform hash join when the vocabulary is huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.parallelism import ensure_parallelism
from ..sources.tables import load_table
from ..operators.artifacts import register_artifact
from .registry import register

# ---------------------------------------------------------------------------
# Eval-set decontamination (n-gram overlap against a held-out benchmark set)
# ---------------------------------------------------------------------------

# mod 17 / 4-gram chosen by measurement: non-empty, selective hit sets at
# every driver SF (35 / 38 / 2629 contaminated docs at sf0.001/0.01/0.1);
# 5-grams matched zero docs at sf0.01 (hollow gate) and 3-grams matched
# ~80% of the corpus (no selectivity)
_EVAL_MOD = 17  # doc_id % 17 == 0 → the deterministic "benchmark" subset
_DECON_N = 4  # 4-word shingles — see measurement note above


_DECON_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id,
         md5(ws[j + 1] || ' ' || ws[j + 2] || ' ' || ws[j + 3] || ' ' ||
             ws[j + 4]) AS h
  FROM (SELECT doc_id, ws,
               unnest(range(0, greatest(len(ws) - {_DECON_N - 1}, 0))) AS j
        FROM w)
),
eval_g AS (SELECT DISTINCT h FROM g WHERE doc_id % {_EVAL_MOD} = 0),
train_g AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % {_EVAL_MOD} <> 0)
SELECT t.doc_id, count(*) AS n_shared_ngrams
FROM train_g t JOIN eval_g e ON t.h = e.h
GROUP BY t.doc_id
"""


@register(
    "eval_decontamination",
    oracle=_DECON_ORACLE,
    tags=("pipeline", "dedup", "text"),
)
def eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination: flag training documents sharing any
    4-word shingle with the (deterministic) benchmark subset
    ``doc_id % 17 == 0``. Returns contaminated doc_ids with the count of
    distinct shared shingles — the rows a curation pipeline drops before
    training so eval numbers stay honest.

    Scale: a real eval side is tiny relative to the corpus (benchmarks are
    MBs at 100 TB corpus scale), so its distinct shingle digests broadcast
    and the join filters map-side. The SYNTHETIC stand-in here is a corpus
    FRACTION (doc_id % 17), which grows with the corpus — so no broadcast
    hint: AQE broadcasts while the eval side is under the threshold and
    falls back to a shuffled join when the stand-in outgrows it."""
    docs = load_table(spark, sf_dir, "documents")
    ws = ensure_parallelism(docs).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    # per-doc shingle dedup happens INSIDE the array (array_distinct) before
    # the explode — the alternative .distinct() on exploded rows is a full
    # shuffle of every shingle in the corpus
    g = ws.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"CASE WHEN size(ws) >= {_DECON_N} THEN "
                    f"transform(sequence(0, size(ws) - {_DECON_N}), "
                    "j -> md5(concat_ws(' ', ws[j], ws[j+1], ws[j+2], ws[j+3]))) "
                    "ELSE CAST(array() AS ARRAY<STRING>) END"
                )
            )
        ).alias("h"),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    # cross-doc distinct on the (small) eval side only
    eval_g = g.filter(is_eval).select("h").distinct()
    train_g = g.filter(~is_eval)
    return (
        train_g.join(eval_g, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# ---------------------------------------------------------------------------
# Sub-document (chunk-level) exact dedup
# ---------------------------------------------------------------------------

_CHUNK_W = 20  # tokens per chunk


_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
c AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(ws, j * {_CHUNK_W} + 1,
                                        (j + 1) * {_CHUNK_W}), ' ')) AS h
  FROM (SELECT doc_id, ws,
               unnest(range(0, CAST(ceil(len(ws) / {_CHUNK_W}.0) AS BIGINT))) AS j
        FROM w)
),
df AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM c GROUP BY h)
SELECT c.doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_chunks,
       round(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS shared_fraction
FROM c JOIN df ON c.h = df.h
GROUP BY c.doc_id
"""


@register(
    "chunk_dedup_stats",
    oracle=_CHUNK_ORACLE,
    tags=("pipeline", "dedup", "text"),
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: split each document into consecutive 20-token
    chunks, find chunks that appear (byte-identical) in MORE THAN ONE
    document, and report per document how much of it is corpus-shared
    boilerplate — the paragraph-level dedup signal (headers, license
    blocks, navigation chrome) that document-level dedup misses.

    Scale: exactly two shuffles on uniform keys — one exchange on the chunk
    digest where a dense_rank window counts distinct docs per digest (the
    exploded frame is derived ONCE; a groupBy-then-join-back shape would
    re-derive the whole explode+md5 stage on the join side because the
    partial-aggregate exchange cannot be reused), then the per-doc stats
    exchange. No skew (digests are uniform), no per-bucket collection —
    a boilerplate digest shared by millions of docs costs only a rank."""
    docs = load_table(spark, sf_dir, "documents")
    ws = ensure_parallelism(docs).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    c = ws.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(ws) / {_CHUNK_W}.0) AS INT) - 1), "
                f"j -> md5(concat_ws(' ', slice(ws, j * {_CHUNK_W} + 1, {_CHUNK_W}))))"
            )
        ).alias("h"),
    )
    # distinct-doc count per digest via one sorted window pass: dense_rank
    # over doc_id hits its max (= the distinct count) on the last row, read
    # back with an unbounded max over the same sort — one exchange, one sort
    wh = Window.partitionBy("h").orderBy("doc_id")
    whf = Window.partitionBy("h").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    counted = c.select(
        "doc_id",
        F.max(F.dense_rank().over(wh)).over(whf).alias("n_docs"),
    )
    shared = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    return counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        shared.alias("n_shared_chunks"),
        F.round(shared / F.count(F.lit(1)).cast("double"), 6).alias(
            "shared_fraction"
        ),
    )


# ---------------------------------------------------------------------------
# Domain mixing weights (per-source sampling rates toward a uniform target)
# ---------------------------------------------------------------------------

_MIX_ORACLE = """
WITH per_src AS (
  SELECT lang, source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
)
SELECT lang, source, n_docs, n_tokens,
       CAST(round(CAST(n_tokens AS DECIMAL(38, 12))
                  / sum(n_tokens) OVER (), 6) AS DOUBLE) AS token_share,
       CAST(round(CAST(sum(n_tokens) OVER () AS DECIMAL(38, 12))
                  / (count(*) OVER () * n_tokens), 6) AS DOUBLE) AS mix_weight
FROM per_src
"""


@register(
    "domain_mixing_weights",
    oracle=_MIX_ORACLE,
    tags=("pipeline", "text"),
)
def domain_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: per (lang, source) token counts, the domain's share of
    the corpus, and the up/down-sampling weight that would equalize token
    mass across domains (target = uniform) — the numbers a data-mixture
    sweep starts from.

    Scale: the full-corpus pass reduces to ONE ROW PER DOMAIN (map-side
    combinable sum of token counts), so the unpartitioned share/count window
    runs over a frame with tens-to-hundreds of rows regardless of corpus
    size — the single-partition window is on the aggregate, never the data.
    Ratios are DECIMAL(38,12)-exact before the final round (no
    order-sensitive float sums)."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    w = Window.partitionBy()  # tiny aggregated frame — see docstring
    total = F.sum("n_tokens").over(w)
    n_domains = F.count(F.lit(1)).over(w)
    return per_src.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("decimal(38,12)") / total, 6)
        .cast("double")
        .alias("token_share"),
        F.round(
            total.cast("decimal(38,12)") / (n_domains * F.col("n_tokens")), 6
        )
        .cast("double")
        .alias("mix_weight"),
    )


# ---------------------------------------------------------------------------
# Corpus-frequency rarity scoring (bigram document frequency)
# ---------------------------------------------------------------------------

_RARE_DF = 2  # a bigram seen in ≤2 documents is "rare"


_RARITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
b AS (
  SELECT DISTINCT doc_id, md5(ws[j + 1] || ' ' || ws[j + 2]) AS h
  FROM (SELECT doc_id, ws,
               unnest(range(0, greatest(len(ws) - 1, 0))) AS j FROM w)
),
df AS (SELECT h, count(*) AS df FROM b GROUP BY h)
SELECT b.doc_id,
       count(*) AS n_distinct_bigrams,
       CAST(sum(CASE WHEN df.df <= {_RARE_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare_bigrams,
       round(sum(CASE WHEN df.df <= {_RARE_DF} THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS rare_fraction
FROM b JOIN df ON b.h = df.h
GROUP BY b.doc_id
"""


@register(
    "doc_bigram_rarity",
    oracle=_RARITY_ORACLE,
    tags=("pipeline", "text"),
)
def doc_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity: per document, the fraction of its distinct
    word bigrams that are rare corpus-wide (document frequency ≤ 2) — a
    cheap LM-free novelty/noise signal (very high = gibberish or OCR noise,
    very low = templated boilerplate) used alongside `text_quality_scores`
    in curation gates.

    Scale: since the per-doc DF contribution is 0/1 (bigrams deduped inside
    each doc), df(h) = count(*) over the per-doc-distinct rows — computed by
    an unbounded count window on ONE digest exchange. The exploded frame is
    derived once (a groupBy-df + join-back shape re-derives the explode+md5
    stage on the join side); the per-doc stats exchange is the only other
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ws = ensure_parallelism(docs).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    # per-doc distinct via array_distinct BEFORE the explode: zero-shuffle
    # dedup (a row-level .distinct() here would shuffle every bigram
    # occurrence in the corpus)
    b = ws.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN "
                    "transform(sequence(0, size(ws) - 2), "
                    "j -> md5(concat_ws(' ', ws[j], ws[j+1]))) "
                    "ELSE CAST(array() AS ARRAY<STRING>) END"
                )
            )
        ).alias("h"),
    )
    whf = Window.partitionBy("h").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    counted = b.select("doc_id", F.count(F.lit(1)).over(whf).alias("df"))
    rare = F.sum(F.when(F.col("df") <= _RARE_DF, 1).otherwise(0))
    return counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        rare.alias("n_rare_bigrams"),
        F.round(rare / F.count(F.lit(1)).cast("double"), 6).alias(
            "rare_fraction"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a NEW batch against the existing corpus
# ---------------------------------------------------------------------------

_NEW_MOD = 5  # doc_id % 5 == 4 → the "newly arrived" batch


_INCR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, ws[j + 1] || ' ' || ws[j + 2] || ' ' || ws[j + 3] AS g
  FROM (SELECT doc_id, ws, unnest(range(0, greatest(len(ws) - 2, 0))) AS j FROM w)
),
h AS (SELECT doc_id, md5(g) AS h FROM g),
mh AS (
  SELECT doc_id, t.seed AS seed,
         min(substr(h || h, t.seed * 2 + 1, 16)) AS mh
  FROM h CROSS JOIN range(0, 12) t(seed)
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, seed // 3 AS band,
         md5(array_to_string(list_sort(list(CAST(seed AS VARCHAR) || ':' || mh)), '|')) AS sig
  FROM mh GROUP BY doc_id, seed // 3
),
digests AS (SELECT doc_id, md5(text) AS dg FROM documents),
new_docs AS (SELECT doc_id FROM documents WHERE doc_id % {_NEW_MOD} = {_NEW_MOD - 1}),
corpus AS (SELECT doc_id FROM documents WHERE doc_id % {_NEW_MOD} <> {_NEW_MOD - 1}),
exact AS (
  SELECT n.doc_id, min(cd.doc_id) AS exact_canonical
  FROM new_docs n
  JOIN digests nd ON nd.doc_id = n.doc_id
  JOIN digests cd ON cd.dg = nd.dg AND cd.doc_id IN (SELECT doc_id FROM corpus)
  GROUP BY 1
),
near AS (
  SELECT nb.doc_id, count(DISTINCT cb.doc_id) AS n_near_corpus
  FROM bands nb
  JOIN bands cb ON cb.band = nb.band AND cb.sig = nb.sig
  WHERE nb.doc_id % {_NEW_MOD} = {_NEW_MOD - 1}
    AND cb.doc_id % {_NEW_MOD} <> {_NEW_MOD - 1}
  GROUP BY 1
)
SELECT n.doc_id,
       e.exact_canonical,
       coalesce(nr.n_near_corpus, 0) AS n_near_corpus,
       CASE WHEN e.exact_canonical IS NOT NULL THEN 'exact'
            WHEN coalesce(nr.n_near_corpus, 0) > 0 THEN 'near'
            ELSE 'unique' END AS verdict
FROM new_docs n
LEFT JOIN exact e ON e.doc_id = n.doc_id
LEFT JOIN near nr ON nr.doc_id = n.doc_id
"""


@register(
    "incremental_dedup",
    oracle=_INCR_ORACLE,
    tags=("pipeline", "dedup", "lsh"),
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production arrival path: a newly ingested
    batch (deterministic subset ``doc_id % 5 == 4``) is checked against the
    EXISTING corpus only (new⋈corpus, never new⋈new or corpus⋈corpus):
    exact duplicates by content digest (smallest matching corpus doc as
    canonical), near-duplicates by shared MinHash-LSH band signature, and a
    verdict column (exact | near | unique) deciding the doc's fate.

    Scale: the corpus side's digests and band signatures are exactly what a
    production system keeps as its dedup INDEX — both joins are equi-joins
    on uniform hash keys, the batch side is small, and nothing ever
    compares corpus docs to each other again. Band signatures come from the
    same `_minhash_wide` builder as `minhash_lsh_pairs`, so index and
    ad-hoc pair search stay bit-identical."""
    from .pipeline import _minhash_wide

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _NEW_MOD == _NEW_MOD - 1
    digests = docs.select("doc_id", F.md5("text").alias("dg"))
    new_docs = docs.filter(is_new).select("doc_id")
    exact = (
        digests.filter(is_new)
        .join(
            digests.filter(~is_new).select(
                F.col("doc_id").alias("c_id"), "dg"
            ),
            "dg",
        )
        .groupBy("doc_id")
        .agg(F.min("c_id").alias("exact_canonical"))
    )
    wide = _minhash_wide(spark, sf_dir)
    bands = wide.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"sig{b}") for b in range(4)])
        ).alias("band", "sig"),
    )
    near = (
        bands.filter(is_new)
        .join(
            bands.filter(~is_new).select(
                F.col("doc_id").alias("c_id"), "band", "sig"
            ),
            ["band", "sig"],
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("c_id").alias("n_near_corpus"))
    )
    return (
        new_docs.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "exact_canonical",
            F.coalesce(F.col("n_near_corpus"), F.lit(0)).alias(
                "n_near_corpus"
            ),
            F.when(F.col("exact_canonical").isNotNull(), "exact")
            .when(F.coalesce(F.col("n_near_corpus"), F.lit(0)) > 0, "near")
            .otherwise("unique")
            .alias("verdict"),
        )
    )


@register_artifact("dedup_index")
def _corpus_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the static corpus dedup index (content digests + MinHash
    band signatures of the non-"new" docs) to a content-fingerprinted
    parquet directory, once per corpus state — the "index in a table" half
    of the incremental-dedup deployment shape. Fingerprint = the same
    leaf-file (mtime_ns, size) walk the binary frame cache uses, so a
    regenerated documents table can never reuse a stale index. Built in a
    private staging dir and published with an atomic rename (shared
    helper, operators/artifacts.py); the logic version pins the signature
    spec (_N_HASHES/_BAND_ROWS/_NEW_MOD) so a spec change can never serve
    a stale index from a warm host."""
    from ..operators.artifacts import artifact_dir, write_artifact_table
    from .pipeline import _BAND_ROWS, _N_HASHES, _minhash_wide

    def _build(stage: str) -> None:
        is_new = F.col("doc_id") % _NEW_MOD == _NEW_MOD - 1
        docs_b = load_table(spark, sf_dir, "documents")
        write_artifact_table(
            docs_b.filter(~is_new).select(
                F.col("doc_id").alias("c_id"), F.md5("text").alias("dg")
            ),
            stage,
            "digests",
        )
        write_artifact_table(
            _minhash_wide(spark, sf_dir)
            .filter(~is_new)
            .select(
                F.col("doc_id").alias("c_id"),
                F.posexplode(
                    F.array(
                        *[
                            F.col(f"sig{b}")
                            for b in range(_N_HASHES // _BAND_ROWS)
                        ]
                    )
                ).alias("band", "sig"),
            ),
            stage,
            "bands",
        )

    return artifact_dir(
        spark,
        sf_dir,
        name="dedup_index",
        version=f"v1-h{_N_HASHES}b{_BAND_ROWS}m{_NEW_MOD}",
        source_table="documents",
        build=_build,
    )


@register(
    "incremental_dedup_stream_replay",
    oracle=_INCR_ORACLE,
    tags=("streaming", "dedup", "lsh"),
)
def incremental_dedup_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production arrival path UNDER STREAMING EXECUTION: newly
    ingested documents arrive as a STREAM and are checked against the
    static corpus dedup index (digests + MinHash band signatures) by
    stream-static joins — the exact deployment shape (index in a
    table, arrivals through Kafka/files). The corpus-index side carries NO
    broadcast hint: it scales with the corpus, so a hint would ship an
    unbounded frame to every executor at 100 TB — AQE broadcasts per
    micro-batch only while the index is actually small, and the join
    degrades gracefully to a shuffled hash join past the threshold (a
    stream-static equi-join plans fine either way). Same oracle as the batch
    `incremental_dedup`, so the streaming engine's execution of the
    identical semantics sits under the hash gate.

    Streaming-plan notes: the per-doc MinHash signature needs NO
    aggregation on the stream — a document is one row, so each of the 12
    rotation-mins folds inside the row (array_min over HOF transforms),
    producing bit-identical signatures to the batch `_minhash_wide`
    builder (min over the same string set). Exact/near hits and a
    self-row per doc union into ONE streaming aggregation (complete mode):
    Structured Streaming allows a single stateful agg, and this shape
    needs exactly one."""
    from pyspark.sql import functions as F  # noqa: F811

    from .pipeline import _BAND_ROWS, _N_HASHES
    from ..streaming.runner import run_available_now

    is_new = F.col("doc_id") % _NEW_MOD == _NEW_MOD - 1

    # static corpus index: content digests + band signatures, band sigs from
    # the SAME _minhash_wide builder as the batch operator — MATERIALIZED to
    # a content-fingerprinted parquet table once per corpus and read back.
    # This is the deployment shape verbatim ("index in a table, arrivals
    # through Kafka/files"): a production index is maintained incrementally,
    # not recomputed per arriving micro-batch, and a stream-static join
    # re-evaluates its static subtree EVERY batch — recomputing the 12-hash
    # MinHash over the whole corpus each time. The batch `incremental_dedup`
    # entry keeps full index-build timing.
    from ..operators.artifacts import read_artifact_table

    idx_dir = _corpus_index_dir(spark, sf_dir)
    corpus_digests = read_artifact_table(spark, idx_dir, "digests")
    corpus_bands = read_artifact_table(spark, idx_dir, "bands")

    # streaming side: new docs as a file stream; signatures per ROW
    from ..streaming.sources import cached_parquet_schema

    schema = cached_parquet_schema(spark, f"{sf_dir.rstrip('/')}/documents.parquet")
    new = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir.rstrip("/"))
        .filter(is_new)
        # the single-file micro-batch arrives as ONE partition; the per-row
        # signature build (hundreds of md5 shingles + 12 HOF min-hashes per
        # doc) is the replay's dominant cost (1.1 s single-task at sf0.1) —
        # spread it before the projection. At scale arrivals span many
        # files/Kafka partitions and this shuffle of raw arrival rows is
        # noise next to the signature compute it parallelizes.
        .repartition(8)
        # split once per ROW: the split(text) used to sit inside the shingle
        # lambda, re-tokenizing the whole document for every shingle position
        # (O(tokens²) work per doc on the interpreted HOF path). Projecting
        # ws/hh in their own stages keeps them materialized — CollapseProject
        # leaves a projection alone when its output feeds multiple non-cheap
        # consumer references, so the optimizer cannot inline the split back
        # into the lambdas. Values are bit-identical (pure CSE): same
        # shingles, same md5s, same rotations.
        .withColumn("ws", F.split("text", " "))
        .withColumn(
            "hs",
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN "
                "transform(sequence(0, size(ws) - 3), "
                "j -> md5(concat_ws(' ', ws[j], ws[j+1], ws[j+2]))) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            ),
        )
        # doubled digest once per SHINGLE (was once per shingle x 12 rotations)
        .withColumn("hh", F.expr("transform(hs, h -> concat(h, h))"))
    )
    # all 12 rotation-mins in ONE projection (a 12-step withColumn chain costs
    # 12 analyzer passes per replay construction; same values either way)
    new = new.select(
        "doc_id",
        "text",
        *[
            F.expr(f"array_min(transform(hh, h -> substr(h, {s * 2 + 1}, 16)))").alias(
                f"mh{s}"
            )
            for s in range(_N_HASHES)
        ],
    )
    sig_cols = [
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array(
                        *[
                            F.concat(F.lit(f"{s}:"), F.col(f"mh{s}"))
                            for s in range(b * _BAND_ROWS, (b + 1) * _BAND_ROWS)
                        ]
                    )
                ),
                "|",
            )
        ).alias(f"sig{b}")
        for b in range(_N_HASHES // _BAND_ROWS)
    ]
    new = new.select("doc_id", F.md5("text").alias("dg"), *sig_cols)

    exact_hits = (
        new.select("doc_id", "dg")
        .join(corpus_digests, "dg")
        .select("doc_id", "c_id", F.lit("exact").alias("tag"))
    )
    near_hits = (
        new.select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"sig{b}") for b in range(_N_HASHES // _BAND_ROWS)])
            ).alias("band", "sig"),
        )
        .join(corpus_bands, ["band", "sig"])
        .select("doc_id", "c_id", F.lit("near").alias("tag"))
    )
    self_rows = new.select(
        "doc_id", F.lit(None).cast("long").alias("c_id"), F.lit("self").alias("tag")
    )
    tagged = exact_hits.unionByName(near_hits).unionByName(self_rows)
    agg = tagged.groupBy("doc_id").agg(
        F.min(F.when(F.col("tag") == "exact", F.col("c_id"))).alias(
            "exact_canonical"
        ),
        F.size(
            F.array_distinct(
                F.collect_list(F.when(F.col("tag") == "near", F.col("c_id")))
            )
        )
        .cast("long")
        .alias("n_near_corpus"),
    )
    out = agg.select(
        "doc_id",
        "exact_canonical",
        "n_near_corpus",
        F.when(F.col("exact_canonical").isNotNull(), "exact")
        .when(F.col("n_near_corpus") > 0, "near")
        .otherwise("unique")
        .alias("verdict"),
    )
    return run_available_now(
        out,
        output_mode="complete",
        no_data_batch=False,  # complete mode: full state re-emitted per batch
    )


# ---------------------------------------------------------------------------
# Sub-document dedup REWRITE (first occurrence wins, corpus-wide)
# ---------------------------------------------------------------------------

_REWRITE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
c AS (
  SELECT doc_id, j,
         array_to_string(list_slice(ws, j * {_CHUNK_W} + 1,
                                    (j + 1) * {_CHUNK_W}), ' ') AS chunk
  FROM (SELECT doc_id, ws,
               unnest(range(0, CAST(ceil(len(ws) / {_CHUNK_W}.0) AS BIGINT))) AS j
        FROM w)
),
ranked AS (
  SELECT doc_id, j, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, j) AS occ
  FROM c
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(CASE WHEN occ = 1 THEN chunk END, ' ' ORDER BY j),
                    '')) AS rewritten_fp
FROM ranked
GROUP BY doc_id
"""


@register(
    "chunk_dedup_rewrite",
    oracle=_REWRITE_ORACLE,
    tags=("pipeline", "dedup", "text"),
)
def chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup as a TRANSFORM, not just a measurement: every
    20-token chunk survives only at its first corpus occurrence (smallest
    (doc_id, position)); later copies — license blocks, boilerplate,
    navigation chrome — are dropped and each document is reassembled from
    its kept chunks in original order. Returns per-doc chunk counts plus
    the md5 fingerprint of the rewritten text (the full rewritten corpus is
    the same plan minus the final hash).

    Scale: one exchange on the chunk digest (row_number window decides the
    global first occurrence — no self-join, no collection per digest), then
    the per-doc reassembly exchange where order is restored by sorting the
    in-group chunk structs by position."""
    docs = load_table(spark, sf_dir, "documents")
    ws = ensure_parallelism(docs).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    c = ws.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(ws) / {_CHUNK_W}.0) AS INT) - 1), "
                f"j -> concat_ws(' ', slice(ws, j * {_CHUNK_W} + 1, {_CHUNK_W})))"
            )
        ).alias("j", "chunk"),
    )
    w_occ = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "j")
    ranked = c.select(
        "doc_id", "j", "chunk", F.row_number().over(w_occ).alias("occ")
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("occ") == 1, F.struct("j", "chunk")
                    )
                )
            ),
            lambda s: s.chunk,
        ),
        " ",
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("occ") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(kept_text).alias("rewritten_fp"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (emails / phone numbers / IPv4) — training-data redaction
# ---------------------------------------------------------------------------

# regex subset chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, literal escapes only
_PII_EMAIL = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"
_PII_PHONE = "\\+1-555-[0-9]{4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_PII_ORACLE = f"""
WITH enriched AS (
  SELECT doc_id,
         text || CASE doc_id % 3
           WHEN 0 THEN ' reach u' || doc_id || '@mail.example soon'
           WHEN 1 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE ' from 10.' || (doc_id % 256) || '.' || ((doc_id // 256) % 256)
                || '.' || (doc_id % 250 + 1)
         END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g')) AS scrub_fp
FROM enriched
"""


def _pii_scrub_project(frame: DataFrame) -> DataFrame:
    """The whole PII pass as ONE projection over (doc_id, text) — shared
    verbatim by the batch entry and its streaming arrival-path twin, so
    both sit under the identical oracle expressions. Streaming-safe:
    stateless, no aggregation, no window."""
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" reach u"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example soon"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") / 256).cast("long") % 256).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 250 + 1).cast("string"),
            )
        ),
    )
    enriched = frame.select("doc_id", t.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    # function form (not F.expr): a SQL string literal would re-process the
    # backslash escapes, mangling the \+ in the phone pattern
    return enriched.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_IP), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.md5(scrubbed).alias("scrub_fp"),
    )


@register(
    "pii_scrub",
    oracle=_PII_ORACLE,
    tags=("pipeline", "text", "curation"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the pre-training scrub pass every large-scale text
    pipeline runs: count and replace emails, NANP-style phone numbers, and
    IPv4 addresses with typed placeholder tokens, emitting per-doc match
    counts plus an md5 fingerprint of the scrubbed text (so the oracle
    hash-checks the REDACTED BYTES, not just the counts).

    The synthetic documents are PII-free word salad, so the fixture
    deterministically injects one PII item per document (kind = doc_id % 3)
    identically in Spark and the oracle SQL — a non-hollow gate at every
    SF. The regex subset (char classes, bounded repetition, literal
    escapes) behaves identically under Java regex and RE2; no backrefs, no
    lookaround.

    Scale: one scan, zero shuffles — pure codegen regexp projections; the
    per-doc output keys on the scan's own partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    return _pii_scrub_project(ensure_parallelism(docs).select("doc_id", "text"))


# ---------------------------------------------------------------------------
# quality_label_propagation — spread quality labels over the near-dup graph
# ---------------------------------------------------------------------------


def _qlp_oracle() -> str:
    from .pipeline import _MINHASH_CTES

    return _MINHASH_CTES + """
, tq AS (
  SELECT doc_id,
         CAST(round(CAST(1000000 AS DOUBLE)
                    * len(list_distinct(string_split(text, ' ')))
                    / len(string_split(text, ' '))) AS BIGINT) AS q
  FROM documents
),
seeds AS (SELECT doc_id, q FROM tq WHERE doc_id % 5 = 0),
ed AS (
  SELECT doc_a AS u, doc_b AS v, n_bands AS w FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v, n_bands AS w FROM pairs
),
l1 AS (
  SELECT doc_id, q FROM seeds
  UNION ALL
  SELECT e.u AS doc_id,
         CAST(SUM(s.q * e.w) AS BIGINT) // CAST(SUM(e.w) AS BIGINT) AS q
  FROM ed e JOIN seeds s ON s.doc_id = e.v
  WHERE e.u NOT IN (SELECT doc_id FROM seeds)
  GROUP BY e.u
),
l2 AS (
  SELECT doc_id, q, TRUE AS is_seed FROM seeds
  UNION ALL
  SELECT e.u AS doc_id,
         CAST(SUM(l.q * e.w) AS BIGINT) // CAST(SUM(e.w) AS BIGINT) AS q,
         FALSE AS is_seed
  FROM ed e JOIN l1 l ON l.doc_id = e.v
  WHERE e.u NOT IN (SELECT doc_id FROM seeds)
  GROUP BY e.u
)
SELECT doc_id, q AS label_fp, is_seed FROM l2
"""


@register(
    "quality_label_propagation",
    oracle=_qlp_oracle(),
    tags=("curation", "graph", "labels"),
)
def quality_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised quality-label spreading over the near-dup graph —
    the curation move for corpora where only a slice is scored: seed docs
    (doc_id % 5 == 0 here; a classifier head in production) carry a
    type-token-ratio quality label, and two unrolled label-spreading
    iterations push weighted averages along MinHash-band edges (weight =
    shared bands), seeds clamped. A near-duplicate of a scored document
    inherits its quality without re-scoring — the reason to propagate
    instead of classify everything.

    Scale: the edge relation is the BANDED candidate set (bucketed, never
    corpus²) built by the shared `_minhash_wide` signature frame; each
    iteration is one edges⋈labels equi-join + a partial-aggregated
    (node) exchange, seeds excluded by anti-join. All label math is
    fixed-point BIGINT with truncating DIV — bit-identical across
    engines and summation orders."""
    from .pipeline import _BAND_ROWS, _N_HASHES, _minhash_wide

    docs = load_table(spark, sf_dir, "documents")
    tq = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
    ).select(
        "doc_id",
        F.expr(
            "CAST(round(CAST(1000000 AS DOUBLE) * size(array_distinct(ws))"
            " / size(ws)) AS BIGINT)"
        ).alias("q"),
    )
    # cached: seeds feeds five branches (both spreads' label input and
    # anti-join, the l1 union, and the final union) — uncached, each
    # re-ran the corpus scan + split + type-token-ratio projection
    seeds = tq.filter(F.col("doc_id") % 5 == 0).cache()

    wide = _minhash_wide(spark, sf_dir)
    bands = wide.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"sig{b}") for b in range(_N_HASHES // _BAND_ROWS)])
        ).alias("band", "sig"),
    )
    # MULTIPLICITY edges (r13, VERDICT r12 task 3): the edge relation is
    # the RAW directed band-match row set — one row per shared band per
    # ordered (u, v) — from a single u != v self-join. The r12 form built
    # distinct weighted pairs (doc_a < doc_b, w = n_bands) and unioned the
    # two directions, which duplicated the ENTIRE MinHash-banding subplan
    # into both union branches (the plan carried two full copies of the
    # shingle-explode → md5 → 12-min groupBy → band self-join pipeline —
    # Catalyst does not share subtrees across union arms and the
    # direction-swapped exchanges do not canonicalize equal), plus paid a
    # (doc_a, doc_b) aggregation exchange the spread never needed: the
    # weighted sums below are exact integer identities over multiplicity
    # rows (SUM(q*w) over distinct edges = SUM(q) over rows; SUM(w) =
    # COUNT(*)), so the fixed-point label math is bit-identical.
    # Measured (alternating min-of-2 ×3 rounds, bench parity): 1.91/1.61/
    # 1.70 s -> 1.64/1.38/1.17 s; plan SortMergeJoin 2 -> 0, Exchange
    # 44 -> 37; exceptAll-identical both directions; oracle green.
    #
    # cached: spread() consumes the edge relation twice, and the second
    # iteration's input l1 embeds the first spread, so the banded
    # self-join over the MinHash signature frame would otherwise execute
    # ~3x in one plan (the spread branches do not canonicalize
    # identically — different label inputs — so ReusedExchange cannot
    # share them). Skinny (u, v), bounded by the banded candidate set
    # times the band count (≤4).
    ed = (
        bands.select(F.col("doc_id").alias("u"), "band", "sig")
        .join(
            bands.select(F.col("doc_id").alias("v"), "band", "sig"),
            ["band", "sig"],
        )
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
        .cache()
    )

    def spread(labels: DataFrame) -> DataFrame:
        return (
            ed.join(
                labels.select(F.col("doc_id").alias("v"), "q"), "v"
            )
            .join(
                seeds.select(F.col("doc_id").alias("u")),
                "u",
                "left_anti",
            )
            .groupBy("u")
            .agg(F.expr("SUM(q) DIV COUNT(*)").alias("q"))
            .select(F.col("u").alias("doc_id"), "q")
        )

    l1 = seeds.unionAll(spread(seeds))
    return seeds.withColumn("is_seed", F.lit(True)).unionAll(
        spread(l1).withColumn("is_seed", F.lit(False))
    ).select("doc_id", F.col("q").alias("label_fp"), "is_seed")
