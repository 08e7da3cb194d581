"""Domain invariants over registry outputs — cheap sanity that catches
category errors (negative counts, out-of-range ratios, broken tie-breaks)
that value-hash comparison alone would also catch but not localize."""

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.plans import REGISTRY


def _one(df, *exprs):
    return df.agg(*exprs).collect()[0]


def test_jaccard_like_outputs_in_unit_range(spark, sf_dir):
    r = _one(
        REGISTRY["minhash_lsh_pairs"].spark(spark, sf_dir),
        F.min("jaccard_est"),
        F.max("jaccard_est"),
        F.min("n_bands"),
    )
    assert 0.0 <= r[0] <= r[1] <= 1.0 and r[2] >= 1
    r = _one(
        REGISTRY["ngram_jaccard_pairs"].spark(spark, sf_dir),
        F.min("jaccard"),
        F.max("jaccard"),
    )
    assert 0.5 <= r[0] <= r[1] <= 1.0  # threshold respected


def test_cosine_outputs_in_range_and_ranked(spark, sf_dir):
    df = REGISTRY["cosine_topk_bruteforce"].spark(spark, sf_dir)
    r = _one(df, F.min("cos_sim"), F.max("cos_sim"), F.max("rn"))
    assert -1.0 <= r[0] <= r[1] <= 1.0 and r[2] <= 5
    # rank is dense per query: exactly 5 rows each
    counts = df.groupBy("q_id").count().select("count").distinct().collect()
    assert [c["count"] for c in counts] == [5]


def test_dedup_canonical_is_minimal(spark, sf_dir):
    df = REGISTRY["dedup_exact_docs"].spark(spark, sf_dir)
    assert df.filter(F.col("canonical_id") > F.col("doc_id")).count() == 0
    clusters = REGISTRY["dedup_clusters"].spark(spark, sf_dir)
    assert clusters.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0


def test_counts_and_windows_positive(spark, sf_dir):
    for name, count_col, win_col in [
        ("q5_hot_items", "bid_count", "w_start_s"),
        ("cm_load_per_job", "n_records", "w_start_s"),
        ("sessions_by_bidder", "n_bids", "sess_start_s"),
        ("q8_new_users_auctions", "n_auctions", "w_start_s"),
    ]:
        df = REGISTRY[name].spark(spark, sf_dir)
        assert df.filter(F.col(count_col) <= 0).count() == 0, (name, count_col)
        # window starts must be epoch seconds within the data horizon
        r = _one(df, F.min(win_col), F.max(win_col))
        assert 1_700_000_000 < r[0] <= r[1] < 1_710_000_000, name


def test_quantization_reconstruction_small(spark, sf_dir):
    r = _one(
        REGISTRY["scalar_quantize_embeddings"].spark(spark, sf_dir),
        F.max("recon_err"),
        F.min("scale_r"),
    )
    # int8 quantization of 64-dim vectors: err ≤ dim * (scale/2)² summed → tiny
    assert 0 < r[1] and r[0] < 0.05
