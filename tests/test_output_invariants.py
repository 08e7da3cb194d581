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


def test_chunk_dedup_bounds_and_exact_dup_saturation(spark, sf_dir):
    stats = REGISTRY["chunk_dedup_stats"].spark(spark, sf_dir)
    r = _one(
        stats,
        F.min("n_chunks"),
        F.min(F.col("n_chunks") - F.col("n_shared_chunks")),
        F.min("shared_fraction"),
        F.max("shared_fraction"),
    )
    assert r[0] >= 1 and r[1] >= 0 and 0.0 <= r[2] <= r[3] <= 1.0
    # every chunk of an exact-duplicate document is corpus-shared by
    # construction (its twin contains the identical chunks)
    dups = (
        REGISTRY["dedup_exact_docs"]
        .spark(spark, sf_dir)
        .filter(F.col("n_copies") > 1)
        .select("doc_id")
    )
    sat = stats.join(dups, "doc_id").filter(F.col("shared_fraction") < 1.0)
    assert sat.count() == 0


def test_bigram_rarity_bounds(spark, sf_dir):
    r = _one(
        REGISTRY["doc_bigram_rarity"].spark(spark, sf_dir),
        F.min("n_distinct_bigrams"),
        F.min(F.col("n_distinct_bigrams") - F.col("n_rare_bigrams")),
        F.min("rare_fraction"),
        F.max("rare_fraction"),
    )
    assert r[0] >= 1 and r[1] >= 0 and 0.0 <= r[2] <= r[3] <= 1.0


def test_decontamination_excludes_eval_set_and_catches_exact_copies(
    spark, sf_dir
):
    hits = REGISTRY["eval_decontamination"].spark(spark, sf_dir)
    r = _one(
        hits,
        F.sum((F.col("doc_id") % 17 == 0).cast("int")),
        F.min("n_shared_ngrams"),
    )
    assert (r[0] or 0) == 0 and r[1] >= 1
    # any training doc that is an exact copy of an eval doc MUST be flagged
    docs = REGISTRY["dedup_exact_docs"].spark(spark, sf_dir)
    eval_digests = (
        docs.filter(F.col("doc_id") % 17 == 0)
        .select((F.col("canonical_id")).alias("cid"))
        .distinct()
    )
    exact_copies = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .join(eval_digests, docs.canonical_id == eval_digests.cid)
        .select("doc_id")
    )
    missed = exact_copies.join(hits, "doc_id", "left_anti")
    assert missed.count() == 0


def test_mixing_weights_partition_the_corpus(spark, sf_dir):
    from nexmark_vanilla_flink_spark.sources.tables import load_table

    mw = REGISTRY["domain_mixing_weights"].spark(spark, sf_dir)
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    r = _one(
        mw,
        F.sum("n_docs"),
        F.sum("token_share"),
        F.min("mix_weight"),
        F.count(F.lit(1)),
    )
    assert r[0] == n_docs_total
    # rounded shares sum to 1 within n_domains * 1e-6
    assert abs(float(r[1]) - 1.0) <= r[3] * 1e-6
    assert float(r[2]) > 0.0


def test_variant_props_covers_all_events(spark, sf_dir):
    from nexmark_vanilla_flink_spark.sources.tables import load_table

    vp = REGISTRY["events_variant_props"].spark(spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    r = _one(vp, F.sum("n"), F.min("min_k"), F.max("max_k"))
    assert r[0] == n_events  # no event lost to a failed JSON parse
    assert 0 <= r[1] <= r[2]


def test_chunk_rewrite_drops_all_of_exact_duplicates(spark, sf_dir):
    rw = REGISTRY["chunk_dedup_rewrite"].spark(spark, sf_dir)
    r = _one(rw, F.min(F.col("n_chunks") - F.col("n_kept")), F.min("n_kept"))
    assert r[0] >= 0 and r[1] >= 0
    # a non-canonical exact duplicate contains no first-occurrence chunks:
    # every one of its chunks already appeared in the canonical copy
    dups = (
        REGISTRY["dedup_exact_docs"]
        .spark(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    kept_any = rw.join(dups, "doc_id").filter(F.col("n_kept") > 0)
    assert kept_any.count() == 0


def test_incremental_dedup_verdicts_consistent(spark, sf_dir):
    inc = REGISTRY["incremental_dedup"].spark(spark, sf_dir)
    # verdict logic is internally consistent and covers only new-batch docs
    bad = inc.filter(
        ~(
            ((F.col("verdict") == "exact") & F.col("exact_canonical").isNotNull())
            | (
                (F.col("verdict") == "near")
                & F.col("exact_canonical").isNull()
                & (F.col("n_near_corpus") > 0)
            )
            | (
                (F.col("verdict") == "unique")
                & F.col("exact_canonical").isNull()
                & (F.col("n_near_corpus") == 0)
            )
        )
        | (F.col("doc_id") % 5 != 4)
        # the exact canonical must be a corpus doc, never from the new batch
        | (F.col("exact_canonical") % 5 == 4)
    )
    assert bad.count() == 0


def test_containment_bounds_and_threshold(spark, sf_dir):
    pairs = REGISTRY["ngram_containment_pairs"].spark(spark, sf_dir)
    bad = pairs.filter(
        (F.col("doc_a") >= F.col("doc_b"))
        | (F.col("cont_a") <= 0) | (F.col("cont_a") > 1)
        | (F.col("cont_b") <= 0) | (F.col("cont_b") > 1)
        # emission rule: the SMALLER side's containment clears 0.8
        | (F.greatest("cont_a", "cont_b") < 0.8)
        | (F.col("n_shared") <= 0)
    )
    assert bad.count() == 0


def test_pq_codes_cover_every_vector_with_valid_codes(spark, sf_dir):
    from nexmark_vanilla_flink_spark.sources.tables import load_table

    pq = REGISTRY["pq_codes"].spark(spark, sf_dir)
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert pq.count() == n_vecs
    bad = pq.filter(
        (F.col("c0") < 0) | (F.col("c0") >= 16)
        | (F.col("c1") < 0) | (F.col("c1") >= 16)
        | (F.col("c2") < 0) | (F.col("c2") >= 16)
        | (F.col("c3") < 0) | (F.col("c3") >= 16)
        | (F.col("recon_err") < 0)
    )
    assert bad.count() == 0
    # the codebook vectors themselves must reconstruct exactly (err = 0,
    # codes = own id): they ARE centroids
    own = pq.filter(F.col("vec_id") < 16)
    assert own.filter(
        (F.col("recon_err") != 0)
        | (F.col("c0") != F.col("vec_id"))
        | (F.col("c3") != F.col("vec_id"))
    ).count() == 0


def test_histogram_quantiles_monotone(spark, sf_dir):
    hq = REGISTRY["histogram_quantiles"].spark(spark, sf_dir)
    bad = hq.filter(
        (F.col("p50_bin") > F.col("p95_bin"))
        | (F.col("p95_bin") > F.col("p99_bin"))
        | (F.col("n_rows") <= 0)
    )
    assert bad.count() == 0


def test_bottomk_exact_k_per_group(spark, sf_dir):
    bk = REGISTRY["bottomk_consistent_sample"].spark(spark, sf_dir)
    sizes = bk.groupBy("lang").count()
    # every language has >= 5 docs in the testdata, so exactly k survive
    assert sizes.filter(F.col("count") != 5).count() == 0


def test_audio_windows_energy_peak_consistent(spark, sf_dir):
    aw = REGISTRY["multimodal_audio_windows"].spark(spark, sf_dir)
    # peak² ≤ energy ≤ n·peak² and 0 < n_samples ≤ window size
    bad = aw.filter(
        (F.col("n_samples") <= 0) | (F.col("n_samples") > 64)
        | (F.col("energy") < F.col("peak") * F.col("peak"))
        | (F.col("energy") > F.col("n_samples") * F.col("peak") * F.col("peak"))
    )
    assert bad.count() == 0


def test_countmin_point_estimates_upper_bound_truth(spark, sf_dir):
    """CM guarantee: est(key) = min over depths of its cell ≥ true count."""
    from nexmark_vanilla_flink_spark.plans.similarity2 import (
        _CM_DEPTH,
        _CM_WIDTH,
    )
    from nexmark_vanilla_flink_spark.sources.tables import load_table

    cms = REGISTRY["countmin_sketch_table"].spark(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    truth = ev.groupBy("user_id").count()
    cells = truth.select(
        "user_id",
        "count",
        F.explode(F.sequence(F.lit(0), F.lit(_CM_DEPTH - 1))).alias("depth"),
    ).select(
        "user_id",
        "count",
        "depth",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("depth").cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CM_WIDTH
        ).alias("bucket"),
    )
    est = (
        cells.join(cms, ["depth", "bucket"])
        .groupBy("user_id", "count")
        .agg(F.min("cnt").alias("est"))
    )
    assert est.filter(F.col("est") < F.col("count")).count() == 0


def test_normalize_fingerprints_consistent(spark, sf_dir):
    nf = REGISTRY["text_normalize_fingerprints"].spark(spark, sf_dir)
    bad = nf.filter(
        (F.col("changed") != (F.col("fp_norm") != F.col("fp_raw")))
        | (F.col("n_chars_norm") < 0)
    )
    assert bad.count() == 0


def test_leakage_safe_splits_no_cluster_straddle(spark, sf_dir):
    """The whole point: no dedup cluster may have members in both splits,
    and every document gets exactly one assignment."""
    from nexmark_vanilla_flink_spark.sources.tables import load_table

    ls = REGISTRY["leakage_safe_splits"].spark(spark, sf_dir)
    assert ls.count() == load_table(spark, sf_dir, "documents").count()
    straddling = (
        ls.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )
    assert straddling.count() == 0
    # both splits are non-empty on the fixture
    assert ls.select(F.count_distinct("split")).collect()[0][0] == 2


def test_curation_funnel_reconciles_with_kept_corpus(spark, sf_dir):
    """The funnel's final stage must equal the row count of the actual
    corpus_curation output — the funnel and the pipeline share gates."""
    funnel = {
        r.stage: r.n_docs
        for r in REGISTRY["curation_funnel"].spark(spark, sf_dir).collect()
    }
    kept = REGISTRY["corpus_curation"].spark(spark, sf_dir).count()
    assert funnel["near_dedup"] == kept
    assert (
        funnel["ingest"]
        >= funnel["quality"]
        >= funnel["exact_dedup"]
        >= funnel["near_dedup"]
        > 0
    )


def test_funnel_stage_ordering_and_window(spark, sf_dir):
    rows = REGISTRY["funnel_conversion"].spark(spark, sf_dir).collect()
    seven_days_us = 7 * 86400 * 1_000_000
    n2 = n3 = 0
    for r in rows:
        assert r.funnel_stage == 1 + int(r.click_us is not None) + int(
            r.purchase_us is not None
        )
        if r.click_us is not None:
            assert r.click_us >= r.view_us
            n2 += 1
        else:
            # earliest-match semantics: no purchase without a click
            assert r.purchase_us is None
        if r.purchase_us is not None:
            assert r.purchase_us >= r.click_us
            assert r.purchase_us <= r.view_us + seven_days_us
            n3 += 1
    assert len(rows) >= n2 >= n3 > 0  # monotone funnel, non-hollow tail


def test_scd2_intervals_chain_and_compress(spark, sf_dir):
    rows = REGISTRY["scd2_user_state"].spark(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    compressed_any = False
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.is_current for r in rs) == 1 and rs[-1].is_current
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us  # gapless chain
            assert a.state_value != b.state_value  # no-op updates compressed
        compressed_any = compressed_any or len(rs) < 60
    assert compressed_any  # the CDC compression branch actually fired


def test_entity_resolution_finds_every_injected_typo(spark, sf_dir):
    rows = REGISTRY["entity_resolution_pairs"].spark(spark, sf_dir).collect()
    self_pairs = {r.a_key: r.lev for r in rows if r.a_key == r.b_key}
    import duckdb

    n_cust = duckdb.sql(
        f"SELECT count(*), max(c_custkey) FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    ).fetchone()[0]
    # pass-1 blocks on unperturbed attributes, so EVERY record links to its
    # own dirty twin: clean copies at lev 0, injected typos at lev 1
    assert len(self_pairs) == n_cust
    for key, lev in self_pairs.items():
        assert lev == (0 if key % 3 == 2 else 1)
    assert all(r.lev <= 2 for r in rows)


def test_kmv_estimate_within_sketch_error(spark, sf_dir):
    r = REGISTRY["kmv_distinct_estimate"].spark(spark, sf_dir).collect()[0]
    assert r.k == 64 and r.kth_hash > 0 and r.est_distinct > 0
    # KMV standard error ~ 1/sqrt(K-2) ~ 0.127; allow 4 sigma
    assert abs(r.est_distinct - r.exact_distinct) / r.exact_distinct < 0.51


def test_quality_classifier_splits_corpus(spark, sf_dir):
    rows = REGISTRY["quality_classifier_scores"].spark(spark, sf_dir).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # threshold actually discriminates
    for r in rows:
        assert r.keep == (r.z_score > 0.0)


def test_pmi_lift_independence_anchor(spark, sf_dir):
    rows = REGISTRY["bigram_pmi_lift"].spark(spark, sf_dir).collect()
    assert rows and all(r.n_xy >= 5 for r in rows)
    lifts = [r.lift for r in rows]
    # lift straddles 1.0 (independence): real association structure, not a
    # constant artifact of the formula
    assert min(lifts) < 1.0 < max(lifts)


def test_value_outliers_are_tail_mass(spark, sf_dir):
    import duckdb

    rows = REGISTRY["value_outliers"].spark(spark, sf_dir).collect()
    n_total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    # non-hollow but genuinely tail-bounded: Chebyshev gives < 1/9 beyond
    # 3 sigma for ANY distribution
    assert 0 < len(rows) < n_total / 9
    assert all(abs(r.z_score) > 3.0 for r in rows)


def test_history_sequences_cover_users_in_order(spark, sf_dir):
    import duckdb

    rows = REGISTRY["user_history_sequences"].spark(spark, sf_dir).collect()
    n_total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert sum(r.n_events for r in rows) == n_total  # partitions the log
    for r in rows:
        assert r.history.count(">") == r.n_events - 1


def test_resample_grid_dense_and_ffilled(spark, sf_dir):
    rows = REGISTRY["user_value_resample_ffill"].spark(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    saw_gap = False
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.bucket_start_s)
        steps = {
            b.bucket_start_s - a.bucket_start_s for a, b in zip(rs, rs[1:])
        }
        assert steps <= {21_600}  # dense fixed-step grid, no holes
        assert rs[0].is_observed  # grid starts at first observation
        for a, b in zip(rs, rs[1:]):
            if not b.is_observed:
                saw_gap = True
                assert b.value == a.value  # forward fill carries last value
    assert saw_gap  # the fill branch is actually exercised


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir):
    rows = REGISTRY["bloom_membership_audit"].spark(spark, sf_dir).collect()
    present = [r for r in rows if r.truly_present]
    absent = [r for r in rows if not r.truly_present]
    assert present and absent
    # the Bloom guarantee: NO false negatives, ever
    assert all(r.bloom_hit for r in present)
    # realized fp rate stays under 3x the analytic (1-e^-kn/m)^k bound
    import math

    n = 500 if "0.01" in sf_dir else 50  # docs/10 probes per sf
    analytic = (1.0 - math.exp(-3 * (n * 10) / 2048.0)) ** 3
    fp = sum(r.bloom_hit for r in absent) / len(absent)
    assert fp <= max(3 * analytic, 0.5)


def test_upsert_snapshot_merge_semantics(spark, sf_dir):
    import duckdb

    rows = REGISTRY["events_upsert_snapshot"].spark(spark, sf_dir).collect()
    got_users = {r.user_id for r in rows}
    # independently derive users whose LAST op is a tombstone
    last = duckdb.sql(
        f"""
        SELECT user_id, t, n FROM (
          SELECT user_id, event_type AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts) DESC, event_id DESC)
                   AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM read_parquet('{sf_dir}/events.parquet')
        ) WHERE rn = 1
        """
    ).fetchall()
    for uid, t, n in last:
        if t == "error":
            assert uid not in got_users  # tombstone deletes the key
        else:
            assert uid in got_users
    by_user = {r.user_id: r for r in rows}
    for uid, t, n in last:
        if t != "error":
            assert by_user[uid].n_ops == n and by_user[uid].last_type == t


def test_lag_features_internally_consistent(spark, sf_dir):
    rows = REGISTRY["user_lag_features"].spark(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r.rn)
        assert rs[0].lag1_value is None and rs[0].delta1 is None
        for i, r in enumerate(rs):
            if i >= 1:
                assert r.lag1_value == rs[i - 1].value
                assert abs(r.delta1 - round(r.value - r.lag1_value, 6)) < 1e-9
            if i >= 2:
                assert r.lag2_value == rs[i - 2].value
            window = [x.value for x in rs[max(0, i - 4) : i + 1]]
            assert abs(r.roll_mean5 - sum(window) / len(window)) < 1e-4
