"""ANN quality: the IVF path must recover most of the brute-force top-5 —
recall is the metric that justifies the nprobe/nlist trade at scale."""

from nexmark_vanilla_flink_spark.plans import REGISTRY


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    bf = REGISTRY["cosine_topk_bruteforce"].spark(spark, sf_dir).collect()
    ivf = REGISTRY["ann_ivf_topk"].spark(spark, sf_dir).collect()
    truth = {(r["q_id"], r["vec_id"]) for r in bf}
    found = {(r["q_id"], r["vec_id"]) for r in ivf}
    assert truth, "bruteforce produced no rows"
    recall = len(truth & found) / len(truth)
    # near-orthogonal synthetic vectors are ANN's worst case; still, probing
    # 2 of ~n/97 lists must beat random scanning by a wide margin
    assert recall >= 0.25, f"IVF recall too low: {recall:.2f}"
