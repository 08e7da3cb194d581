"""Semantic invariants for the cluster-consolidating dedup surface:
``dedup_cluster_rewrite`` (one survivor per connected component, exact
provenance) and ``semdedup_prune`` (the SemDeDup keep-low-centroid-sim
rule). The oracle-parity suite already locks cross-engine equality; these
tests pin the *semantics* so a future rewrite can't drift while staying
self-consistent with its own oracle."""

from nexmark_vanilla_flink_spark.plans import REGISTRY


def test_cluster_rewrite_one_survivor_with_exact_provenance(spark, sf_dir):
    cc = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["dedup_clusters"].spark(spark, sf_dir).collect()
    }
    kept = REGISTRY["dedup_cluster_rewrite"].spark(spark, sf_dir).collect()
    # exactly one representative per component, and it is the min-label rep
    clusters = set(cc.values())
    assert {r["doc_id"] for r in kept} == clusters
    # provenance: member counts per cluster sum back to the whole corpus
    sizes = {}
    for cid in cc.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    assert {r["doc_id"]: r["n_members"] for r in kept} == sizes
    assert sum(r["n_members"] for r in kept) == len(cc)


def test_semdedup_drop_rule(spark, sf_dir):
    pairs = REGISTRY["embedding_neardup_pairs"].spark(spark, sf_dir).collect()
    verdicts = {
        r["vec_id"]: r for r in REGISTRY["semdedup_prune"].spark(spark, sf_dir).collect()
    }
    dropped = {v for v, r in verdicts.items() if not r["kept"]}
    assert len(verdicts) > 0 and len(dropped) > 0, "no vectors / no drops"
    for p in pairs:
        a, b = verdicts[p["vec_a"]], verdicts[p["vec_b"]]
        # every near-dup pair loses its closer-to-centroid member ...
        loser = (
            p["vec_b"]
            if b["centroid_sim"] >= a["centroid_sim"]
            else p["vec_a"]
        )
        assert loser in dropped, f"pair {p} kept its prototype-side member"
    # ... and nothing else is ever dropped
    losers = set()
    for p in pairs:
        a, b = verdicts[p["vec_a"]], verdicts[p["vec_b"]]
        losers.add(
            p["vec_b"] if b["centroid_sim"] >= a["centroid_sim"] else p["vec_a"]
        )
    assert dropped == losers


def test_winnowing_window_coverage_guarantee(spark, sf_dir):
    """The defining winnowing property: every window of w consecutive
    k-gram positions contains at least one selected fingerprint, so any
    exact token overlap of length >= w+k-1 between two documents is
    guaranteed to share a fingerprint."""
    from nexmark_vanilla_flink_spark.plans.pipeline import _WINNOW_W

    import pyarrow.parquet as pq

    fps = REGISTRY["winnow_fingerprints"].spark(spark, sf_dir).collect()
    sel = {}
    for r in fps:
        sel.setdefault(r["doc_id"], set()).add(r["fp_pos"])
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    checked = 0
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        n = max(len(text.split(" ")) - 2, 0)
        if n == 0:
            assert doc_id not in sel
            continue
        positions = sel[doc_id]
        assert positions, f"doc {doc_id} has k-grams but no fingerprints"
        for start in range(0, max(n - _WINNOW_W, 0) + 1):
            window = set(range(start, min(start + _WINNOW_W, n)))
            assert window & positions, (
                f"doc {doc_id}: window at {start} has no selected fingerprint"
            )
        checked += 1
    assert checked > 0


def test_lsh_candidate_pairs_match_full_plan(spark, sf_dir):
    """r12 session 4: the dedup_clusters build and the pair-list-only
    consumers (corpus_curation, curation_funnel, source_dup_matrix) take
    ``_lsh_candidate_pairs`` — the banded candidate set WITHOUT the
    jaccard-scoring joins they discard. The candidate (pair, n_bands) set
    must stay identical to the full ``minhash_lsh_pairs`` plan's, or the
    cluster map silently diverges from the scored-pair surface."""
    from nexmark_vanilla_flink_spark.plans.pipeline import (
        _lsh_candidate_pairs,
        minhash_lsh_pairs,
    )

    cand = {
        (r["doc_a"], r["doc_b"]): r["n_bands"]
        for r in _lsh_candidate_pairs(spark, sf_dir).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]): r["n_bands"]
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert len(cand) > 0
    assert cand == full
