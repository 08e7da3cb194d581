"""compare_capped (tests/oracle_utils.py): the scale-sweep comparator.

Under the row cap it must be the driver-exact ``compare``; above it, the
distributed aggregate fingerprint must (a) pass on a true match without
collecting rows, and (b) fail loudly on value and row-count divergence.
"""

from __future__ import annotations

from tests.oracle_utils import compare, compare_capped

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    from nexmark_vanilla_flink_spark.plans import REGISTRY

    q = REGISTRY[name]
    return q.spark(spark, SF), q.oracle


def test_full_path_matches_compare(spark):
    df, oracle = _q(spark, "qx_winning_bids")
    ok_full, _ = compare(df, SF, oracle)
    ok_capped, msg = compare_capped(df, SF, oracle)
    assert ok_full and ok_capped
    assert not msg.startswith("agg-fingerprint")


def test_agg_path_passes_on_match(spark):
    df, oracle = _q(spark, "qx_winning_bids")
    ok, msg = compare_capped(df, SF, oracle, cap=1)
    assert ok, msg
    assert msg.startswith("agg-fingerprint ok")


def test_agg_path_detects_value_divergence(spark):
    df, oracle = _q(spark, "qx_winning_bids")
    # Perturb the first numeric column: same row count, different sum.
    num = next(
        c for c, dt in df.dtypes if dt in ("int", "bigint", "double", "float")
    )
    bad = df.selectExpr(
        *[c if c != num else f"`{num}` + 1 AS `{num}`" for c in df.columns]
    )
    ok, msg = compare_capped(bad, SF, oracle, cap=1)
    assert not ok
    assert "agg-fingerprint mismatch" in msg


def test_agg_path_detects_rowcount_divergence(spark):
    df, oracle = _q(spark, "qx_winning_bids")
    ok, msg = compare_capped(df.limit(5), SF, oracle, cap=1)
    assert not ok
    assert "n_rows" in msg or "mismatch" in msg
