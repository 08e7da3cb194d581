"""Every registered query with an oracle must hash-match DuckDB — the same
check the correctness driver runs at sf0.01, run here at sf0.001 for speed.
"""

import pytest

from nexmark_vanilla_flink_spark.plans import REGISTRY

from .oracle_utils import compare

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    ok, msg = compare(df, sf_dir, q.oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark, sf_dir):
    for name, q in REGISTRY.items():
        df = q.spark(spark, sf_dir)
        assert df.count() >= 0, name
