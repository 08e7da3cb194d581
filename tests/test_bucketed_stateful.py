"""Bucketed streaming twins must emit the EXACT row set of their per-key
replicas (r9, VERDICT r8 task 3): `bucketed_stateful` coarsens keyed
state into hash buckets to amortize the per-key Python group-call
machinery, and this suite is what licenses that — the per-key replicas
are the reference forms (they sit under the batch-oracle hash gate via
the replay entries' shared oracles), so set-equality here transfers the
oracle guarantee to the bucketed twins. Run at sf0.001 like the rest of
CI; the driver re-gates the bucketed entries at sf0.01.
"""

import pytest

from nexmark_vanilla_flink_spark.plans.linkage import _sentinel_event_stream
from nexmark_vanilla_flink_spark.streaming.runner import run_available_now
from nexmark_vanilla_flink_spark.plans.linkage import _FUNNEL_WINDOW_US
from nexmark_vanilla_flink_spark.streaming.stateful import (
    ewma_stateful,
    ewma_stateful_bucketed,
    funnel_stateful,
    funnel_stateful_bucketed,
    scd2_stateful,
    scd2_stateful_bucketed,
    skipgram_stateful,
    skipgram_stateful_bucketed,
)

PAIRS = {
    "ewma": (ewma_stateful, ewma_stateful_bucketed, True),
    "scd2": (scd2_stateful, scd2_stateful_bucketed, False),
    "skipgram": (skipgram_stateful, skipgram_stateful_bucketed, False),
    # per-key-TIMER form vs bucketed flush-horizon emission: the row SET
    # must be identical even though emission timing differs
    "funnel": (
        lambda s, f: funnel_stateful(s, f, _FUNNEL_WINDOW_US, per_key_timers=True),
        lambda s, f: funnel_stateful_bucketed(s, f, _FUNNEL_WINDOW_US),
        False,
    ),
}


@pytest.mark.parametrize("name", sorted(PAIRS))
def test_bucketed_matches_per_key(spark, sf_dir, name):
    per_key, bucketed, with_value = PAIRS[name]
    stream, flush_ms = _sentinel_event_stream(
        spark, sf_dir, with_value=with_value
    )
    ref = run_available_now(per_key(stream, flush_ms), output_mode="append")
    stream2, flush_ms2 = _sentinel_event_stream(
        spark, sf_dir, with_value=with_value
    )
    got = run_available_now(
        bucketed(stream2, flush_ms2), output_mode="append"
    )
    assert [f.name for f in got.schema.fields] == [
        f.name for f in ref.schema.fields
    ]
    a = sorted([tuple(r) for r in got.collect()], key=repr)
    b = sorted([tuple(r) for r in ref.collect()], key=repr)
    assert len(a) == len(b) and a == b, f"{name}: {len(a)} vs {len(b)} rows"
    assert len(a) > 0


def test_bucketed_small_bucket_count(spark, sf_dir):
    """n_buckets smaller than the key count still yields the identical
    set — bucket hashing only affects placement, never the fold."""
    stream, flush_ms = _sentinel_event_stream(spark, sf_dir, with_value=True)
    ref = run_available_now(
        ewma_stateful_bucketed(stream, flush_ms), output_mode="append"
    )
    from nexmark_vanilla_flink_spark.streaming.stateful import (
        EWMA_OUTPUT,
        bucketed_stateful,
    )

    stream2, flush_ms2 = _sentinel_event_stream(
        spark, sf_dir, with_value=True
    )

    def fold(uid, ustate, rows):
        acc, n, last_v = ustate or (0, 0, 0)
        for r in rows:
            x = int(r[3])
            acc = (acc + x) // 2
            last_v = x
            n += 1
        return (acc, n, last_v), []

    def final(uid, ustate):
        acc, n, last_v = ustate
        return [(uid, int(n), int(acc), int(last_v))] if n > 0 else []

    got = run_available_now(
        bucketed_stateful(
            stream2, flush_ms2, ["v_fp"], fold, final, EWMA_OUTPUT,
            n_buckets=3,
        ),
        output_mode="append",
    )
    a = sorted([tuple(r) for r in got.collect()], key=repr)
    b = sorted([tuple(r) for r in ref.collect()], key=repr)
    assert a == b
