"""Streaming replays registered as driver-checkable queries.

Bounded replay (Trigger.AvailableNow) of a complete-mode streaming
aggregation produces exactly the batch result, and an append-mode
watermarked join emits exactly the batch join rows — so these entries reuse
the batch oracles and put Structured Streaming itself (watermarks, state
stores, the symmetric hash join, applyInPandasWithState) under the DuckDB
correctness gate, not just under pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import EV_CTE, PERSONS_CTE, AUCTIONS_CTE, BIDS_CTE, with_ctes
from .registry import REGISTRY, register

def _batch_oracle(name: str) -> str:
    return REGISTRY[name].oracle


@register(
    "q5_hot_items_stream_replay",
    oracle=None,  # assigned below to the batch q5 oracle
    tags=("streaming", "nexmark", "agg", "window"),
)
def q5_hot_items_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 through Structured Streaming [A1 + W1]: file-stream replay,
    watermark, windowed agg, complete-mode memory sink. Output ≡ batch, so
    the batch oracle adjudicates the streaming engine's state handling."""
    from ..streaming.queries import q5_hot_items_stream
    from ..streaming.runner import run_available_now
    from ..streaming.sources import stream_nexmark

    s = stream_nexmark(spark, sf_dir)
    return run_available_now(q5_hot_items_stream(s["bids"]), output_mode="complete")


@register(
    "sessions_stream_replay",
    oracle=None,
    tags=("streaming", "nexmark", "session"),
)
def sessions_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows through the streaming merge path [A5]."""
    from ..streaming.queries import sessions_stream
    from ..streaming.runner import run_available_now
    from ..streaming.sources import stream_nexmark

    s = stream_nexmark(spark, sf_dir)
    return run_available_now(sessions_stream(s["bids"]), output_mode="complete")


@register(
    "q8_union_join_lowlevel",
    oracle=with_ctes(EV_CTE, PERSONS_CTE, AUCTIONS_CTE)
    + """
SELECT p.user_id, p.person_id, a.auction_id
FROM persons p JOIN auctions a ON a.seller_id = p.user_id
""",
    tags=("streaming", "nexmark", "join", "stateful"),
)
def q8_union_join_lowlevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact Q8 union-join (J2/J6: tagged union keyed by
    person, ValueState/ListState symmetric emission —
    NexmarkQuery8.java:570-662) on applyInPandasWithState, replayed bounded.
    Emission order differs from batch; the row SET is deterministic and the
    oracle checks it."""
    from ..streaming.runner import run_available_now
    from ..streaming.sources import stream_nexmark
    from ..streaming.stateful import union_join_stateful

    s = stream_nexmark(spark, sf_dir)
    return run_available_now(
        union_join_stateful(s["persons"], s["auctions"]), output_mode="append"
    )


# wire the shared oracles once the batch plans are registered
REGISTRY["q5_hot_items_stream_replay"].oracle = _batch_oracle("q5_hot_items")
REGISTRY["sessions_stream_replay"].oracle = _batch_oracle("sessions_by_bidder")
