"""Explicit skew-handling join: salting for keys too hot even for AQE.

AQE's skew-join split (on by default, session.py) handles moderate skew by
splitting oversized partitions at runtime. For pathological hot keys — the
Nexmark generators deliberately send 15% of traffic to 1% of keys
(NexmarkCommon.java:23-27) — pre-salting bounds the *map-side* key
cardinality too: the big side scatters each key over ``salt`` sub-keys, the
small side replicates each row ``salt`` times, and the join key becomes
(key, salt). Equivalent rows, ~salt× better balance on the hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-scattered keys.

    ``small`` is replicated ``salt``× (keep it the dimension side); output
    columns match a plain ``big.join(small, on, how)``.

    The salt is derived from a hash of the whole big-side row (not
    ``F.rand``): rand depends on partition layout, so a task retry could
    route the same row to a different sub-key — harmless for batch
    aggregation but wrong under streaming exactly-once. A row hash is
    retry-stable and spreads a hot key's (non-identical) rows just as well.

    LIMITATION (ADVICE r3): fully IDENTICAL duplicate rows of a hot key all
    hash to ONE salt bucket, so a duplicate-heavy hot key is not spread at
    all. If the big side can carry byte-identical duplicates, add a stable
    per-row discriminator COLUMN before calling (a source row id / file
    offset — NOT ``monotonically_increasing_id``, which is not
    retry-stable); the whole-row hash then includes it. The repo's call
    sites (bid streams keyed by unique ``bid_id``) cannot produce identical
    duplicates, which is why the plain row hash suffices there.
    """
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns], F.lit(42)), F.lit(salt)),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")
