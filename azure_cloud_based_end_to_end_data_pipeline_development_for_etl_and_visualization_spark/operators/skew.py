"""Skew-handling join: key salting.

AQE's skew-join splitting (on in ``session.get_spark``) handles most skew
at runtime by splitting oversized shuffle partitions — but it only works
for sort-merge joins and after a shuffle has already materialized. Salting
is the planning-time tool for the pathological case: one join key holding
a double-digit percentage of a 100 TB fact (the null-key or
default-value-key classic), where a single reducer would receive terabytes.

Rewrite: the skewed (big) side gets a deterministic salt in ``[0, n)``
derived from row content; the small side is replicated ``n`` times with
every salt value; the join adds the salt as an equality conjunct. Each
hot key's rows now spread over ``n`` reducers. Replication multiplies the
small side by ``n`` — keep it for dim-sized right sides (where broadcast
is unavailable, e.g. the dim exceeds the broadcast threshold but is still
far smaller than the fact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on`` with ``n_salts``-way salting.
    Supports row-preserving-on-left join types (inner/left/left_semi/
    left_anti are safe; right/full would double-count replicated rows)."""
    if how in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = list(on)
    non_keys = [c for c in skewed.columns if c not in keys] or keys
    left = skewed.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in non_keys]), F.lit(n_salts)).cast("int"),
    )
    right = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, keys + [_SALT], how).drop(_SALT)
