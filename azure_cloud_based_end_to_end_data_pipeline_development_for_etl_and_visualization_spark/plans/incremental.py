"""Incremental aggregate maintenance (materialized-view refresh).

The 100 TB point: a daily rollup over an append-only fact must NOT rescan
history — it aggregates the new batch alone and merges the partial state
into the stored rollup. That only works if the aggregate state is
mergeable and exact:

- counts and sums merge by addition;
- sums are carried as ``decimal`` partial state (not doubles), so the
  merged total is bit-identical to a full recompute regardless of how many
  batches the history arrived in — the same determinism contract as
  ``catalog.dec_sum``, extended across incremental refreshes. avg/stddev
  derive from (count, sum, sum-of-squares) state at read time.

``q_incremental_rollup`` hash-verifies merge(state(history), state(batch))
against the full-recompute SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type for partial sums: wide enough that per-batch sums never
#: round; re-cast after each merge to keep the state schema stable across
#: arbitrarily many refreshes.
STATE_DECIMAL = "decimal(28,6)"


def aggregate_state(
    df: DataFrame, keys: list[str], sums: dict[str, str]
) -> DataFrame:
    """Build mergeable rollup state: ``keys`` + ``n_rows`` + one exact
    decimal sum per ``{alias: source_col}`` entry."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(src).cast("decimal(18,6)"))
        .cast(STATE_DECIMAL)
        .alias(alias)
        for alias, src in sums.items()
    ]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_state(existing: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two rollup states (same schema): add counts and decimal sums
    per key. Keys present on only one side pass through (union semantics),
    so the refresh handles brand-new groups without special cases."""
    value_cols = [c for c in existing.columns if c not in keys]
    return (
        existing.unionByName(delta)
        .groupBy(*[F.col(k) for k in keys])
        .agg(
            *[
                F.sum(c).cast(STATE_DECIMAL if c != "n_rows" else "long").alias(c)
                for c in value_cols
            ]
        )
    )


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection of the stored state: decimal sums surfaced as
    doubles (the query-facing type), counts as longs."""
    value_cols = [c for c in state.columns if c not in keys]
    return state.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).cast("double").alias(c) if c != "n_rows" else F.col(c)
            for c in value_cols
        ],
    )


def incremental_join_delta(
    delta_left: DataFrame | None,
    prev_left: DataFrame | None,
    delta_right: DataFrame | None,
    new_right: DataFrame,
    on,
) -> DataFrame | None:
    """Incremental equi-JOIN maintenance for append-only inputs: the
    delta rows of ``L JOIN R`` when batches ``delta_left`` / ``delta_right``
    arrive are exactly

        dL JOIN (R_prev UNION dR)   union   L_prev JOIN dR

    (the dL-x-dR cross term is inside the first join; no term rescans
    L_prev x R_prev, which is the point — the materialized view appends
    these rows and never recomputes history). ``new_right`` must be the
    post-batch right side (R_prev UNION dR). Either delta may be None.

    Scale: each term joins a BATCH-sized side against one full side —
    broadcast the batch when it's small, hash-join otherwise; the
    history-x-history recompute a naive refresh pays never happens. Both
    sides append-only is the streaming-compatible case; updates/deletes
    need retraction rows (CDC apply — ``operators/diff`` + ``plans/scd``
    territory), deliberately out of this helper's scope."""
    parts = []
    if delta_left is not None:
        parts.append(delta_left.join(new_right, on))
    if delta_right is not None and prev_left is not None:
        parts.append(prev_left.join(delta_right, on))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
