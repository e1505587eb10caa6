"""As-of (point-in-time) join.

The reference has no temporal joins (SURVEY.md section 2.3: "Not present"),
but a training-data/event pipeline needs them constantly: attach the most
recent prior state (a view, a price, a feature snapshot) to each fact row.
Spark has no built-in ASOF JOIN, so this implements it as a composition of
existing DataFrame ops — the (a) strategy from the build brief.

Algorithm (backward as-of, ``left.ts >= right.ts``):

1. Project both sides to a narrow common shape and tag them
   (``side = 0`` for right/reference rows, ``1`` for left/probe rows).
2. ``unionByName`` and run one window per key ordered by
   ``(ts, side)`` — right rows sort before left rows at equal
   timestamps, so an exact-tie match is included, matching DuckDB/pandas
   ``merge_asof`` semantics.
3. ``last(value, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries each right
   row's payload forward to every later left row.
4. Keep only left rows; optionally null out matches older than
   ``tolerance`` seconds.

Scale shape: ONE shuffle (hash by key for the window), no join at all —
the classic union-window formulation that survives arbitrarily large
sides as long as a single key's rows fit an executor's spill budget.
A skewed key degrades to sort-spill, not OOM. Compare: the naive
``left JOIN right ON key AND l.ts >= r.ts`` + max() is a quadratic
non-equi join at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds

_MARK = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key(s) (left-outer: no match
    yields nulls). ``right_cols`` are the right payload columns to carry;
    each lands as ``<name><suffix>``; the matched right timestamp lands as
    ``<right_ts><suffix>``."""
    keys = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *right_cols]

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_MARK),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_MARK),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in carried],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    # Tiebreak: several right rows can share (key, ts); without a total
    # order, last(ignorenulls) picks whichever row the shuffle happened to
    # order last — nondeterministic across runs/layouts. Ordering by the
    # carried payload columns as well makes the pick the MAX payload tuple,
    # deterministically (mirrors sessionize's order_tiebreak).
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", _MARK, *[F.col(f"__r_{c}") for c in carried])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in carried
        ],
    ).filter(F.col(_MARK) == 1)

    if tolerance_seconds is not None:
        in_tol = epoch_seconds(F.col(f"__m_{right_ts}")) >= (
            epoch_seconds(F.col("__ts")) - F.lit(float(tolerance_seconds))
        )
        matched = matched.select(
            *[c for c in matched.columns if not c.startswith("__m_")],
            *[
                F.when(in_tol, F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in carried
            ],
        )

    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns if c not in keys]
    out_right = [F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in carried]
    return matched.select(*[F.col(k) for k in keys], *out_left, *out_right)
