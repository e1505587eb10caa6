"""Property-based tests (hypothesis) — SURVEY.md §5's test plan:
merge idempotence/algebra and surrogate-key uniqueness/density on
arbitrary inputs, not just the fixture scenario.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.integers(min_value=0, max_value=20)
VALS = st.text(alphabet="abcxyz", min_size=0, max_size=4)
BATCH = st.dictionaries(KEYS, VALS, min_size=0, max_size=15)

prop = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, batch: dict[int, str]):
    if not batch:
        return spark.createDataFrame([], "k long, v string")
    return spark.createDataFrame(sorted(batch.items()), "k long, v string")


def _as_dict(df) -> dict[int, str]:
    return {r["k"]: r["v"] for r in df.collect()}


@prop
@given(target=BATCH, source=BATCH)
def test_merge_is_dict_update(spark, target, source):
    """SCD1 merge == Python dict.update: source wins on conflict, target
    survivors keep their values, nothing else appears."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.scd import (
        merge_scd1_df,
    )

    merged = _as_dict(merge_scd1_df(_df(spark, target), _df(spark, source), ["k"]))
    expected = dict(target)
    expected.update(source)
    assert merged == expected


@prop
@given(target=BATCH, source=BATCH)
def test_merge_idempotent_on_any_batch(spark, target, source):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.scd import (
        merge_scd1_df,
    )

    once = merge_scd1_df(_df(spark, target), _df(spark, source), ["k"])
    twice = merge_scd1_df(once, _df(spark, source), ["k"])
    assert _as_dict(once) == _as_dict(twice)


@prop
@given(keys=st.sets(KEYS, min_size=1, max_size=15), start=st.integers(1, 100))
def test_surrogate_keys_dense_unique(spark, keys, start):
    """row_number keys are exactly start..start+n-1 with no gaps or dups,
    regardless of input partitioning."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.relational import (
        with_surrogate_key,
    )

    df = spark.createDataFrame([(k,) for k in sorted(keys)], "k long").repartition(3)
    out = with_surrogate_key(df, ["k"], "sk", start_at=start)
    got = sorted(r["sk"] for r in out.collect())
    assert got == list(range(start, start + len(keys)))


@prop
@given(
    initial=st.dictionaries(KEYS, VALS, min_size=1, max_size=10),
    extra=BATCH,
)
def test_build_dim_preserves_existing_keys(spark, initial, extra):
    """Incremental dim build: existing business keys keep their surrogate
    keys; new ones get fresh keys above the high-water mark."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.star import (
        build_dim,
    )

    src0 = spark.createDataFrame(
        sorted(initial.items()), "bk long, attr string"
    )
    dim0 = build_dim(src0, ["bk"], ["attr"], "sk")
    mapping0 = {r["bk"]: r["sk"] for r in dim0.collect()}

    merged = dict(initial)
    merged.update(extra)
    src1 = spark.createDataFrame(sorted(merged.items()), "bk long, attr string")
    dim1 = build_dim(src1, ["bk"], ["attr"], "sk", existing=dim0)
    mapping1 = {r["bk"]: r["sk"] for r in dim1.collect()}

    hwm = max(mapping0.values())
    for bk, sk in mapping0.items():
        assert mapping1[bk] == sk  # stable keys for known business keys
    new_keys = [sk for bk, sk in mapping1.items() if bk not in mapping0]
    assert all(sk > hwm for sk in new_keys)
    assert len(set(mapping1.values())) == len(mapping1)  # unique


@prop
@given(
    keys=st.sets(KEYS, min_size=1, max_size=15),
    start=st.integers(1, 100),
    n_parts=st.integers(1, 5),
)
def test_fact_surrogate_keys_dense_unique(spark, keys, start, n_parts):
    """Two-phase fact-path keys are dense start..start+n-1 and unique on
    any partition layout (including empty partitions when n_parts > n)."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.relational import (
        with_surrogate_key_fact,
    )

    df = spark.createDataFrame(
        [(k,) for k in sorted(keys)], "k long"
    ).repartition(n_parts)
    out = with_surrogate_key_fact(df, "sk", start_at=start)
    got = sorted(r["sk"] for r in out.collect())
    assert got == list(range(start, start + len(keys)))
    # every input row survives with its payload intact
    assert sorted(r["k"] for r in out.collect()) == sorted(keys)


@prop
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-10**6, 10**6)),
        min_size=1,
        max_size=30,
    ),
    n_parts=st.integers(1, 4),
)
def test_exact_sums_matches_decimal_path(spark, vals, n_parts):
    """fastagg.exact_sums must be bit-identical to the dec_sum decimal
    path for values with <= 4 decimal digits, on any partition layout."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        dec_sum,
    )
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.fastagg import (
        exact_sums,
    )
    from pyspark.sql import functions as F

    rows = [(k, v / 10_000.0) for k, v in vals]
    df = spark.createDataFrame(rows, "k long, x double").repartition(n_parts)
    slow = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(dec_sum(F.col("x")).alias("s")).collect()
    }
    fast = {
        r["k"]: r["s"]
        for r in exact_sums(df, ["k"], {"s": (F.col("x"), 6)}).collect()
    }
    assert slow == fast


EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user
        st.integers(min_value=0, max_value=20_000),   # seconds offset
    ),
    min_size=1,
    max_size=40,
)


@prop
@given(events=EVENTS)
def test_sessionize_matches_python_reference(spark, events):
    """sessionize (two window passes) must equal the obvious sequential
    labeling for ANY event set: per user, sorted by (ts, event_id), a new
    session starts when the gap exceeds the threshold."""
    import datetime as dt

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.sessionize import (
        sessionize,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, user, base + dt.timedelta(seconds=off))
        for i, (user, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(
            df, "user_id", "ts", order_tiebreak="event_id", gap_seconds=600.0
        ).collect()
    }

    expected: dict[int, int] = {}
    by_user: dict[int, list] = {}
    for i, user, ts in rows:
        by_user.setdefault(user, []).append((ts, i))
    for user, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > 600.0:
                seq += 1
            expected[i] = seq
            prev = ts
    assert got == expected
