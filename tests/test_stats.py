"""Reference checks for the statistics readouts added in round 6's
session 6: ANOVA F against a direct numpy computation and the
time-weighted average against a scalar pandas recomputation. (The DuckDB
oracles prove cross-engine hash equality; these prove the *formulas* are
the intended statistics.)"""

from __future__ import annotations

import numpy as np

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)


def test_anova_f_matches_numpy_reference(spark, sf_dir):
    row = catalog.q_anova_f(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    groups = [g["value"].to_numpy() for _, g in ev.groupby("event_type")]
    k, N = len(groups), len(ev)
    grand = ev["value"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (N - k))
    assert row["k"] == k and row["n_total"] == N
    assert abs(row["ssb"] - ssb) < 1e-6 * ssb
    assert abs(row["ssw"] - ssw) < 1e-6 * ssw
    assert abs(row["f_stat"] - f_ref) < 1e-6 * max(1.0, abs(f_ref))


def test_time_weighted_avg_matches_pandas_reference(spark, sf_dir):
    got = {
        (r["user_id"], r["day_idx"]): (
            r["n_intervals"],
            r["total_dur"],
            r["twap"],
        )
        for r in catalog.q_time_weighted_avg(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["ep"] = np.floor(
        ev["ts"].astype("datetime64[us]").astype("int64") / 1e6
    ).astype("int64")
    ev["day_idx"] = ev["ep"] // 86400
    want = {}
    for key, g in ev.groupby(["user_id", "day_idx"]):
        g = g.sort_values(["ep", "event_id"])
        dur = g["ep"].shift(-1) - g["ep"]
        mask = dur.notna()
        if not mask.any():
            continue
        d = dur[mask].to_numpy()
        v = g["value"][mask].to_numpy()
        if d.sum() == 0:
            continue
        want[key] = (int(mask.sum()), int(d.sum()), float((v * d).sum() / d.sum()))
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0]
        assert got[key][1] == want[key][1]
        assert abs(got[key][2] - want[key][2]) < 1e-5 * max(
            1.0, abs(want[key][2])
        )
