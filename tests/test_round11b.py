"""Round-11 batch 4-9 pins: each tricky new query re-derived with a
pure-Python reference at sf0.001 (the DuckDB oracle already hash-checks
cross-engine at three SFs; these pins guard against BOTH engines
sharing one wrong formula — the q_gini precedent, where Spark and
DuckDB happily agreed on a misplaced parenthesis)."""

from __future__ import annotations

import math
import os
import sys
from collections import Counter, defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (  # noqa: E402
    catalog,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").collect()


def _lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()


def test_custdist_matches_python(spark, sf_dir):
    got = {
        r.c_count: r.custdist
        for r in catalog.q_custdist(spark, sf_dir).collect()
    }
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    per = Counter()
    for o in _orders(spark, sf_dir):
        per[o.o_custkey] += 1
    counts = Counter(per.get(c.c_custkey, 0) for c in cust)
    assert got == dict(counts)


def test_gamma_concordance_matches_python(spark, sf_dir):
    row = catalog.q_gamma_concordance(spark, sf_dir).collect()[0]
    cells = Counter()
    for li in _lineitem(spark, sf_dir):
        d = math.floor(li.l_discount * 100 + 0.5)
        qb = (int(li.l_quantity) - 1) // 10
        cells[(d, qb)] += 1
    conc = disc = 0
    for (d1, q1), n1 in cells.items():
        for (d2, q2), n2 in cells.items():
            if d2 > d1 and q2 > q1:
                conc += n1 * n2
            elif d2 > d1 and q2 < q1:
                disc += n1 * n2
    assert row.conc == float(conc) and row.disc == float(disc)
    assert abs(row.gamma - (conc - disc) / (conc + disc)) < 1e-12


def test_cochran_q_matches_python(spark, sf_dir):
    row = catalog.q_cochran_q(spark, sf_dir).collect()[0]
    flags = defaultdict(dict)
    for li in _lineitem(spark, sf_dir):
        yr = li.l_shipdate.year
        if 1995 <= yr <= 1997:
            k = flags[li.l_partkey]
            k[yr] = max(k.get(yr, 0), 1 if li.l_returnflag == "R" else 0)
    blocks = [f for f in flags.values() if len(f) == 3]
    c = [sum(f[y] for f in blocks) for y in (1995, 1996, 1997)]
    rs = [sum(f.values()) for f in blocks]
    assert (row.n_blocks, row.c1, row.c2, row.c3) == (
        len(blocks), c[0], c[1], c[2],
    )
    assert row.sum_r == sum(rs) and row.sum_r2 == sum(r * r for r in rs)
    q = (2.0 * (3.0 * sum(x * x for x in c) - sum(rs) ** 2)) / (
        3.0 * sum(rs) - sum(r * r for r in rs)
    )
    assert abs(row.q_stat - q) < 1e-9


def test_durbin_watson_matches_python(spark, sf_dir):
    row = catalog.q_durbin_watson(spark, sf_dir).collect()[0]
    monthly = Counter()
    for o in _orders(spark, sf_dir):
        m = (o.o_orderdate.year, o.o_orderdate.month)
        monthly[m] += math.floor(o.o_totalprice * 100 + 0.5)
    xs = [monthly[m] for m in sorted(monthly)]
    n, s = len(xs), sum(xs)
    e = [n * x - s for x in xs]
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, len(e)))
    den = sum(v * v for v in e)
    assert row.n_months == n
    assert abs(row.dw - num / den) < 1e-9


def test_partial_corr_matches_python(spark, sf_dir):
    row = catalog.q_partial_corr(spark, sf_dir).collect()[0]
    xs, ys, zs = [], [], []
    for li in _lineitem(spark, sf_dir):
        xs.append(math.floor(li.l_extendedprice * 100 + 0.5))
        ys.append(int(li.l_quantity))
        zs.append(math.floor(li.l_discount * 100 + 0.5))
    n = float(len(xs))

    def r(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        return (n * sab - sa * sb) / (
            math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        )

    rxy, rxz, ryz = r(xs, ys), r(xs, zs), r(ys, zs)
    want = (rxy - rxz * ryz) / (
        math.sqrt(1 - rxz * rxz) * math.sqrt(1 - ryz * ryz)
    )
    assert abs(row.partial_rxy_z - want) < 1e-9


def test_edit_distance_pairs_verified_by_python(spark, sf_dir):
    """Every emitted pair must satisfy the threshold under a textbook
    Python Levenshtein on the same normalized text, and the length
    prune must not have dropped any qualifying LSH candidate (checked
    via the edit-distance lower bound |la-lb| <= d)."""
    import re

    rows = catalog.q_edit_distance_dedup(spark, sf_dir).collect()
    docs = {
        r.doc_id: re.sub(r"\s+", " ", r.text.lower().strip())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                ))
            prev = cur
        return prev[-1]

    assert rows, "expected at least one verified pair at sf0.001"
    for r in rows:
        d = lev(docs[r.a], docs[r.b])
        assert d == r.edit_dist
        assert 5 * d <= max(r.la, r.lb)
        # the prune's soundness argument: d >= |la - lb| always
        assert abs(r.la - r.lb) <= d


def test_mutual_knn_reciprocity(spark, sf_dir):
    """Every emitted pair is reciprocal (both ranks <= 5), symmetric-sim,
    and a < b exactly once."""
    rows = catalog.q_mutual_knn_pairs(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.a < r.b
        assert 1 <= r.rank_ab <= 5 and 1 <= r.rank_ba <= 5
        assert (r.a, r.b) not in seen
        seen.add((r.a, r.b))


def test_mixture_interleave_stride_property(spark, sf_dir):
    """The schedule head consumes sources roughly proportionally to
    their weights: at any prefix, source s has taken ceil-ish
    pos_key/1e6*rate docs — verify positions are the exact integer
    stride keys and the head is sorted."""
    rows = catalog.q_mixture_interleave(spark, sf_dir).collect()
    assert [r.global_pos for r in rows] == list(range(1, len(rows) + 1))
    keys = [r.pos_key for r in rows]
    assert keys == sorted(keys)
    rates = {"src0": 900, "src1": 700, "src2": 500, "src3": 100}
    per = Counter()
    for r in rows:
        per[r.source] += 1
        rate = rates.get(r.source, 300)
        assert r.pos_key == per[r.source] * 1000000 // rate
    # the heavier-weighted source appears at least as often as the
    # lightest in the head
    if "src0" in per and "src3" in per:
        assert per["src0"] >= per["src3"]


def test_multiset_ops_multiplicities(spark, sf_dir):
    """INTERSECT ALL keeps min(m, n) copies; EXCEPT ALL keeps m - n."""
    rows = catalog.q_multiset_ops(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    a = Counter(
        c.c_nationkey for c in cust if c.c_mktsegment == "AUTOMOBILE"
    )
    b = Counter(
        c.c_nationkey for c in cust if c.c_mktsegment == "BUILDING"
    )
    want_i = Counter()
    want_e = Counter()
    for k in a:
        if k in b:
            want_i[k] = min(a[k], b[k])
        if a[k] > b.get(k, 0):
            want_e[k] = a[k] - b.get(k, 0)
    got_i = Counter(
        r.c_nationkey for r in rows if r.op == "intersect_all"
    )
    got_e = Counter(r.c_nationkey for r in rows if r.op == "except_all")
    assert got_i == {k: v for k, v in want_i.items() if v > 0}
    assert got_e == {k: v for k, v in want_e.items() if v > 0}


def test_streaming_neardup_equals_batch_incremental(spark, sf_dir):
    """The streaming ingest twin must reproduce the batch incremental
    pair set exactly — same (a, b) pairs, bit-identical jaccard (both
    share one DuckDB oracle, but this pins the two SPARK executions to
    each other directly, state-store path included)."""
    got_s = sorted(
        (r.a, r.b, r.jaccard)
        for r in catalog.q_streaming_neardup_ingest(spark, sf_dir).collect()
    )
    got_b = sorted(
        (r.a, r.b, r.jaccard)
        for r in catalog.q_dedup_incremental(spark, sf_dir).collect()
    )
    assert got_s == got_b
    assert got_s, "expected at least one incremental near-dup pair"
