"""Iterative graph algorithms as DataFrame joins.

PageRank is the second iterative operator in the engine (after
``components.connected_components``): each iteration is ONE hash-join of
the narrow ``(src, dst)`` edge list with the ``(node, rank)`` vector plus
one map-side-combined aggregation by ``dst`` — the classic Pregel-free
formulation. Nothing driver-sized ever holds the graph: the only
driver-side values are the node count and the per-iteration dangling-rank
scalar (two 1-row aggregates).

Scale shape at 100 TB of edges: ranks are (long, double) pairs — the join
shuffles the edge list once per iteration on ``src`` and the contribution
aggregate shuffles (dst, double) partials. Pre-partitioning both sides on
the node id (bucketed edge tables) makes the per-iteration join
exchange-free; AQE handles hub-node skew the same way it handles any hot
aggregation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected simple graph, via DEGREE-ORDERED edge orientation (the
    standard distributed formulation — Suri & Vassilvitskii, WWW 2011):
    orient every edge from its lower-(degree, id) endpoint to the higher,
    so each triangle is counted exactly once as an oriented wedge
    ``a->b->c`` closed by the oriented edge ``a->c``, and — the scale
    property — the wedge join fans out per-node by ORIENTED out-degree,
    which is O(sqrt(m)) even at hub nodes, instead of the unordered
    formulation's deg² blowup on hubs.

    Input edges must be canonical undirected pairs (``src < dst``, no
    duplicates, no self-loops). Both joins are equi-joins on node ids —
    shuffle keys are narrow longs; nothing graph-sized reaches the
    driver. Returns ONE row: ``n_nodes, n_edges, n_wedges`` (unordered
    two-paths, ``sum_v C(deg v, 2)`` — exact via integer ``div``),
    ``n_triangles``, and ``clustering_coeff = 3*T/W`` (the only double,
    a two-op expression tree reproducible across engines)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # both endpoints from ONE explode over a single scan: the
    # union-of-two-selects form re-ran the (typically expensive basket
    # pair) edge pipeline once per branch — no exchange sits at its
    # top, so nothing is reused across union branches
    deg = (
        e.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: lower (deg, id) -> higher (deg, id); total order so every
    # edge gets exactly one direction
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("d_src"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("d_dst"))
    src_first = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    oriented = (
        e.join(d1, "src")
        .join(d2, "dst")
        .select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        )
    )
    a, b, c = oriented.alias("a"), oriented.alias("b"), oriented.alias("c")
    tri = (
        a.join(b, F.col("a.hi") == F.col("b.lo"))
        .join(
            c,
            (F.col("c.lo") == F.col("a.lo")) & (F.col("c.hi") == F.col("b.hi")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(deg * (deg - 1)) div 2").alias("n_wedges"),
    )
    edge_n = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        node_stats.crossJoin(F.broadcast(edge_n))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            # NULL (not 0/0) when the graph has no wedges at all — e.g.
            # a perfect matching; caught by the hypothesis property test
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
            ).alias("clustering_coeff"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Standard damped PageRank with uniform dangling-mass redistribution:

    ``r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling/N)``

    Fixed ``n_iters`` power iterations (deterministic output shape — no
    convergence-test collect per iteration beyond the dangling scalar).
    Returns ``(node, rank)``; ranks sum to 1 up to float error."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).cache()
    for _ in range(n_iters):
        with_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
        # dangling nodes (no out-edges) spread their rank uniformly
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("s")
        ).collect()[0]["s"]
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_rank"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .cache()
        )
        new_ranks.count()  # materialize before dropping the parent
        ranks.unpersist()
        ranks = new_ranks
    return ranks


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 4,
    scale: int = 10**12,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Integerized PageRank (damping fixed at 85/100) with DEFINED
    integer-division truncation semantics — every arithmetic step is a
    bigint op (``div``, ``*``, ``+``, ``sum``), so the result is
    bit-reproducible across engines and layouts: a DuckDB unrolled-CTE
    twin computes the identical ranks, upgrading PageRank from a
    rows-only claim to a cross-engine hash check (the float
    :func:`pagerank` remains the general-purpose form).

    Recurrence (all ``div`` = truncating integer division):

    ``r0(v) = scale div N``
    ``r'(v) = (15 * (scale div N)) div 100
              + (85 * sum_{u->v} (r(u) div deg(u))) div 100``

    Requires every node to have out-degree >= 1 (raises otherwise —
    dangling-mass redistribution needs a per-iteration scalar that
    would reintroduce floats; orient graphs both directions, as the
    supply-graph query does, and the condition holds by construction).

    Scale shape: per iteration one edge shuffle keyed by dst with a
    map-side-combined sum, plus one node-sized left join re-attaching
    the sums to the node/degree table. Degrees RIDE THE RANK VECTOR
    (the node table carries ``__pr_deg``), so the old per-iteration
    ranks x degrees join is gone — the contribution projection is a
    map-only expression (r15; guide §2.4). The node set and the
    out-degrees come from ONE explode aggregation over the checkpointed
    edge list (each edge contributes ``src`` with weight 1 and ``dst``
    with weight 0), replacing the separate union-distinct + groupBy
    passes, and the node count + dangling check fuse into one scalar
    aggregate over that table. The EDGE LIST is checkpointed once up
    front — it feeds every iteration's contribution join, and upstream
    it is typically an expensive distinct over a fact scan that must
    not re-run per round (measured 7.0 s -> 2.3 s at sf0.1 on the
    supply graph). Ranks are ``localCheckpoint``ed every
    ``checkpoint_every`` rounds to truncate lineage (the k_core / BPE
    lesson). The only driver scalars are the fused (node count,
    dangling count) row."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    ndeg = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("node"), F.lit(1).alias("__c")),
                    F.struct(F.col("dst").alias("node"), F.lit(0).alias("__c")),
                )
            ).alias("__nd")
        )
        .select("__nd.node", "__nd.__c")
        .groupBy("node")
        .agg(F.sum("__c").cast("long").alias("__pr_deg"))
        .localCheckpoint(eager=True)
    )
    stats = ndeg.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(F.col("__pr_deg") == 0, 1).otherwise(0)).alias("__nd"),
    ).collect()[0]
    n, n_dangling = stats["__n"], int(stats["__nd"] or 0)
    if n_dangling:
        raise ValueError(
            f"pagerank_int: {n_dangling} dangling node(s) (no out-edges); "
            "integerized PageRank requires out-degree >= 1 everywhere — "
            "orient the graph both directions or use pagerank()"
        )
    base = (15 * (scale // n)) // 100
    ranks = ndeg.withColumn("rank_i", F.lit(scale // n).cast("long"))
    for it in range(n_iters):
        contrib = ranks.select(
            "node", F.expr("rank_i div __pr_deg").alias("__pr_c")
        )
        insum = (
            e.join(contrib, e["src"] == contrib["node"])
            .groupBy("dst")
            .agg(F.sum("__pr_c").cast("long").alias("__pr_s"))
        )
        ranks = ndeg.join(insum, ndeg["node"] == insum["dst"], "left").select(
            "node",
            "__pr_deg",
            (
                F.lit(base).cast("long")
                + F.expr("(85 * coalesce(__pr_s, 0L)) div 100")
            ).cast("long").alias("rank_i"),
        )
        # lineage control only when the loop is DEEP: each round nests
        # one join+agg, and short runs (the 4-iteration exact query)
        # execute fastest as one lazy multi-stage job — a per-round
        # eager checkpoint added 4 materialization barriers for nothing
        # (measured 4.6 s -> 3.5 s at sf0.1 dropping them). Long runs
        # still truncate every `checkpoint_every` rounds (k_core/BPE
        # re-analysis lesson).
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank_i")


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    with degree < k (and their edges) until a fixpoint — the standard
    subgraph-density filter (the k-core is the maximal subgraph where
    every node keeps >= k neighbors), used to strip low-signal periphery
    before community/embedding work.

    Input: canonical undirected edges (``src < dst``, deduped, no
    self-loops). Each peel round is two narrow aggregations (degrees)
    plus two semi-joins filtering the edge list — shuffle keys are node
    ids only, nothing graph-sized reaches the driver (the per-round
    survivor count is the one scalar, doubling as the convergence test;
    peeling monotonically shrinks, so rounds <= initial node count and
    ``max_iters`` is a safety rail). The edge list is
    ``localCheckpoint``ed every round — cache alone keeps the FULL
    nested-join lineage alive for Catalyst, and re-analysis cost grows
    super-linearly with rounds (the BPE lesson: a 50-round loop went
    from unbounded to seconds). Returns ``(node, core_degree)`` for the
    surviving subgraph."""
    cur = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
    # convergence on the EDGE count (r14): a peeled node had deg >= 1
    # (nodes exist only via edges), so removing any node strictly
    # shrinks the edge list — edges unchanged iff no node was dropped,
    # i.e. fixpoint. Counting the just-checkpointed edge list is nearly
    # free, where the old per-round survivor-node count ran the degree
    # aggregation a second time (two jobs per round -> one; measured
    # 2.54 s -> 2.29 s on the q_kcore graph at sf0.1, same output).
    prev_m = cur.count()
    converged = False
    for _ in range(max_iters):
        deg = (
            cur.select(F.col("src").alias("node"))
            .union(cur.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        m = cur.count()
        if m == prev_m:
            converged = True
            break
        prev_m = m
    if not converged:
        # The loop observes convergence via an extra confirming round
        # (m == prev_m), so max_iters == rounds-actually-needed
        # would discard a correct result. One final degree check settles
        # it: if every surviving node already has degree >= k, the peel
        # IS at the fixpoint (round-7 ADVICE).
        deg = (
            cur.select(F.col("src").alias("node"))
            .union(cur.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        converged = deg.filter(F.col("deg") < k).limit(1).count() == 0
    if not converged:
        raise RuntimeError(
            f"k_core: peeling did not reach a fixpoint within "
            f"max_iters={max_iters} rounds (last surviving edge count "
            f"{prev_m}); the result would NOT be a true {k}-core — "
            f"raise max_iters (each round strictly shrinks the edge "
            f"set plus one confirming round, so edge-count + 1 rounds "
            f"always suffice)"
        )
    out = (
        cur.select(F.col("src").alias("node"))
        .union(cur.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    return out


def local_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient
    ``lcc(v) = 2*T_v / (deg_v * (deg_v - 1))`` over an undirected simple
    graph — the node-level refinement of :func:`triangle_stats` (whose
    one global coefficient this decomposes).

    Triangles enumerate through the same degree-ordered orientation
    (Suri & Vassilvitskii, WWW 2011) so the wedge join fans out by
    oriented out-degree ~ O(sqrt(m)) even at hubs; the only change from
    the counting form is that the closing edge joins INNER (not semi) so
    each triangle surfaces once as its corner triple ``(lo, mid, hi)``,
    and the three corners explode into a narrow ``(node)`` stream that
    one map-side-combined aggregate turns into per-node counts. Shuffle
    keys are single longs throughout; nothing graph-sized reaches the
    driver.

    Input edges must be canonical undirected pairs (``src < dst``, no
    duplicates, no self-loops). Returns ``(node, deg, n_tri, lcc)`` for
    every node with ``deg >= 2`` (degree-1 nodes have no defined
    coefficient); ``lcc`` is one IEEE division of exact integers, so the
    readout is oracle-hashable."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # single-scan endpoint explode (triangle_stats rationale): the
    # unionAll form re-ran the upstream edge pipeline per branch
    deg = (
        e.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("d_src"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("d_dst"))
    src_first = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    oriented = (
        e.join(d1, "src")
        .join(d2, "dst")
        .select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        )
    )
    a, b, c = oriented.alias("a"), oriented.alias("b"), oriented.alias("c")
    corners = (
        a.join(b, F.col("a.hi") == F.col("b.lo"))
        .join(
            c,
            (F.col("c.lo") == F.col("a.lo")) & (F.col("c.hi") == F.col("b.hi")),
        )
        .select(
            F.col("a.lo").alias("x"), F.col("a.hi").alias("y"),
            F.col("b.hi").alias("z"),
        )
    )
    # all three corners from one pass over the triangle stream — the
    # triple unionAll re-ran the two wedge joins once per corner
    tri = (
        corners.select(
            F.explode(
                F.array(F.col("x"), F.col("y"), F.col("z"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            (
                (F.lit(2) * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            ).alias("lcc"),
        )
    )
