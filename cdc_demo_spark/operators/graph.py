"""Connected components over a pair/edge DataFrame — the step that
turns near-duplicate PAIRS into duplicate CLUSTERS (pick one survivor
per cluster, drop the rest), which is what a corpus dedup pipeline
actually ships.

Algorithm: min-label propagation accelerated with pointer jumping.
Every node starts labeled with itself; each round every node takes the
min label in its closed neighborhood, then labels are shortcut through
themselves (label <- label of label — the path-doubling trick), so a
path of length d converges in O(log d) rounds instead of O(d): a
1000-hop chain needs ~10 rounds, not 1000. Stop when no label changes;
if the round budget is ever exhausted before convergence the operator
RAISES rather than silently returning a partial clustering. Each round
is two joins + one aggregate on the EDGE/LABEL lists only — node
payloads never move. (Same building blocks as large-star/small-star,
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014.)

At 100 TB the edge list after LSH banding is ~linear in corpus size
and near-dup components are small and dense, so rounds ≈ 2-3; the
log-diameter bound is the adversarial-chain guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — component = min node id reachable from `id`.

    `nodes` carries every id (isolated docs form their own singleton
    cluster); `edges` is undirected (symmetrized internally). The
    driver loop only checks a convergence COUNT per round — data stays
    distributed; lineage is cut each round with localCheckpoint so the
    plan doesn't grow exponentially across iterations."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))

    for _ in range(max_iter):
        # min label among self + neighbors
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
            .unionByName(labels)
            .groupBy("u")
            .agg(F.min("label").alias("new_label"))
        )
        # pointer jumping: follow the new label one more hop (label of
        # label) — doubles the propagation distance per round
        jumped = (
            neighbor_labels.alias("n")
            .join(
                neighbor_labels.select(
                    F.col("u").alias("new_label"), F.col("new_label").alias("jump")
                ).alias("p"),
                "new_label",
                "left",
            )
            .select("u", F.least("new_label", F.coalesce("jump", "new_label")).alias("new_label"))
        )
        merged = labels.join(jumped, "u").localCheckpoint(eager=True)
        changed = merged.filter(F.col("label") != F.col("new_label")).limit(1).count()
        labels = merged.select("u", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(graph diameter > 2^{max_iter}); raise max_iter"
        )
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("component"))


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node points its LARGER neighbors at
    the minimum of its closed neighborhood. Emits (v, m) for v > u."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node points its SMALLER-or-equal
    neighbors (and itself) at the neighborhood minimum. Operates on the
    directed edge list (u > v after large-star)."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    return (
        directed.join(m, "u")
        .select(
            F.explode(F.array(F.col("v"), F.col("u"))).alias("u"), F.col("m").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    round_stats: list | None = None,
    driver_edge_cap: int = 1_000_000,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — same contract as :func:`connected_components`.

    Why a second algorithm: label propagation re-joins the FULL edge
    list against the label table every round, so each round costs
    O(|E|) shuffle no matter how converged the graph already is. The
    star rounds instead REWRITE the edge list toward stars — after a
    couple of rounds most components are already (node → min) spokes
    and the working set stops shrinking only when done. On a 100 TB
    corpus where near-dup components are small, the edge list collapses
    to its final size in ~2 rounds and later rounds touch almost
    nothing. Rounds are O(log² n) worst-case alternating, O(log n)
    observed; per-round cost is two slim (u,v)-pair shuffles.

    Convergence: a round that leaves the edge set unchanged (checked
    exactly with exceptAll on the slim pairs, not a hash heuristic)
    means every component is a star rooted at its minimum.

    ``round_stats``, when a list is passed, receives the edge count
    after each round — the observability hook for the 100 TB question
    "is the working set actually contracting?".  The counts reuse the
    convergence check's jobs (no extra action), are logged at INFO, and
    are pinned by the dense-clique test in tests/test_dedup.py: a
    clique collapses to its star in one round, so a quadratic edge set
    must drop to (n-1) spokes immediately and never grow again.

    ``driver_edge_cap`` (r16 optimization round): a deduped edge list
    at or under the cap is solved with a DRIVER-SIDE min-label
    union-find instead of the distributed rounds — the same answer
    (component = min reachable id; union-by-min == least/greatest star
    convergence, for any orderable id type) from ONE bounded collect
    (≤ cap slim (u, v) pairs — the count that gates it is the count
    the distributed path already ran first).  Rationale: each star
    round is ~6 shuffle stages + an eager checkpoint + two action
    jobs, so on the near-dup graphs this operator actually sees
    (pairs ≈ thousands after LSH verification) the scheduler overhead
    of 2-3 rounds dominated the composite's component stage — measured
    13.5 s → ~1 s at the 200k bench fixture (3.5k edges).  Above the
    cap — the genuinely-distributed regime — nothing changes.  When
    ``round_stats`` is requested the distributed rounds always run
    (the hook observes THEM).

    TUNABLE, with its cost model stated (r16 ADVICE): the collect at
    the 1M default is ~1M slim Row objects — roughly 100-200 MB of
    transient driver heap (Rows are heavier than their payload), well
    inside the repo's 8g driver but a real bet on small drivers; the
    union-find itself is near-linear (path-halving).  Size
    driver_edge_cap to the driver heap you actually run with, or pass
    0 to force the distributed rounds (equality between the two paths
    is pinned by tests/test_dedup.py::
    test_cc_star_distributed_path_equals_driver)."""
    import logging

    log = logging.getLogger(__name__)
    slim = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if round_stats is None:
        # Cap gate and fetch in ONE action (r17 optimization round):
        # the previous shape ran checkpoint + count + collect — three
        # jobs — before the driver union-find even started, pure
        # scheduler latency on the few-thousand-edge graphs this path
        # exists for.  limit(cap+1) bounds the collect to the same
        # driver-memory bet the cap documents; cap+1 rows means the
        # graph is over the cap and the distributed rounds run (the
        # wasted sample is one bounded fetch, paid only by over-cap
        # graphs, which then do the full distributed work anyway).
        sample = slim.limit(int(driver_edge_cap) + 1).collect()
        if len(sample) <= driver_edge_cap:
            from pyspark.sql.types import StructField, StructType

            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            for r in sample:
                ra, rb = find(r["u"]), find(r["v"])
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            memb = [(x, find(x)) for x in list(parent)]
            utype = slim.schema["u"].dataType
            membership = slim.sparkSession.createDataFrame(
                memb,
                StructType(
                    [StructField("u", utype), StructField("component", utype)]
                ),
            )
            return (
                nodes.select(F.col(id_col).alias("u"))
                .join(F.broadcast(membership), "u", "left")
                .select(
                    F.col("u").alias(id_col),
                    F.coalesce("component", "u").alias("component"),
                )
            )
    cur = slim.localCheckpoint(eager=True)
    prev_n = cur.count()
    for rnd in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        n = nxt.count()
        log.info("cc_star round %d: %d -> %d edges", rnd, prev_n, n)
        if round_stats is not None:
            round_stats.append(n)
        if n == prev_n and nxt.exceptAll(cur).limit(1).count() == 0:
            cur = nxt
            break
        cur = nxt
        prev_n = n
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds; "
            "raise max_iter"
        )
    # stars point every non-root at the root; roots + isolated nodes map
    # to themselves
    membership = cur.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("component")
    )
    return (
        nodes.select(F.col(id_col).alias("u"))
        .join(membership, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.coalesce("component", "u").alias("component"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    damping: float = 0.85,
    iterations: int = 15,
) -> DataFrame:
    """(id, rank) — PageRank over an undirected pair list (each pair
    becomes two directed edges), the standard iterative-algorithm
    shape on this engine: a driver-side FOR loop over a fixed
    iteration count where each round is one join + one aggregate, with
    lineage cut per round (localCheckpoint) so the plan stays flat.

    Power iteration: rank <- (1-d)/N + d * Σ_in rank(src)/deg(src).
    Dangling nodes (no out-edges — only possible here for isolated
    nodes) keep the teleport mass.  Ranks are doubles and summation
    order is partition-dependent, so results are reproducible only to
    fp tolerance — callers wanting cross-engine determinism should
    round; the pytest oracle replays the same iteration in plain
    Python and compares to 1e-9 (tests/test_graph_pagerank.py).

    At scale each round shuffles the edge list once on src (join) and
    once on dst (aggregate) — O(iterations × |E|) total traffic, node
    payloads never move.  Degree skew (a hub doc near-dup to
    everything) fans its rank out in the join; AQE's skew splitting
    applies because it IS a plain join."""
    n_nodes = nodes.count()
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = sym.join(deg, "src").localCheckpoint(eager=False)
    ranks = nodes.select(
        F.col(id_col).alias("nid"), (F.lit(1.0) / n_nodes).alias("rank")
    )
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            out_edges.join(ranks, out_edges.src == ranks.nid)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("nid"))
            .join(contrib, F.col("nid") == contrib.dst, "left")
            .select(
                "nid",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("nid").alias(id_col), "rank")
