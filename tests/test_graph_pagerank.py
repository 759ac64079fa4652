"""PageRank: distributed power iteration equals a plain-Python replay
of the same recurrence, and known structural facts hold."""

from __future__ import annotations

from cdc_demo_spark.operators.graph import pagerank


def _py_pagerank(n_ids, pairs, d=0.85, iters=15):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ranks = {i: 1.0 / len(n_ids) for i in n_ids}
    tp = (1.0 - d) / len(n_ids)
    for _ in range(iters):
        incoming = {i: 0.0 for i in n_ids}
        for u, vs in adj.items():
            share = ranks[u] / len(vs)
            for v in vs:
                incoming[v] += share
        ranks = {i: tp + d * incoming[i] for i in n_ids}
    return ranks


def test_pagerank_matches_python_replay(spark):
    ids = list(range(12))
    # a hub (0), a chain, an isolated node (11)
    pairs = [(0, i) for i in range(1, 8)] + [(8, 9), (9, 10)]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    want = _py_pagerank(ids, pairs)
    assert set(got) == set(want)
    for i in ids:
        assert abs(got[i] - want[i]) < 1e-9, i

    # structure: the hub outranks every spoke; the isolated node holds
    # exactly the teleport mass (its own mass leaks — standard
    # uncorrected dangling behavior, matched by the oracle)
    assert all(got[0] > got[i] for i in range(1, 8))
    assert abs(got[11] - 0.15 / 12) < 1e-12


def test_pagerank_conserves_mass_without_dangling_nodes(spark):
    """On a graph where every node has an out-edge, power iteration
    redistributes all mass: ranks must sum to 1."""
    ids = list(range(6))
    pairs = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3)]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # symmetric ring + one chord: the chord endpoints outrank the rest
    assert min(got[0], got[3]) > max(got[i] for i in (1, 2, 4, 5))
