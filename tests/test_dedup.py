"""Dedup operator tests (B51): exact survivor choice, MinHash-LSH vs
exact Jaccard, SimHash invariances, fingerprint canonicalization."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_demo_spark.operators import dedup as D
from cdc_demo_spark.operators.text import content_fingerprint

# wide vocabulary: random docs must differ in token SET, not just order
# (with a tiny vocab every doc covers the whole set and simhash collapses)
VOCAB = [f"word{i:03d}" for i in range(150)]


def corpus(spark, n=60, seed=4, with_dups=True):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(rng.randrange(30, 60))]
        rows.append((i, " ".join(toks)))
    if with_dups:
        # plant exact dup + near dup (one token changed) + reordered dup
        base = rows[0][1]
        toks = base.split()
        near = toks[:]
        near[len(near) // 2] = "CHANGED"
        rows.append((1000, base))                      # exact
        rows.append((1001, " ".join(near)))            # near (1 token)
        rng2 = random.Random(99)
        shuffled = toks[:]
        rng2.shuffle(shuffled)
        rows.append((1002, " ".join(shuffled)))        # bag-equal
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    df = corpus(spark)
    kept = D.exact_dedup(df, ["text"], "doc_id")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids and 1000 not in ids  # min-id survivor of the exact pair
    assert kept.count() == df.count() - 1


def test_duplicate_groups(spark):
    groups = D.duplicate_groups(corpus(spark), ["text"])
    assert groups.count() == 1
    assert groups.collect()[0]["n_dups"] == 2


def test_minhash_matches_exact_jaccard(spark):
    """LSH candidates, verified at threshold, must equal the exact
    jaccard pair set at the same threshold (no false positives by
    construction; recall via banding)."""
    df = corpus(spark)
    exact = {(r["id_a"], r["id_b"]) for r in
             D.jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           D.minhash_near_duplicates(df, "doc_id", "text", threshold=0.5).collect()}
    assert lsh <= exact            # verification kills false positives
    assert (0, 1000) in lsh        # exact dup found
    assert (0, 1001) in lsh        # 1-token near dup found
    # banding at 64/16 has >99.9% recall at jaccard>=0.8; spot-check high-sim pairs
    high = {(r["id_a"], r["id_b"]) for r in
            D.jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()}
    assert high <= lsh


def test_simhash_exact_dup_same_hash_and_hamming(spark):
    df = corpus(spark)
    sig = {r["id"]: r["simhash"] for r in D.simhash(df, "doc_id", "text").collect()}
    assert sig[0] == sig[1000]  # identical text -> identical simhash
    assert sig[0] == sig[1002]  # token-set equal -> identical (distinct tokens)
    # one changed token flips only low-margin bits: near vs a random doc
    ham_near = bin(sig[0] ^ sig[1001]).count("1")
    ham_far = bin(sig[0] ^ sig[5]).count("1")
    assert ham_near < ham_far
    # multi-probe blocking: hamming=0 pairs guaranteed; the near pair is
    # found whenever any 16-bit chunk survived the token swap
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.simhash_near_duplicates(df, "doc_id", "text", max_distance=ham_near).collect()}
    assert (0, 1000) in pairs
    assert (0, 1002) in pairs
    assert (1000, 1002) in pairs


def test_fingerprint_is_order_insensitive(spark):
    df = corpus(spark)
    fp = {r["doc_id"]: r["fp"] for r in
          df.select("doc_id", content_fingerprint("text").alias("fp")).collect()}
    assert fp[0] == fp[1002]   # reordered tokens, same bag -> same fingerprint
    assert fp[0] != fp[1001]   # changed token -> different


def test_jaccard_df_cap_bounds_adversarial_fanout(spark):
    """A shingle shared by EVERY document (boilerplate header) must not
    create O(n²) candidate pairs once df_cap kicks in. The capped run
    drops the universal shingle from the universe; docs that share only
    boilerplate produce zero pairs, while genuinely-similar docs are
    unaffected (their overlap is in rare shingles)."""
    import random

    rng = random.Random(7)
    boiler = "copyright acme corp all rights reserved"
    rows = []
    for i in range(80):
        toks = [rng.choice(VOCAB) for _ in range(25)]
        rows.append((i, boiler + " " + " ".join(toks)))
    rows.append((1000, rows[0][1]))  # one true near-exact pair
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3, df_cap=20)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # boilerplate-only overlap pairs are gone; the true dup survives
    assert (0, 1000) in got
    assert len(got) < 10  # uncapped, every one of the ~3200 pairs co-occurs

    # candidate fan-out itself is bounded: with the cap, no shingle in
    # the joined universe has DF > cap
    sh = D.shingles(df, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
    assert dfreq.filter(F.col("c") > 20).count() > 0  # adversarial shingles exist
    # uncapped pair count explodes vs capped (sanity on the mechanism)
    uncapped = D.jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.0, df_cap=None)
    assert uncapped.count() > 3000


def test_connected_components_chain_and_singletons(spark):
    """A 6-node chain (worst-case diameter for propagation), a triangle,
    and isolated nodes must all label as min-id components."""
    from cdc_demo_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    edges = spark.createDataFrame(
        # chain 0-1-2-3-4-5, triangle 6-7-8 (9,10,11 isolated)
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["component"]
           for r in connected_components(nodes, edges).collect()}
    assert all(got[i] == 0 for i in range(6))
    assert all(got[i] == 6 for i in (6, 7, 8))
    assert all(got[i] == i for i in (9, 10, 11))


def test_connected_components_long_chain_converges_fast(spark):
    """Pointer jumping: a 120-node path (diameter 119) must converge
    well inside the round budget — plain min-propagation would need 119
    rounds and previously returned a silently-partial clustering."""
    from cdc_demo_spark.operators.graph import connected_components

    n = 120
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components(nodes, edges, max_iter=12).collect()}
    assert set(got.values()) == {0} and len(got) == n


def test_star_cc_long_chain_iteration_bound(spark):
    """The star-contraction CC (now the default for q_dedup_clusters)
    must close a 120-node path (diameter 119) within a log-scale round
    budget — the operator RAISES on budget exhaustion, so passing here
    IS the iteration-bound assertion for adversarial chain graphs."""
    from cdc_demo_spark.operators.graph import connected_components_star

    n = 120
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"]
           for r in connected_components_star(nodes, edges, max_iter=12).collect()}
    assert set(got.values()) == {0} and len(got) == n


def test_star_cc_matches_label_propagation(spark):
    """large-star/small-star must produce the identical clustering as
    pointer-jumping label propagation on a mixed graph (chain, triangle,
    isolated nodes) and on random graphs — same (id, component) rows."""
    import random

    from cdc_demo_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8)],
        "id_a long, id_b long",
    )
    a = {(r["id"], r["component"]) for r in connected_components(nodes, edges).collect()}
    b = {(r["id"], r["component"])
         for r in connected_components_star(nodes, edges).collect()}
    assert a == b

    rng = random.Random(7)
    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    a = {(r["id"], r["component"]) for r in connected_components(nodes, edges).collect()}
    b = {(r["id"], r["component"])
         for r in connected_components_star(nodes, edges).collect()}
    assert a == b


def test_star_cc_long_chain(spark):
    """The adversarial 120-node path: star rounds are O(log^2 n)
    worst-case — must converge inside a 25-round budget and label the
    whole chain with its minimum."""
    from cdc_demo_spark.operators.graph import connected_components_star

    n = 120
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"]
           for r in connected_components_star(nodes, edges).collect()}
    assert set(got.values()) == {0} and len(got) == n


def test_star_cc_self_loops_and_duplicate_edges(spark):
    """Self-loops and repeated/reversed edges must not break or inflate
    the clustering."""
    from cdc_demo_spark.operators.graph import connected_components_star

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(
        [(0, 0), (1, 2), (2, 1), (1, 2), (3, 3)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"]
           for r in connected_components_star(nodes, edges).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4}


def test_benchmark_contamination_counts(spark):
    """Hand-checkable corpus: doc sharing one 3-gram with the benchmark
    gets exactly that overlap; a fully-contained doc hits 100%."""
    from cdc_demo_spark.operators.dedup import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )  # shingles: {a b c, b c d, c d e}
    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),   # shingles: a b c | b c x | c x y | x y z -> 1/4 hit
            (2, "b c d e"),       # shingles: b c d | c d e -> 2/2 hit
            (3, "q r s t"),       # no overlap
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_shingles"], r["n_hits"], r["contamination"])
        for r in benchmark_contamination(docs, bench, "doc_id", "text", k=3).collect()
    }
    assert got[1] == (4, 1, 0.25)
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (2, 0, 0.0)


def test_cc_both_algorithms_match_union_find(spark):
    """Property: on arbitrary random graphs, BOTH distributed CC
    algorithms must equal a sequential union-find oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cdc_demo_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    @st.composite
    def graphs(draw):
        n = draw(st.integers(min_value=1, max_value=25))
        m = draw(st.integers(min_value=0, max_value=40))
        edges = [
            (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
            for _ in range(m)
        ]
        return n, edges

    def union_find(n, edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # canonical label = min node id in the component
        return {x: find(x) for x in range(n)}

    @given(graphs())
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(g):
        n, edges = g
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
        want = union_find(n, edges)
        got_lp = {r["id"]: r["component"]
                  for r in connected_components(nodes, edf).collect()}
        got_st = {r["id"]: r["component"]
                  for r in connected_components_star(nodes, edf).collect()}
        assert got_lp == want
        assert got_st == want

    check()


def test_cc_star_distributed_path_equals_driver(spark):
    """r16 ADVICE (medium): driver_edge_cap=1M routes every fixture to
    the driver union-find, leaving the distributed star rounds — the
    production path above the cap — reachable only via round_stats.
    Force the star rounds with driver_edge_cap=0 and pin membership
    equality with the driver path on a graph that needs >1 round
    (a long chain), plus cliques/singletons."""
    from cdc_demo_spark.operators.graph import connected_components_star

    edges = (
        [(i, i + 1) for i in range(0, 30)]          # 31-node chain
        + [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
        + [(200, 201), (201, 200), (202, 202)]       # dup/reversed/self
    )
    node_ids = sorted({u for e in edges for u in e} | {999})  # + singleton
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    driver = {r["id"]: r["component"]
              for r in connected_components_star(nodes, edf).collect()}
    distributed = {
        r["id"]: r["component"]
        for r in connected_components_star(
            nodes, edf, driver_edge_cap=0
        ).collect()
    }
    assert distributed == driver
    assert driver[999] == 999 and driver[30] == 0 and driver[104] == 100


def test_allpairs_prefix_filtering_is_lossless_under_boilerplate(spark):
    """Adversarial corpus: every doc shares one boilerplate phrase
    (a universal shingle). df_cap handles this by DELETING the shingle
    (scores change); prefix filtering must bound fan-out while
    reproducing the naive uncapped result exactly — the universal
    shingle sorts to the end of the canonical order and out of every
    prefix."""
    import cdc_demo_spark.operators.dedup as D
    from pyspark.sql import functions as F

    rows = []
    for i in range(40):
        own = " ".join(f"w{i}_{j}" for j in range(10))
        # overlapping vocab between consecutive docs for real near-dups
        shared = " ".join(f"w{i + 1}_{j}" for j in range(5)) if i % 2 == 0 else ""
        rows.append((i, f"{own} {shared} common boiler plate tail".strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    t = 0.2
    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=t, df_cap=None)
        .filter(F.col("jaccard") >= t)
        .collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.allpairs_jaccard(docs, "doc_id", "text", k=3, threshold=t).collect()
    }
    assert fast == naive and fast

    # df_cap=1 on the same corpus removes the universal shingles and
    # (by design) changes the universe — different scores prove the
    # two operators make different tradeoffs
    capped = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=t, df_cap=1)
        .filter(F.col("jaccard") >= t)
        .collect()
    }
    assert capped != naive


def test_edit1_pairs_lossless_on_adversarial_edits(spark):
    """Pigeonhole blocking (prefix-8 ∪ suffix-8) must equal the
    UNBLOCKED quadratic join on names edited at EVERY position —
    including position 1, the case the old prefix-only block missed."""
    from cdc_demo_spark.operators.fuzzy import edit1_pairs

    base = "Customer#000000042"  # 18 chars, the reference name format
    rows = [(0, base)]
    nid = 1
    for p in range(len(base)):  # one substitution at each position
        rows.append((nid, base[:p] + "X" + base[p + 1 :])); nid += 1
    # one deletion and one insertion at head, middle, tail
    for p in (0, len(base) // 2, len(base) - 1):
        rows.append((nid, base[:p] + base[p + 1 :])); nid += 1
        rows.append((nid, base[:p] + "Z" + base[p:])); nid += 1
    # distant decoys that must NOT pair with anything
    rows += [(nid, "Supplier#000000001"), (nid + 1, "Totally Different")]
    df = spark.createDataFrame(rows, "id long, name string")

    got = {
        (r["id_a"], r["id_b"], r["edit_dist"])
        for r in edit1_pairs(df, "id", "name", k=8).collect()
    }
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    want = {
        (a, b, lev(na, nb))
        for (a, na), (b, nb) in itertools.combinations(rows, 2)
        if lev(na, nb) <= 1
    }
    assert got == want
    # sanity: the suite includes pairs the prefix-only block would miss
    assert any(na[0] != nb[0] for (a, na), (b, nb) in itertools.combinations(rows, 2)
               if lev(na, nb) <= 1 for _ in [0])


def _py_lev(a, b):
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[len(b)]


def test_edit2_pairs_lossless_on_adversarial_double_edits(spark):
    """3-segment blocking must equal the UNBLOCKED quadratic join at
    max_dist=2 on the hardest inputs: one edit in the first k chars AND
    one in the last k chars (only the shifted middle window can catch
    the pair), with every indel combination so the probe offsets
    {-1,0,+1} are each exercised."""
    import itertools

    from cdc_demo_spark.operators.fuzzy import edit2_pairs

    base = "Customer#000000042"  # 18 chars = 2k + w at k=w=6
    last = len(base) - 1
    rows = [(0, base)]
    nid = 1
    # double edits straddling the ends: sub/del/ins at front x back
    front_edits = [
        base[:1].replace(base[0], "X") + base[1:],   # sub at pos 0
        base[1:],                                    # del at pos 0  (shift -1)
        "Z" + base,                                  # ins at pos 0  (shift +1)
        base[:4] + "Q" + base[5:],                   # sub at pos 4 (< k)
    ]
    for fe in front_edits:
        l2 = len(fe) - 1
        for be in (
            fe[:l2] + "Y",          # sub at last pos
            fe[:l2],                # del at last pos
            fe + "W",               # ins at end
        ):
            rows.append((nid, be)); nid += 1
    # single and double same-region edits for completeness
    rows.append((nid, base[:8] + "XY" + base[10:])); nid += 1
    rows.append((nid, "Supplier#000000042")); nid += 1  # distant decoy-ish
    df = spark.createDataFrame(rows, "id long, name string")

    got = {
        (r["id_a"], r["id_b"], r["edit_dist"])
        for r in edit2_pairs(df, "id", "name", k=6, w=6).collect()
    }
    want = {
        (a, b, _py_lev(na, nb))
        for (a, na), (b, nb) in itertools.combinations(rows, 2)
        if _py_lev(na, nb) <= 2
    }
    assert got == want
    # the suite genuinely exercises the M-pass: some qualifying pair
    # differs in BOTH its first 6 and last 6 characters
    assert any(
        na[:6] != nb[:6] and na[-6:] != nb[-6:]
        for (a, na), (b, nb) in itertools.combinations(rows, 2)
        if _py_lev(na, nb) <= 2
    )


def test_fuzzy_length_guards(spark):
    """Blocking below the length floor must fail loudly (ADVICE r3),
    and auto-shrink must keep losslessness for borderline lengths."""
    import pytest as _pytest

    from cdc_demo_spark.operators.fuzzy import edit1_pairs, edit2_pairs

    tiny = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    with _pytest.raises(ValueError):
        edit1_pairs(tiny, "id", "name", k=8).collect()
    with _pytest.raises(ValueError):
        edit2_pairs(tiny, "id", "name").collect()

    # length-4 strings: k auto-shrinks (d1: k=2; d2: k=1, w=2) and the
    # result still equals the naive join
    import itertools

    rows = [(1, "abcd"), (2, "abXd"), (3, "Xbcd"), (4, "abcX"),
            (5, "wxyz"), (6, "abdc")]
    df = spark.createDataFrame(rows, "id long, name string")
    for fn, dmax in ((edit1_pairs, 1), (edit2_pairs, 2)):
        got = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in fn(df, "id", "name", k=8).collect()
        }
        want = {
            (a, b, _py_lev(na, nb))
            for (a, na), (b, nb) in itertools.combinations(rows, 2)
            if _py_lev(na, nb) <= dmax
        }
        assert got == want


def test_deletion_pairs_equals_naive_adversarial(spark):
    """deletion_pairs must equal the unblocked quadratic join on the
    same adversarial suites the pigeonhole tests use (every edit
    position, indel shifts, straddling double edits) at BOTH
    max_dist=1 and max_dist=2 — plus degenerate short strings down to
    the empty string, which positional blocking cannot even attempt."""
    import itertools

    from cdc_demo_spark.operators.fuzzy import deletion_pairs

    base = "Customer#000000042"
    rows = [(0, base)]
    nid = 1
    for p in range(len(base)):
        rows.append((nid, base[:p] + "X" + base[p + 1 :])); nid += 1
    front_edits = [
        "X" + base[1:], base[1:], "Z" + base, base[:4] + "Q" + base[5:],
    ]
    for fe in front_edits:
        l2 = len(fe) - 1
        for be in (fe[:l2] + "Y", fe[:l2], fe + "W"):
            rows.append((nid, be)); nid += 1
    rows += [(nid, "Supplier#000000042"), (nid + 1, "Totally Different"),
             (nid + 2, ""), (nid + 3, "a"), (nid + 4, "ab"), (nid + 5, "b")]
    df = spark.createDataFrame(rows, "id long, name string")
    for dmax in (1, 2):
        got = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in deletion_pairs(df, "id", "name", max_dist=dmax).collect()
        }
        want = {
            (a, b, _py_lev(na, nb))
            for (a, na), (b, nb) in itertools.combinations(rows, 2)
            if _py_lev(na, nb) <= dmax
        }
        assert got == want, f"max_dist={dmax}"


def test_deletion_pairs_max_len_guard(spark):
    """O(len²) key fan-out must refuse long text loudly — documents
    belong to the MinHash/Jaccard family, not deletion blocking.  The
    guard is IN-SCAN (raise_error inside the key projection, no extra
    pre-flight pass), so it surfaces at action time."""
    import pytest as _pytest

    from cdc_demo_spark.operators.fuzzy import deletion_pairs

    df = spark.createDataFrame([(1, "x" * 100), (2, "y" * 100)], "id long, name string")
    with _pytest.raises(Exception, match="max_len"):
        deletion_pairs(df, "id", "name").collect()


def test_cc_star_contracts_dense_clique(spark):
    """100 TB guard for the CC stage (VERDICT r3 #3): the star rounds
    distinct() the full edge list each iteration, so feed the worst
    dense input — a 10k-node clique (~50M edges, the shape a df_cap
    miss would hand the clustering stage) — and pin that (a) the edge
    working set collapses to the (n-1) star spokes after ONE round and
    never grows, (b) the round budget stays tiny, (c) the result is a
    single component rooted at the minimum id.  Synthetic edges rather
    than duplicate docs: this isolates graph.py from the pair
    generators, which have their own caps and tests."""
    from cdc_demo_spark.operators.graph import connected_components_star

    n = 10_000
    edges = (
        spark.range(n).select(F.col("id").alias("id_a"))
        .crossJoin(spark.range(n).select(F.col("id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    nodes = spark.range(n).select("id")
    stats: list = []
    cc = connected_components_star(nodes, edges, max_iter=6, round_stats=stats)
    comps = cc.groupBy("component").count().collect()
    assert len(comps) == 1
    assert comps[0]["component"] == 0 and comps[0]["count"] == n
    # quadratic -> linear in one round; monotone non-increasing after
    assert stats[0] == n - 1, stats
    assert all(a >= b for a, b in zip(stats, stats[1:])), stats
    assert len(stats) <= 4, stats


class TestSimhashMd5:
    def test_blocking_equals_naive(self, spark, sf_dir):
        """Pigeonhole blocking is lossless: chunk-blocked pairs ==
        naive quadratic pairs at every distance <= 3 (the oracle
        re-proves this against DuckDB; this is the Spark-side unit)."""
        from cdc_demo_spark.operators.dedup import hamming_pairs, simhash_md5
        from cdc_demo_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").limit(200)
        sig = simhash_md5(docs, "doc_id", "text").localCheckpoint()
        blocked = {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_pairs(sig, max_distance=3, bits=60).collect()
        }
        a = sig.selectExpr("id AS id_a", "simhash AS sh_a")
        b = sig.selectExpr("id AS id_b", "simhash AS sh_b")
        from pyspark.sql import functions as F

        naive = {
            (r.id_a, r.id_b, r.hamming)
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn(
                "hamming",
                F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"),
            )
            .filter(F.col("hamming") <= 3)
            .collect()
        }
        assert blocked == naive and naive

    def test_signature_fits_60_bits(self, spark, sf_dir):
        from cdc_demo_spark.operators.dedup import simhash_md5
        from cdc_demo_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents").limit(50)
        sig = simhash_md5(docs, "doc_id", "text")
        bad = sig.filter((F.col("simhash") < 0) | (F.col("simhash") >= F.lit(1 << 60)))
        assert bad.count() == 0

    def test_param_validation(self, spark, sf_dir):
        import pytest as _pt

        from cdc_demo_spark.operators.dedup import hamming_pairs, simhash_md5
        from cdc_demo_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").limit(5)
        with _pt.raises(ValueError, match="bits"):
            simhash_md5(docs, "doc_id", "text", bits=64)
        sig = simhash_md5(docs, "doc_id", "text")
        with _pt.raises(ValueError, match="divide"):
            hamming_pairs(sig, max_distance=6, bits=60)


def test_leakage_safe_split_no_pair_crosses_splits(spark, sf_dir):
    """The split's entire point: no near-dup pair may straddle
    train/val/test.  Verified against the SAME edge set the split is
    built from (jaccard_pairs at the query's parameters), plus shape
    sanity: every doc assigned exactly once, splits from the fixed
    vocabulary, cluster -> split is a function (one split per
    cluster)."""
    from cdc_demo_spark.operators import dedup as D
    from cdc_demo_spark.queries import QUERIES
    from cdc_demo_spark.sources.tables import load_table

    out = QUERIES["q_leakage_safe_split"](spark, sf_dir)
    rows = out.collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    assert set(split_of.values()) <= {"train", "val", "test"}
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    pairs = D.jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.12, df_cap=50
    ).collect()
    assert pairs, "fixture must actually contain near-dup pairs"
    for p in pairs:
        assert split_of[p["id_a"]] == split_of[p["id_b"]], (
            p["id_a"], p["id_b"])


def test_minhash_cross_near_duplicates_planted_leak(spark):
    """minhash_cross_near_duplicates (r16): a pool doc that is a light
    edit of an eval doc is found (planted-leak recall), every reported
    pair is genuinely >= threshold by exact cross Jaccard (no false
    positives — verification is exact), and within-side near-dups are
    NEVER paired (cross only)."""
    rng = random.Random(77)

    def doc(n=80):
        return " ".join(rng.choice(VOCAB) for _ in range(n))

    eval_texts = [doc() for _ in range(6)]
    pool_texts = [doc() for _ in range(40)]
    # planted leak: pool doc 0 = eval doc 0 with one token changed
    leaked = eval_texts[0].split()
    leaked[10] = "zzz_edit"
    pool_texts[0] = " ".join(leaked)
    # within-pool near-dup pair (must NOT appear in the cross output)
    pool_texts[1] = pool_texts[2]

    pool = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pool_texts)], "doc_id long, text string"
    )
    evalset = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(eval_texts)],
        "doc_id long, text string",
    )
    got = D.minhash_cross_near_duplicates(
        pool, evalset, "doc_id", "text", threshold=0.5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (0, 1000) in pairs, pairs  # planted leak found
    assert all(1000 <= b < 2000 and a < 1000 for a, b in pairs), pairs
    # exact verification: every reported jaccard matches a brute-force
    # recompute over distinct 3-shingles
    def shingles(t):
        w = t.split()
        return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

    for r in got:
        sa = shingles(pool_texts[r["id_a"]])
        sb = shingles(eval_texts[r["id_b"] - 1000])
        j = len(sa & sb) / len(sa | sb)
        assert abs(r["jaccard"] - j) < 1e-6
        assert j >= 0.5


def test_xxhash64_of_elements_equals_xxhash64_of_slice(spark):
    """The LSH band bucket is xxhash64 over a signature slice; the r16
    optimization replaced the interpreted slice with unrolled
    element_at args.  This pins the identity the rewrite rests on:
    xxhash64 folds its arguments exactly the way it folds an array
    argument's elements, so the bucket VALUES (and every stored
    incremental index) are unchanged."""
    df = spark.range(500).select(
        F.array(*[F.xxhash64(F.col("id") + i) for i in range(8)]).alias("sig")
    )
    for off, width in ((1, 4), (5, 4), (3, 2)):
        a = [r["h"] for r in df.select(F.xxhash64(F.slice("sig", off, width)).alias("h")).collect()]
        b = [r["h"] for r in df.select(
            F.xxhash64(*[F.element_at("sig", off + i) for i in range(width)]).alias("h")
        ).collect()]
        assert a == b
