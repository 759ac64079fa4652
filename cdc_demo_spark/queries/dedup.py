"""Dedup query surface over the documents table (B51)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators import dedup as D
from cdc_demo_spark.operators.text import gram_at
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_dedup_stats",
    oracle="""
SELECT count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct,
       count(*) - count(DISTINCT md5(text)) AS n_exact_dups
FROM documents
""",
)
def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup census. The distinct runs on 16-byte md5 digests, not
    document bodies — at 100 TB the shuffle is ~32 GB, not 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.md5("text")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(d).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(d)).alias("n_exact_dups"),
    )


@register(
    "q_dedup_exact_keep",
    oracle="""
SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
""",
)
def q_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept set after exact dedup (min-id survivor per text digest)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("_d"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


@register(
    "q_ngram_jaccard_pairs",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
  FROM toks WHERE len(t) >= 3
), sh_raw AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM idx
), sh AS (
  -- document-frequency cap (mirrors the Spark side): shingles in more
  -- than 50 docs are boilerplate and are dropped before pairing
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle IN (SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) <= 50)
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n AS DOUBLE) / (sa.sz + sb.sz - n), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.12
""",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs at threshold 0.12 (the
    synthetic corpus shares a small vocabulary, so overlap is diffuse;
    the threshold is set to produce a non-trivial pair set). Shingles in
    more than 50 documents are dropped pre-join (df_cap; mirrored in the
    oracle) — on this corpus max DF is 9, so results are identical, but
    the join fan-out is bounded on any corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.12, df_cap=50)


@register("q_minhash_near_dups")  # no oracle: engine-specific hash functions
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands × 4 rows) near-dups verified at Jaccard
    >= 0.12. Candidate generation is subquadratic (bucket joins);
    correctness vs exact Jaccard asserted in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_duplicates(
        docs, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
    )


@register(
    "q_simhash_signatures",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM toks
),
votes AS (
  SELECT doc_id, bb.b AS b,
         SUM(CASE WHEN (hv >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) bb
  GROUP BY doc_id, bb.b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
ORDER BY doc_id
""",
)
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature per document (near-dup = low Hamming distance).

    r12: re-based on the engine-portable md5 signature
    (operators/dedup.simhash_md5 — 60-bit, integer votes, deterministic
    ties) so the per-document signatures themselves are value-exact
    oracle-checked, completing what q_simhash_hamming_pairs started for
    the pair graph.  The xxhash64 variant (operators/dedup.simhash)
    remains available for pipelines that prefer the cheaper hash and
    keeps its pytest coverage (tests/test_dedup.py); its bits are
    Spark-specific, which is exactly why it no longer backs this
    registry entry."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        D.simhash_md5(docs, "doc_id", "text")
        .select(F.col("id").alias("doc_id"), "simhash")
        .orderBy("doc_id")
    )


_CLUSTER_EDGE_CTES = """
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
  FROM toks WHERE len(t) >= 3
), sh_raw AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM idx
), sh AS (
  SELECT doc_id, shingle FROM sh_raw
  WHERE shingle IN (SELECT shingle FROM sh_raw GROUP BY shingle HAVING count(*) <= 50)
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.12
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
)
"""


@register(
    "q_dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_CLUSTER_EDGE_CTES},
reach(s, d) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges e ON r.d = e.u
)
SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment: Jaccard pairs (threshold 0.12,
    df_cap 50 — same edge set as q_ngram_jaccard_pairs) closed into
    connected components via alternating large-star/small-star
    contraction (Kiveris et al. SoCC'14 — the scale-safe default even
    on adversarial long-chain graphs; see operators/graph.py); cluster
    id = min doc_id in the component, isolated docs are singletons.
    The DuckDB oracle re-derives components with a recursive
    transitive-closure CTE — an independent algorithm, same answer."""
    from cdc_demo_spark.operators.graph import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.12, df_cap=50)
    comps = connected_components_star(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return comps.select("doc_id", F.col("component").alias("cluster_id"))


@register(
    "q_dedup_keep_best",
    oracle=f"""
WITH RECURSIVE {_CLUSTER_EDGE_CTES},
reach(s, d) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges e ON r.d = e.u
),
clusters AS (
  SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
),
ranked AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rk = 1
""",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE near-dup survivor selection (r14): the same
    cluster assignment as q_dedup_clusters, but the kept doc per
    cluster is the one a curator would keep — highest quality score
    (n_chars here; any deterministic column works), doc_id as the
    deterministic tiebreak — instead of min-id.  One windowed rank
    over cluster-joined docs; the DuckDB twin re-derives components
    via the recursive transitive closure and replays the rank, so the
    survivor CHOICE itself is value-exact.  build_corpus exposes the
    same policy as survivor="longest"."""
    from pyspark.sql.window import Window

    from cdc_demo_spark.operators.graph import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.12, df_cap=50)
    comps = connected_components_star(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        comps.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("component").alias("cluster_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


@register(
    "q_leakage_safe_split",
    oracle=f"""
WITH RECURSIVE {_CLUSTER_EDGE_CTES},
reach(s, d) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges e ON r.d = e.u
),
clusters AS (
  SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
),
b AS (
  SELECT doc_id, cluster_id,
         CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 100 AS h
  FROM clusters
)
SELECT doc_id, cluster_id,
       CASE WHEN h < 80 THEN 'train'
            WHEN h < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id
""",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (80/10/10): the unit of
    assignment is the NEAR-DUP CLUSTER, not the document — a doc and
    its near-copies land in the same split by construction, so eval
    can never be contaminated by a training near-duplicate (the
    benchmark-leakage failure mode q_benchmark_contamination measures
    after the fact; this prevents it at split time).  Split choice is
    a pure function of cluster_id through the house md5 scheme —
    deterministic, engine-portable (value-exact DuckDB oracle),
    reshuffle-free to recompute, and stable under corpus APPENDS: a
    new near-copy of an existing doc joins its cluster and therefore
    its split (cluster_id = min doc_id is unchanged by growth except
    when a smaller-id doc arrives or clusters MERGE via a bridging
    doc — both rebalance events a production pipeline would gate
    behind the incremental index's pair log).  At 100 TB the split
    costs one component pass (already needed for dedup) plus a
    map-side hash — no extra shuffle."""
    from cdc_demo_spark.operators.corpus_pipeline import split_expr
    from cdc_demo_spark.operators.graph import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.12, df_cap=50)
    comps = connected_components_star(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return comps.select(
        "doc_id",
        F.col("component").alias("cluster_id"),
        # THE shared split predicate (operators/corpus_pipeline.
        # split_expr) — the composed pipeline uses the same copy
        split_expr(F.col("component")).alias("split"),
    ).orderBy("doc_id")


@register(
    "q_dedup_cluster_survivors",
    oracle=f"""
WITH RECURSIVE {_CLUSTER_EDGE_CTES},
reach(s, d) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges e ON r.d = e.u
), comp AS (
  SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
)
SELECT cluster_id AS doc_id, count(*) AS cluster_size
FROM comp GROUP BY cluster_id
""",
)
def q_dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's final output: one kept doc per near-dup
    cluster (the min id) + how many docs it absorbed. Feeding a corpus
    through this is the actual 'dedup the training set' operation."""
    from cdc_demo_spark.operators.graph import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.12, df_cap=50)
    comps = connected_components_star(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return (
        comps.groupBy(F.col("component").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )


@register(
    "q_benchmark_contamination",
    oracle="""
WITH bench_docs AS (
  SELECT * FROM documents WHERE doc_id % 50 = 0
), corpus AS (
  SELECT * FROM documents WHERE doc_id % 50 <> 0
), btoks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM bench_docs
), bidx AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
  FROM btoks WHERE len(t) >= 3
), bench_sh AS (
  SELECT DISTINCT concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle FROM bidx
), ctoks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM corpus
), cidx AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
  FROM ctoks WHERE len(t) >= 3
), corpus_sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle FROM cidx
), per_doc AS (
  SELECT c.doc_id,
         count(*) AS n_shingles,
         count(b.shingle) AS n_hits
  FROM corpus_sh c LEFT JOIN bench_sh b ON c.shingle = b.shingle
  GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       round(CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS contamination
FROM per_doc
WHERE CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) >= 0.05
ORDER BY contamination DESC, doc_id ASC
LIMIT 50
""",
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: every 50th document stands in for
    a benchmark/eval set; corpus documents sharing >= 5% of their
    distinct 3-gram shingles with ANY benchmark doc are flagged (the
    real pipeline drops or quarantines them). The benchmark shingle set
    broadcasts — corpus text never shuffles; see
    operators/dedup.py::benchmark_contamination."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return (
        D.benchmark_contamination(corpus, bench, "doc_id", "text", k=3)
        .filter(F.col("contamination") >= 0.05)
        .select(
            F.col("id").alias("doc_id"), "n_shingles", "n_hits", "contamination"
        )
        .orderBy(F.desc("contamination"), F.asc("doc_id"))
        .limit(50)
    )


@register("q_incremental_minhash")  # no oracle: stateful multi-batch op
def q_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: build a persisted MinHash-LSH index
    from the first 60% of documents, then probe+admit the remaining 40%
    as a second batch — the daily-crawl-delta shape. Returns the union
    of both batches' verified near-dup pairs, which tests prove equals
    the one-shot clustering (tests/test_incremental_dedup.py)."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="mh_index_")
    try:
        idx = MinHashIndex(spark, os.path.join(tmp, "idx"), k=3, threshold=0.12)
        p1 = idx.append_batch(docs.filter(F.col("doc_id") % 5 < 3))
        p2 = idx.append_batch(docs.filter(F.col("doc_id") % 5 >= 3))
        return p1.unionByName(p2).orderBy("id_a", "id_b")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q_allpairs_jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
  FROM toks WHERE len(t) >= 3
), sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM idx
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n AS DOUBLE) / (sa.sz + sb.sz - n), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.12
""",
)
def q_allpairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS threshold Jaccard join at t=0.12 via prefix filtering
    (operators/dedup.allpairs_jaccard).  The oracle is the NAIVE
    uncapped self-join — prefix filtering must reproduce it exactly,
    which is precisely its claim over the df_cap variant
    (q_ngram_jaccard_pairs): fan-out is bounded by ordering frequent
    shingles out of the indexed prefixes, not by deleting them from
    the universe."""
    docs = load_table(spark, sf_dir, "documents")
    return D.allpairs_jaccard(docs, "doc_id", "text", k=3, threshold=0.12)


@register(
    "q_fuzzy_name_pairs",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
FROM customer a
JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
""",
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution shape: edit-distance <= 1 name pairs via
    LOSSLESS deletion-neighborhood blocking
    (operators/fuzzy.deletion_pairs, the FastSS/SymSpell scheme):
    block key = string minus <= 1 character, so any single-edit pair
    provably shares a key and keys stay discriminating regardless of
    where the corpus's entropy lives (the positional pigeonhole
    variant, edit1_pairs, keeps its losslessness proof but its
    prefix block selects the entire table on shared-prefix corpora
    like c_name — pytest pins both equal).  The oracle is the NAIVE
    UNBLOCKED quadratic join, so the driver's value-exact gate is
    itself the losslessness proof.  At 100 TB grain: hashed deletion
    keys are the shuffle currency, fan-out is L+1 keys per name,
    candidates track the true pair count."""
    from cdc_demo_spark.operators.fuzzy import deletion_pairs

    cust = load_table(spark, sf_dir, "customer")
    return deletion_pairs(cust, "c_custkey", "c_name", max_dist=1).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_fuzzy_name_pairs_d2",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
FROM customer a
JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
ORDER BY id_a, id_b
""",
)
def q_fuzzy_name_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution at edit distance <= 2 via LOSSLESS
    deletion-neighborhood blocking (operators/fuzzy.deletion_pairs):
    block key = string minus <= 2 characters; an optimal <= 2-op
    alignment marks <= 2 positions per side whose removal yields the
    same subsequence, so every qualifying pair shares a key.  The
    oracle is the NAIVE UNBLOCKED quadratic join, making the driver's
    value-exact gate the losslessness proof.  Replaced the 3-segment
    pigeonhole path (edit2_pairs, kept + pytest-pinned equal) in r5:
    its prefix/middle segment keys select the whole table on the
    shared-prefix c_name corpus — measured 306 s at sf0.1 vs ~20 s
    here; deletion keys keep the discriminating characters, so the
    candidate set tracks the ~6M true pairs instead of the ~900M
    degenerate block join."""
    from cdc_demo_spark.operators.fuzzy import deletion_pairs

    cust = load_table(spark, sf_dir, "customer")
    return deletion_pairs(cust, "c_custkey", "c_name", max_dist=2).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_neardup_centrality",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
  FROM toks WHERE len(t) >= 3
), sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM idx
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n AS DOUBLE) / (sa.sz + sb.sz - n) >= 0.12
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY src
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
), aug AS (
  -- real edges carry 1/deg(src); a zero-weight self-edge per node
  -- keeps every node present in each iteration's aggregate
  SELECT e.src, e.dst, 1.0 / d.deg AS w FROM edges e JOIN deg d USING (src)
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents
), pr(iter, nid, rank) AS (
  SELECT 0, doc_id, 1.0 / (SELECT n FROM nn) FROM documents
  UNION ALL
  SELECT pr.iter + 1, aug.dst,
         0.15 / (SELECT n FROM nn) + 0.85 * sum(pr.rank * aug.w)
  FROM pr JOIN aug ON pr.nid = aug.src
  WHERE pr.iter < 10
  GROUP BY pr.iter, aug.dst
)
SELECT nid AS doc_id, ROUND(rank, 9) AS rank
FROM pr WHERE iter = 10
ORDER BY ROUND(rank, 9) DESC, nid ASC
LIMIT 50
""",
)
def q_neardup_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the exact near-dup pair graph (allpairs_jaccard
    at t=0.12) — the centrality-based alternative to min-id survivor
    selection: within a duplicate cluster the highest-rank document is
    the most-connected (most canonical) copy, which is what you keep
    when near-dups are partial containments rather than exact copies.
    Iterative shape: driver FOR loop, one join + one agg per round,
    lineage cut per round (operators/graph.pagerank).  Oracle-backed
    (was rows-only through r10): the DuckDB twin replays the same
    10-round power iteration as a recursive CTE (zero-weight self-edge
    per node keeps isolated docs in the aggregate; the edge set is
    q_allpairs_jaccard's oracle).  Summation-order divergence compounds
    to ~1e-13 over 10 rounds; the round-9 output leaves 4 orders of
    margin.  The recurrence is additionally replay-verified against
    plain Python in tests/test_graph_pagerank.py."""
    from cdc_demo_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.allpairs_jaccard(docs, "doc_id", "text", k=3, threshold=0.12)
    ranks = pagerank(
        docs.select("doc_id"), pairs, id_col="doc_id", iterations=10
    )
    return ranks.select("doc_id", F.round("rank", 9).alias("rank")).orderBy(
        F.desc("rank"), F.asc("doc_id")
    ).limit(50)


@register(
    "q_simhash_hamming_pairs",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM toks
),
votes AS (
  SELECT doc_id, bb.b AS b,
         SUM(CASE WHEN (hv >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) bb
  GROUP BY doc_id, bb.b
),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sh
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
ORDER BY id_a, id_b
""",
)
def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with a VALUE-EXACT oracle (Manku et al.
    WWW'07): the engine-portable md5 signature (operators/dedup.
    simhash_md5 — 60-bit, integer votes, deterministic ties) makes the
    whole pair graph reproducible in DuckDB, so the driver's hash gate
    now covers the SimHash family end-to-end, not just row counts
    (r12: q_simhash_signatures now shares this md5 signature too).
    Spark finds pairs via 4x15-bit pigeonhole blocking — <= 3 flips
    can't touch all 4 chunks — while the oracle runs the naive
    quadratic self-join: the hash match doubles as the blocking's
    losslessness proof on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sig = D.simhash_md5(docs, "doc_id", "text")
    return (
        D.hamming_pairs(sig, max_distance=3, bits=60)
        .orderBy("id_a", "id_b")
    )


@register(
    "q_minhash_signatures_md5",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM t, UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
),
hi AS (
  SELECT doc_id, ii.i AS i,
         CAST('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || sh), 1, 15)
              AS BIGINT) AS h
  FROM s CROSS JOIN (SELECT unnest(range(64)) AS i) ii
)
SELECT doc_id, i, MIN(h) AS min_h
FROM hi
GROUP BY doc_id, i
ORDER BY doc_id, i
""",
)
def q_minhash_signatures_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures with a VALUE-EXACT oracle: 64 permutations
    simulated as md5(i || ':' || shingle) (Broder's one-hash-per-
    permutation scheme with an engine-portable hash), 3-token string
    shingles, min per (doc, permutation).  Like q_simhash_hamming_pairs
    this md5 twin exists so the driver's hash gate covers the FAMILY's
    math value-exact — the production signatures (xxhash64 slices,
    operators/dedup.minhash_signatures) keep their cheaper hash and
    their pytest LSH⊆exact verification.  Shape: explode shingles ×
    permutations into rows, codegen md5/conv per row, one partial-agg
    min — no interpreted HOF in the hot path (r6 house lesson).
    Docs shorter than 3 tokens emit no rows (the shingle contract,
    operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    # single-space split, exact parity with the oracle's string_split —
    # PROJECTED before the lambda (inline split re-evaluates per
    # element: O(tokens^2), the r11 spans finding; SCALE.md)
    tok_docs = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    sh_rows = tok_docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda j: gram_at(toks, j, 3),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    )
    hi = sh_rows.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i"),
        "sh",
    ).select(
        "doc_id",
        "i",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("sh"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    return (
        hi.groupBy("doc_id", F.col("i").cast("long").alias("i"))
        .agg(F.min("h").alias("min_h"))
        .orderBy("doc_id", "i")
    )


@register(
    "q_minhash_near_dups_md5",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT DISTINCT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM t, UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
),
hi AS (
  SELECT doc_id, ii.i AS i,
         CAST('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || sh), 1, 15)
              AS BIGINT) AS h
  FROM s CROSS JOIN (SELECT unnest(range(64)) AS i) ii
),
sig AS (
  SELECT doc_id, i, MIN(h) AS min_h FROM hi GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(CAST(min_h AS VARCHAR), ',' ORDER BY i)) AS bucket
  FROM sig GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM s GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n
  FROM cand c
  JOIN s x ON x.doc_id = c.id_a
  JOIN s y ON y.doc_id = c.id_b AND y.sh = x.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n) >= 0.5
ORDER BY id_a, id_b
""",
)
def q_minhash_near_dups_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MinHash-LSH near-dup pipeline with a value-exact
    oracle: md5 signatures (q_minhash_signatures_md5's math) -> 16
    bands of 4 rows, band bucket = md5 of the ordered minhash run ->
    candidates sharing a bucket -> exact Jaccard verify at 0.5 over
    distinct 3-token shingles.  The oracle mirrors the ALGORITHM
    (banding is probabilistic recall — a ground-truth oracle is
    q_allpairs_jaccard's job); the value here is that every stage of
    the production LSH shape — signature, banding, bucket join,
    verification — is reproduced bit-for-bit by an independent engine,
    upgrading the family's flagship from rows-only to hash-match.
    No skew guard in this twin (the xxhash64 production path keeps
    max_bucket; at 500 docs the guard never trips anyway)."""
    docs = load_table(spark, sf_dir, "documents")
    sh_rows, bands = _md5_lsh_state(docs)
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard_pairs(cand, sh_rows, "id_a", "id_b")


def _md5_lsh_state(docs: DataFrame):
    """(sh_rows, bands) — the shared md5-derandomized LSH construction
    of q_minhash_near_dups_md5 and q_fuzzy_decontamination: distinct
    3-token shingles, 64 md5 permutations, per-(doc, i) minhash, and
    the 16×4 band buckets (md5 of the ordered minhash run)."""
    # single-space split, exact parity with the oracle's string_split —
    # PROJECTED before the lambda (inline split re-evaluates per
    # element: O(tokens^2), the r11 spans finding; SCALE.md)
    tok_docs = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    sh_rows = tok_docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda j: gram_at(toks, j, 3),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    ).distinct()
    hi = sh_rows.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("i"),
        "sh",
    ).select(
        "doc_id",
        "i",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("sh"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    sig = hi.groupBy("doc_id", "i").agg(F.min("h").alias("min_h"))
    # band bucket: md5 of the ordered minhash run (4-element array sort
    # + join — HOF glue on tiny arrays, not a hot path)
    bands = (
        sig.groupBy("doc_id", (F.col("i") / 4).cast("long").alias("band"))
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "min_h"))),
                        lambda x: x["min_h"].cast("string"),
                    ),
                )
            ).alias("bucket")
        )
    )
    return sh_rows, bands


def _verify_jaccard_pairs(
    cand: DataFrame, sh_rows: DataFrame, a_name: str, b_name: str
) -> DataFrame:
    """Exact-Jaccard verification at 0.5 over the candidate pair set —
    the shared tail of the md5 LSH queries (shingle-intersection count
    vs per-doc sizes), parameterized by the pair column names."""
    sizes = sh_rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    x = sh_rows.select(F.col("doc_id").alias(a_name), "sh")
    y = sh_rows.select(F.col("doc_id").alias(b_name), "sh")
    inter = (
        cand.join(x, a_name).join(y, [b_name, "sh"])
        .groupBy(a_name, b_name)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    jac = F.col("n").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("n"))
    return (
        inter.join(sizes.selectExpr(f"doc_id AS {a_name}", "sz AS sz_a"), a_name)
        .join(sizes.selectExpr(f"doc_id AS {b_name}", "sz AS sz_b"), b_name)
        .filter(jac >= 0.5)
        .select(a_name, b_name, F.round(jac, 6).alias("jaccard"))
        .orderBy(a_name, b_name)
    )


@register(
    "q_fuzzy_decontamination",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT DISTINCT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM t, UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
),
hi AS (
  SELECT doc_id, ii.i AS i,
         CAST('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || sh), 1, 15)
              AS BIGINT) AS h
  FROM s CROSS JOIN (SELECT unnest(range(64)) AS i) ii
),
sig AS (
  SELECT doc_id, i, MIN(h) AS min_h FROM hi GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(CAST(min_h AS VARCHAR), ',' ORDER BY i)) AS bucket
  FROM sig GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS pool_id, b.doc_id AS eval_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM s GROUP BY doc_id),
inter AS (
  SELECT c.pool_id, c.eval_id, COUNT(*) AS n
  FROM cand c
  JOIN s x ON x.doc_id = c.pool_id
  JOIN s y ON y.doc_id = c.eval_id AND y.sh = x.sh
  GROUP BY c.pool_id, c.eval_id
)
SELECT i.pool_id, i.eval_id,
       round(CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.pool_id
JOIN sizes sb ON sb.doc_id = i.eval_id
WHERE CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n) >= 0.5
ORDER BY pool_id, eval_id
""",
)
def q_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY (near-duplicate) eval decontamination, value-exact: pool
    documents that are a light edit of a held-out eval doc (every 50th)
    share most 3-gram shingles but no exact text — the leak the exact
    (q_benchmark_contamination) and Bloom decontaminators miss and the
    embedding one (q_semantic_decontamination) needs vectors for.  The
    md5-derandomized LSH (q_minhash_near_dups_md5's exact math, shared
    via _md5_lsh_state) bands BOTH sides and pairs pool ids against
    eval ids only, then exact-Jaccard verifies at 0.5 — every stage
    reproduced bit-for-bit by the oracle.  The production xxhash64
    operator is operators/dedup.minhash_cross_near_duplicates (skew
    guard over both sides' buckets; pytest pins LSH ⊆ exact cross
    Jaccard with planted-leak recall)."""
    docs = load_table(spark, sf_dir, "documents")
    sh_rows, bands = _md5_lsh_state(docs)
    cand = (
        bands.filter(F.col("doc_id") % 50 != 0)
        .select(F.col("doc_id").alias("pool_id"), "band", "bucket")
        .join(
            bands.filter(F.col("doc_id") % 50 == 0)
            .select(F.col("doc_id").alias("eval_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("pool_id", "eval_id")
        .distinct()
    )
    return _verify_jaccard_pairs(cand, sh_rows, "pool_id", "eval_id")


@register(
    "q_containment_pairs",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT DISTINCT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM t, UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
),
keep AS (
  SELECT sh FROM s GROUP BY sh HAVING COUNT(*) <= 50
),
f AS (SELECT s.doc_id, s.sh FROM s JOIN keep USING (sh)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM f GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
  FROM f a JOIN f b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b,
       round(CAST(i.n AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n AS DOUBLE) / least(sa.sz, sb.sz) >= 0.6
ORDER BY id_a, id_b
""",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-containment dedup (the RefinedWeb/CCNet boilerplate shape):
    flag pairs where the SMALLER document's shingle set is >= 60%
    inside the other's — catches quotes, mirrored pages, and
    boilerplate wrappers that Jaccard misses (a 100-shingle doc fully
    contained in a 1000-shingle doc has Jaccard 0.1 but containment
    1.0).  Same scale shape as the Jaccard family: shingle-key join,
    df_cap=50 drops universal shingles from BOTH sizes and
    intersections (a true containment over the filtered sets — the
    q_ngram_jaccard_pairs contract), candidates bounded by shingle
    co-occurrence.  String shingles keep the oracle engine-portable;
    the xxhash64 operators stay the production path."""
    docs = load_table(spark, sf_dir, "documents")
    # single-space split, projected before the lambda (see above twins)
    tok_docs = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    s = tok_docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda j: gram_at(toks, j, 3),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    ).distinct()
    keep = s.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= 50)
    f = s.join(keep.select("sh"), "sh")
    sizes = f.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = f.select(F.col("doc_id").alias("id_a"), "sh")
    b = f.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cont = F.col("n").cast("double") / F.least("sz_a", "sz_b")
    return (
        inter.join(sizes.selectExpr("doc_id AS id_a", "sz AS sz_a"), "id_a")
        .join(sizes.selectExpr("doc_id AS id_b", "sz AS sz_b"), "id_b")
        .filter(cont >= 0.6)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
        .orderBy("id_a", "id_b")
    )


@register(
    "q_duplicated_spans",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id, CAST(u.j + 1 AS INTEGER) AS pos,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] || ' ' ||
         toks[u.j + 4] || ' ' || toks[u.j + 5] AS gram
  FROM t, UNNEST(range(greatest(len(toks) - 4, 0))) AS u(j)
),
m AS (
  SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gram) AS occ FROM g
),
d AS (SELECT doc_id, pos FROM m WHERE occ >= 2),
lagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
  FROM d
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN pos - prev_pos > 5 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS span_tokens
FROM isl
GROUP BY doc_id, island
ORDER BY doc_id, span_start
""",
)
def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level dedup, detection side (Lee et al. ACL'22 exact
    substring dedup re-expressed as DataFrame algebra — see
    operators/spans.py): maximal per-document token spans covered by a
    5-gram that occurs at >= 2 sites corpus-wide (cross-doc shares AND
    within-doc repetition both count).  Finds the shared boilerplate
    passage doc-level dedup leaves behind.  Scale shape: one explode
    to positional (gram, doc, pos) rows — O(total tokens), never
    O(pairs) — a gram-key window, then a per-doc gaps-and-islands
    window; no document pair ever materializes."""
    from cdc_demo_spark.operators.spans import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return (
        duplicated_spans(docs, "doc_id", "text", n=5)
        .select(
            F.col("id").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("span_tokens").cast("long").alias("span_tokens"),
        )
        .orderBy("doc_id", "span_start")
    )


@register(
    "q_remove_duplicated_spans",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id, CAST(u.j + 1 AS INTEGER) AS pos,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] || ' ' ||
         toks[u.j + 4] || ' ' || toks[u.j + 5] AS gram
  FROM t, UNNEST(range(greatest(len(toks) - 4, 0))) AS u(j)
),
m AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY gram) AS occ,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM g
),
rem AS (SELECT doc_id, pos FROM m WHERE occ >= 2 AND rn > 1),
cov AS (
  SELECT DISTINCT doc_id, pos + CAST(u.k AS INTEGER) AS idx
  FROM rem, UNNEST(range(5)) AS u(k)
),
tok AS (
  SELECT doc_id, CAST(u.i + 1 AS INTEGER) AS idx, toks[u.i + 1] AS tok
  FROM t, UNNEST(range(len(toks))) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.idx, tok.tok
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.idx = cov.idx
  WHERE cov.idx IS NULL
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
SELECT nt.doc_id,
       COALESCE(agg.clean_text, '') AS clean_text,
       nt.n_tokens,
       CAST(nt.n_tokens - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
FROM nt LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
""",
)
def q_remove_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level dedup, removal side: cut every duplicated 5-gram
    passage except its globally-first occurrence (min (doc_id, pos)
    per gram — the Lee et al. keep-one policy), so exactly one copy of
    each shared passage survives the corpus.  Value-exact on the
    rebuilt text: the oracle reproduces the cover-and-cut token
    arithmetic independently in DuckDB.  Scale shape: covered indexes
    are an O(n · removable-sites) explode (output-bound); the text
    rebuild is one per-doc aggregate with array_sort-ed (idx, token)
    structs, immune to collect_list ordering."""
    from cdc_demo_spark.operators.spans import remove_duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return (
        remove_duplicated_spans(docs, "doc_id", "text", n=5)
        .select(
            F.col("id").alias("doc_id"),
            "clean_text",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_removed").cast("long").alias("n_removed"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_eval_containment",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT DISTINCT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM t, UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
),
keep AS (
  SELECT sh FROM s GROUP BY sh HAVING COUNT(*) <= 50
),
f AS (SELECT s.doc_id, s.sh FROM s JOIN keep USING (sh)),
ev AS (SELECT doc_id, sh FROM f WHERE doc_id % 50 = 0),
pool AS (SELECT doc_id, sh FROM f WHERE doc_id % 50 <> 0),
ev_sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ev GROUP BY doc_id),
inter AS (
  SELECT p.doc_id AS pool_id, e.doc_id AS eval_id, COUNT(*) AS n
  FROM pool p JOIN ev e ON p.sh = e.sh
  GROUP BY p.doc_id, e.doc_id
)
SELECT i.pool_id, i.eval_id,
       CAST(i.n AS BIGINT) AS n_shared,
       CAST(se.sz AS BIGINT) AS eval_sz,
       round(CAST(i.n AS DOUBLE) / se.sz, 6) AS containment
FROM inter i JOIN ev_sizes se ON se.doc_id = i.eval_id
WHERE CAST(i.n AS DOUBLE) / se.sz >= 0.6
ORDER BY pool_id, eval_id
""",
)
def q_eval_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIR-LEVEL eval containment: which held-out eval item (every
    50th doc) is >= 60% shingle-contained in which pool document —
    the embedded-benchmark leak (a benchmark question pasted into a
    longer page has low Jaccard to it but near-total containment of
    the EVAL side).  q_benchmark_contamination reports the pooled
    per-doc fraction; this names the specific leaked item per pair,
    which is what a takedown/quarantine actually needs.  Same scale
    shape as q_containment_pairs: df<=50 posting cap bounds the
    shingle-key join; the eval side is small by definition, so the
    candidate set is eval-anchored; containment is measured against
    the EVAL doc's capped shingle size (asymmetric by design)."""
    docs = load_table(spark, sf_dir, "documents")
    tok_docs = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    s = tok_docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda j: gram_at(toks, j, 3),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    ).distinct()
    keep = s.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= 50)
    f = s.join(keep.select("sh"), "sh")
    ev = f.filter(F.col("doc_id") % 50 == 0)
    pool = f.filter(F.col("doc_id") % 50 != 0)
    ev_sizes = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pool.select(F.col("doc_id").alias("pool_id"), "sh")
        .join(ev.select(F.col("doc_id").alias("eval_id"), "sh"), "sh")
        .groupBy("pool_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cont = F.col("n").cast("double") / F.col("eval_sz")
    return (
        inter.join(
            ev_sizes.selectExpr("doc_id AS eval_id", "sz AS eval_sz"), "eval_id"
        )
        .filter(cont >= 0.6)
        .select(
            "pool_id",
            "eval_id",
            F.col("n").cast("long").alias("n_shared"),
            F.col("eval_sz").cast("long").alias("eval_sz"),
            F.round(cont, 6).alias("containment"),
        )
        .orderBy("pool_id", "eval_id")
    )
