"""Sketch-backed query surface: Bloom-filter decontamination and
Count-Min heavy hitters (operators/sketches.py).

Both sketches use the engine-portable md5 position family, so their
OUTPUTS — including the deliberate, deterministic sketch errors (Bloom
false positives, Count-Min overestimates) — are value-exact
reproducible in DuckDB.  The oracles below replicate every stage
(hash → pack → probe), making the driver's hash gate cover the sketch
math end-to-end, in the same spirit as the md5 MinHash/SimHash twins
(queries/dedup.py).

Sketch parameters are deliberately TIGHT at fixture scale (m = 4096
bits against ~400 benchmark shingles; a 4×1024 Count-Min grid against
~16k distinct 3-grams) so the error paths actually execute: a
comfortably over-provisioned sketch would make every false-positive
branch dead code at test scale.  A real deployment sizes m ≈ 1.44 ·
n · log2(1/fp) and width ≈ e/ε to its OWN n — the point of a sketch is
that those budgets are chosen, not corpus-proportional.
tests/test_sketches.py pins the one-sided guarantees (no Bloom false
negatives; Count-Min never underestimates) against exact references.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators import sketches as SK
from cdc_demo_spark.operators.text import gram_at
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

BLOOM_BITS = 4096
BLOOM_HASHES = 4
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _string_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """Distinct k-token shingles as STRINGS per doc, single-space
    tokenized for exact parity with the oracle's string_split (the
    production paths hash shingles — operators/dedup.hashed_shingles;
    sketches need the portable string so DuckDB can re-hash it)."""
    # tokens materialized in their own projection BEFORE the lambda
    # slices them — an inlined split is re-evaluated per element (no
    # CSE in HOF lambdas), i.e. O(tokens²) per doc; this was the r11
    # engine-wide fix, and this site was found by the r12 lint
    # (tools/lint_hof_lambdas.py)
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    idx = F.when(F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    arr = F.array_distinct(F.transform(idx, lambda j: gram_at(toks, j, k)))
    return base.select("doc_id", F.explode(arr).alias("sh"))


# The oracle's shingle CTEs, shared by both bloom stages.
_ORACLE_SHINGLES = """
  SELECT DISTINCT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents {where}) t,
       UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
"""


# ONE oracle text for both bloom queries: q_incremental_bloom's merged
# two-batch state is bit-identical to the one-shot build (bit_or
# associativity), so both Spark paths must hash-match the SAME SQL —
# sharing the constant keeps any future tweak atomically consistent
# across the pair.
_BLOOM_ORACLE = f"""
WITH bsh AS (
  SELECT DISTINCT sh FROM ({_ORACLE_SHINGLES.format(where="WHERE doc_id % 50 = 0")})
),
bpos AS (
  SELECT DISTINCT
    CAST('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || sh), 1, 15) AS BIGINT)
      % {BLOOM_BITS} AS pos
  FROM bsh CROSS JOIN (SELECT unnest(range({BLOOM_HASHES})) AS i) ii
),
bloom AS (
  SELECT pos // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
  FROM bpos GROUP BY pos // 63
),
cpos AS (
  SELECT DISTINCT doc_id, sh,
    CAST('0x' || substr(md5(CAST(ii.i AS VARCHAR) || ':' || sh), 1, 15) AS BIGINT)
      % {BLOOM_BITS} AS pos
  FROM ({_ORACLE_SHINGLES.format(where="WHERE doc_id % 50 <> 0")})
  CROSS JOIN (SELECT unnest(range({BLOOM_HASHES})) AS i) ii
),
member AS (
  SELECT doc_id, sh,
         MIN(CASE WHEN ((COALESCE(bits, 0) >> CAST(pos % 63 AS INTEGER)) & 1) = 1
                  THEN 1 ELSE 0 END) AS m
  FROM cpos LEFT JOIN bloom ON pos // 63 = word
  GROUP BY doc_id, sh
)
SELECT doc_id,
       COUNT(*) AS n_sh,
       CAST(SUM(m) AS BIGINT) AS n_hits,
       ROUND(SUM(m) * 1.0 / COUNT(*), 6) AS hit_frac
FROM member
GROUP BY doc_id
ORDER BY doc_id
"""


@register("q_bloom_decontamination", oracle=_BLOOM_ORACLE)
def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus decontamination through a Bloom filter: every 50th
    doc stands in for the historical/eval corpus, a 4096-bit k=4 bloom
    is built over its distinct 3-token shingles, and every OTHER doc
    reports what fraction of its shingles the bloom claims to have seen.

    Contrast with q_benchmark_contamination (exact, broadcast shingle
    join): exact needs the eval SHINGLES shipped to every task — fine
    for a benchmark suite, impossible when "the other side" is last
    year's 100 TB crawl.  The bloom is a fixed-budget stand-in whose
    probe cost is independent of the historical corpus size; the price
    is deterministic false positives (m deliberately tight here so they
    occur at fixture scale), which for decontamination is the SAFE
    direction — you only over-quarantine.  No false negatives by
    construction (tests/test_sketches.py pins both properties against
    the exact join).  Docs shorter than 3 tokens emit no shingles and
    no row (the shingle contract, operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    bench_sh = _string_shingles(docs.filter(F.col("doc_id") % 50 == 0)).select("sh").distinct()
    bloom = SK.bloom_build(bench_sh, "sh", BLOOM_BITS, BLOOM_HASHES)
    corpus_sh = _string_shingles(docs.filter(F.col("doc_id") % 50 != 0))
    probed = SK.bloom_probe(corpus_sh, "sh", bloom, BLOOM_BITS, BLOOM_HASHES)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.col("bloom_member").cast("long")).alias("n_hits"),
        )
        .withColumn("hit_frac", F.round(F.col("n_hits") / F.col("n_sh"), 6))
        .orderBy("doc_id")
    )


# Shared by q_countmin_heavy_hitters and q_incremental_countmin: cell
# counts SUM-merge over a disjoint batch split, so the index's merged
# grid is bit-identical to the one-shot build and both queries must
# hash-match the same SQL.
_CMS_ORACLE = f"""
WITH g AS (
  SELECT toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] AS sh
  FROM (SELECT string_split(text, ' ') AS toks FROM documents) t,
       UNNEST(range(greatest(len(toks) - 2, 0))) AS u(j)
),
cells AS (
  SELECT ii.j AS j,
    CAST('0x' || substr(md5(CAST(ii.j AS VARCHAR) || ':' || sh), 1, 15) AS BIGINT)
      % {CMS_WIDTH} AS cell,
    COUNT(*) AS cnt
  FROM g CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j) ii
  GROUP BY 1, 2
),
exact AS (SELECT sh, COUNT(*) AS exact_cnt FROM g GROUP BY sh),
est AS (
  SELECT e.sh, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
  FROM exact e
  CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j) ii
  LEFT JOIN cells c
    ON c.j = ii.j
   AND c.cell = CAST('0x' || substr(md5(CAST(ii.j AS VARCHAR) || ':' || e.sh), 1, 15)
                 AS BIGINT) % {CMS_WIDTH}
  GROUP BY e.sh
)
SELECT e.sh, e.est, x.exact_cnt,
       e.est - x.exact_cnt AS overcount
FROM est e JOIN exact x USING (sh)
ORDER BY e.est DESC, e.sh
LIMIT 40
"""


@register("q_countmin_heavy_hitters", oracle=_CMS_ORACLE)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter 3-grams (boilerplate phrases) via a Count-Min
    sketch, with the exact count alongside so the sketch's one-sided
    error is visible in the output: ``est ≥ exact_cnt`` for every row
    (never under — each occurrence incremented all of its cells), and
    the 4×1024 grid is deliberately small against ~16k distinct fixture
    3-grams so collisions produce real nonzero ``overcount`` rows for
    the oracle to reproduce.  Occurrences count positionally (no
    per-doc distinct) — frequency, not document frequency.

    At 100 TB the exact side of this query is the thing you CANNOT
    compute cheaply (a groupBy holding one cell per distinct n-gram is
    the corpus again); the sketch build is one pass shuffling at most
    depth × width cells, and the heavy-hitter probe touches only the
    candidate set.  Here the fixture corpus is small enough to carry
    the exact twin in-query, which turns the usual "trust the bound"
    into a checked equality per row.  Top-40 by (est desc, sh) is
    deterministic — the pair is unique per 3-gram."""
    docs = load_table(spark, sf_dir, "documents")
    grams = _positional_grams(docs)
    cms = SK.countmin_build(grams, "sh", CMS_DEPTH, CMS_WIDTH)
    return _heavy_hitters_vs_exact(grams, cms)


def _positional_grams(docs: DataFrame) -> DataFrame:
    """Positional (non-distinct) 3-grams with doc_id — occurrences,
    the frequency grain Count-Min counts.  Delegates to the span-dedup
    module's gram extractor so the oracle-parity-critical tokenization
    contract (single-space split, short-doc empty array) lives in ONE
    place."""
    from cdc_demo_spark.operators.spans import ngram_positions

    return ngram_positions(docs, "doc_id", "text", n=3).select(
        F.col("id").alias("doc_id"), F.col("gram").alias("sh")
    )


def _heavy_hitters_vs_exact(grams: DataFrame, cms: DataFrame) -> DataFrame:
    """Top-40 (est desc, sh) with the exact count alongside — shared
    output stage of both Count-Min queries."""
    exact = grams.groupBy("sh").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = SK.countmin_estimate(exact.select("sh"), "sh", cms, CMS_DEPTH, CMS_WIDTH)
    return (
        est.join(exact, "sh")
        .select(
            "sh",
            "est",
            "exact_cnt",
            (F.col("est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("est"), "sh")
        .limit(40)
    )


@register(
    "q_incremental_bloom",
    # SAME oracle as q_bloom_decontamination (shared constant): the
    # index admits the benchmark set in TWO batches, and bit_or
    # associativity makes the merged state BIT-IDENTICAL to the
    # one-shot build — so a stateful incremental operator gets a full
    # value-exact oracle, not the usual rows-only record (contrast
    # q_incremental_minhash, whose equality carries a bucket-cap
    # caveat and stays pytest-proven).
    oracle=_BLOOM_ORACLE,
)
def q_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-crawl decontamination against a PERSISTED, batch-grown
    Bloom ledger (operators/incremental_bloom.BloomIndex): the
    benchmark set lands in two appends (doc_id % 100 == 0, then == 50),
    the corpus probes the merged state.  Output — and oracle — are
    q_bloom_decontamination's exactly, because OR-merged batch words
    are bit-identical to the one-shot build; the driver's hash gate
    therefore covers the incremental state machinery end-to-end."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.incremental_bloom import BloomIndex

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="bloom_index_")
    try:
        idx = BloomIndex(spark, os.path.join(tmp, "idx"), BLOOM_BITS, BLOOM_HASHES)
        bench_sh = _string_shingles(docs.filter(F.col("doc_id") % 50 == 0))
        idx.append_batch(bench_sh.filter(F.col("doc_id") % 100 == 0), "sh")
        idx.append_batch(bench_sh.filter(F.col("doc_id") % 100 == 50), "sh")
        corpus_sh = _string_shingles(docs.filter(F.col("doc_id") % 50 != 0))
        probed = idx.probe(corpus_sh, "sh")
        return (
            probed.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_sh"),
                F.sum(F.col("bloom_member").cast("long")).alias("n_hits"),
            )
            .withColumn("hit_frac", F.round(F.col("n_hits") / F.col("n_sh"), 6))
            .orderBy("doc_id")
            # pinned: the temp index dir is deleted on return; the
            # driver collects AFTER that
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q_incremental_countmin",
    # SAME oracle as q_countmin_heavy_hitters (shared constant): the
    # index admits the corpus occurrences in TWO batches (doc parity),
    # and SUM associativity over the disjoint split makes the merged
    # grid BIT-IDENTICAL to the one-shot build — the second stateful
    # sketch (after q_incremental_bloom) whose incremental machinery
    # gets a full value-exact oracle.  A compact() between the probe
    # and nothing else would change nothing (superseding checkpoint;
    # tests/test_incremental_countmin.py pins that separately).
    oracle=_CMS_ORACLE,
)
def q_incremental_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter 3-grams against a PERSISTED, batch-grown Count-Min
    ledger (operators/incremental_countmin.CountMinIndex): occurrences
    land in two appends split by doc_id parity, the distinct grams
    probe the merged state.  Output — and oracle — are
    q_countmin_heavy_hitters's exactly."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.incremental_countmin import CountMinIndex

    docs = load_table(spark, sf_dir, "documents")
    grams = _positional_grams(docs)
    tmp = tempfile.mkdtemp(prefix="cms_index_")
    try:
        idx = CountMinIndex(spark, os.path.join(tmp, "idx"), CMS_DEPTH, CMS_WIDTH)
        idx.append_batch(grams.filter(F.col("doc_id") % 2 == 0), "sh")
        idx.append_batch(grams.filter(F.col("doc_id") % 2 == 1), "sh")
        # pinned: the temp index dir is deleted on return; the driver
        # collects AFTER that
        return _heavy_hitters_vs_exact(grams, idx.cells()).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


HIST_LO, HIST_HI, HIST_BUCKETS = 900.0, 105000.0, 128
# width exact in binary: 104100 / 128 is a pure 2^-7 shift
_HIST_W = (HIST_HI - HIST_LO) / HIST_BUCKETS


@register(
    "q_histogram_quantiles",
    oracle=f"""
WITH hist AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - {HIST_LO!r})
                                   / {HIST_HI - HIST_LO!r} * {HIST_BUCKETS}) AS INTEGER),
                        0), {HIST_BUCKETS - 1}) AS bucket,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT bucket, cnt,
         SUM(cnt) OVER (ORDER BY bucket) AS cum,
         SUM(cnt) OVER (ORDER BY bucket) - cnt AS cum_prev
  FROM hist
),
targets AS (
  SELECT u.q AS q, u.q * (SELECT SUM(cnt) FROM hist) AS target
  FROM (SELECT unnest([0.25, 0.5, 0.75, 0.95, 0.99]) AS q) u
),
est AS (
  SELECT t.q,
         {HIST_LO!r} + (c.bucket + (t.target - c.cum_prev) / c.cnt) * {_HIST_W!r} AS est
  FROM targets t JOIN cum c ON c.cum >= t.target AND c.cum_prev < t.target
),
exact AS (
  -- list-form quantile_cont (scalar params only); parallel unnest zips
  SELECT unnest([0.25, 0.5, 0.75, 0.95, 0.99]) AS q,
         unnest(quantile_cont(CAST(l_extendedprice AS DOUBLE),
                              [0.25, 0.5, 0.75, 0.95, 0.99])) AS exact
  FROM lineitem
)
SELECT e.q, e.est, x.exact, ROUND(ABS(e.est - x.exact), 6) AS abs_err
FROM est e JOIN exact x USING (q)
ORDER BY e.q
""",
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles from a fixed-grid histogram
    (operators/sketches.histogram_build/histogram_quantiles), with the
    exact sorted-data quantile alongside so the one-bucket-width error
    bound is VISIBLE per row (abs_err < width = 813.28 on a 128-bucket
    grid over l_extendedprice's domain).

    This is the oracle-checkable counterpart to q_approx_percentiles:
    approx_percentile's t-digest/GK state is engine-specific, so that
    query can only ever be rows-only — the histogram's state is plain
    (bucket, cnt) rows that SUM-merge across partitions/batches, and
    every estimate is deterministic double math DuckDB reproduces
    bit-for-bit (no round needed: the CDF counts are integers, so
    there is no accumulation-order drift).  At 100 TB the build is one
    scan shuffling ≤ n_buckets rows; the quantile walk touches a
    grid-sized table."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = SK.histogram_build(li, "l_extendedprice", HIST_LO, HIST_HI, HIST_BUCKETS)
    qs = [0.25, 0.5, 0.75, 0.95, 0.99]
    est = SK.histogram_quantiles(hist, qs, HIST_LO, HIST_HI, HIST_BUCKETS)
    # percentile's percentage must be foldable; the ARRAY form computes
    # all five from ONE aggregation buffer — five scalar calls each
    # buffered the full 600k-value column and cost ~10 s at sf0.1
    # (8.2 s of the first benched pass), vs ~1.5 s for the array form.
    # Mirrors the oracle, which already uses DuckDB's list form.
    arr = ", ".join(repr(q) for q in qs)
    # widen first: the sf0.1 parquet scan coalesces to 3 partitions,
    # serializing the percentile buffer build (2.3 -> 1.5 s measured;
    # the exact twin is a fixture-scale demonstration — at 100 TB the
    # histogram IS the percentile path and this aggregate is the thing
    # you cannot afford)
    wide = li.repartition(li.sparkSession.sparkContext.defaultParallelism)
    agg = wide.agg(
        F.expr(
            f"percentile(cast(l_extendedprice as double), array({arr}))"
        ).alias("ps")
    )
    exact = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.col("ps")[i].alias("exact"),
                    )
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("s")
    ).select("s.q", "s.exact")
    return (
        est.join(exact, "q")
        .select("q", "est", "exact", F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"))
        .orderBy("q")
    )


@register(
    "q_incremental_histogram",
    # The hist CTE is q_histogram_quantiles' exactly: bucket counts
    # merge by SUM over a disjoint split, so the two-batch ledger state
    # is BIT-IDENTICAL to the one-shot build — the third stateful
    # sketch (after bloom and count-min) whose incremental machinery
    # gets a full value-exact oracle.  The running cum column makes the
    # hash cover the merge ORDER-free but cumulative-sum exact.
    oracle=f"""
WITH hist AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - {HIST_LO!r})
                                   / {HIST_HI - HIST_LO!r} * {HIST_BUCKETS}) AS INTEGER),
                        0), {HIST_BUCKETS - 1}) AS bucket,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT bucket, cnt,
       CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
FROM hist ORDER BY bucket
""",
)
def q_incremental_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ledger (operators/incremental_histogram.
    HistogramIndex — the AdditiveLedger protocol instantiated for the
    quantile sketch): l_extendedprice lands in two appends split by
    l_orderkey parity, a compact() checkpoints the first batch midway
    (superseding, not double-counting), and the merged state must be
    BIT-IDENTICAL to a one-shot histogram of the whole column — which
    is exactly what the oracle builds.  The cumulative column is the
    CDF the quantile walk reads (q_histogram_quantiles covers the walk
    itself).  At 100 TB each append scans only its delta and shuffles
    ≤ n_buckets rows; the ledger read is grid-sized."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from cdc_demo_spark.operators.incremental_histogram import HistogramIndex

    li = load_table(spark, sf_dir, "lineitem")
    tmp = tempfile.mkdtemp(prefix="hist_index_")
    try:
        idx = HistogramIndex(
            spark, os.path.join(tmp, "idx"), HIST_LO, HIST_HI, HIST_BUCKETS
        )
        idx.append_batch(li.filter(F.col("l_orderkey") % 2 == 0), "l_extendedprice")
        idx.compact()  # superseding checkpoint mid-history: must change nothing
        idx.append_batch(li.filter(F.col("l_orderkey") % 2 == 1), "l_extendedprice")
        w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        return (
            idx.hist()
            .select("bucket", "cnt", F.sum("cnt").over(w).alias("cum"))
            .orderBy("bucket")
            # pinned: the temp index dir is deleted on return; the
            # driver collects AFTER that
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q_incremental_token_counts",
    # The merged ledger must equal a plain GROUP BY over the whole
    # corpus — SUM associativity over the parity split, same argument
    # as the other incremental oracles, but over EXACT vocabulary-
    # sized state rather than a sketch grid (the AdditiveLedger
    # protocol's first non-sketch member).
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, COUNT(*) AS cnt
FROM toks
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 100
""",
)
def q_incremental_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary ledger (operators/incremental_tokens.
    TokenCountIndex): the corpus's whitespace tokens land in two
    appends split by doc_id parity with a superseding compact between
    them, and the top-100 of the merged state must be value-exact
    against a one-shot GROUP BY — exact counts being the point (this
    is the state a BPE trainer consumes; Count-Min's overestimates
    are the fallback when the vocabulary is too hot to keep).  At
    100 TB each append shuffles only its batch's distinct tokens and
    the top-k is a per-partition heap (TakeOrderedAndProject)."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.incremental_tokens import TokenCountIndex

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tmp = tempfile.mkdtemp(prefix="tok_index_")
    try:
        idx = TokenCountIndex(spark, os.path.join(tmp, "idx"))
        idx.append_batch(toks.filter(F.col("doc_id") % 2 == 0), "token")
        idx.compact()  # superseding checkpoint mid-history
        idx.append_batch(toks.filter(F.col("doc_id") % 2 == 1), "token")
        return idx.topk(100).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q_incremental_moments",
    # Integer-scaled DECIMAL(38,0) moment sums are exactly associative,
    # so the two-batch ledger state equals a one-shot aggregation and
    # the derived mean/stddev are deterministic doubles DuckDB
    # reproduces token-for-token (same portability argument as
    # q_moment_stats) — the fourth incremental ledger with a full
    # value-exact oracle, and the one exercising multi-column SUM
    # merge.
    oracle="""
WITH scaled AS (
  SELECT l_returnflag AS grp, round(CAST(l_extendedprice AS DOUBLE) * 100) AS y
  FROM lineitem
),
m AS (
  SELECT grp, COUNT(*) AS n,
         sum(CAST(y AS DECIMAL(38,0))) AS s1,
         sum(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
                  AS DECIMAL(38,0))) AS s2
  FROM scaled GROUP BY grp
)
SELECT grp, n,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
       sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0 AS stddev
FROM m
ORDER BY grp
""",
)
def q_incremental_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift ledger (operators/incremental_moments.
    MomentsIndex): per-return-flag price moments land in two appends
    split by order-key parity with a superseding compact between
    them, and mean/stddev derived from the merged integer-scaled sums
    must be value-exact against a one-shot aggregation — the state a
    100 TB pipeline keeps to answer "has this group's quality/price
    distribution moved since crawl N" without rescanning history.
    Each append shuffles ≤ |groups| rows."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.incremental_moments import MomentsIndex

    li = load_table(spark, sf_dir, "lineitem")
    tmp = tempfile.mkdtemp(prefix="mom_index_")
    try:
        idx = MomentsIndex(spark, os.path.join(tmp, "idx"), scale=100)
        idx.append_batch(
            li.filter(F.col("l_orderkey") % 2 == 0), "l_returnflag", "l_extendedprice"
        )
        idx.compact()  # superseding checkpoint mid-history
        idx.append_batch(
            li.filter(F.col("l_orderkey") % 2 == 1), "l_returnflag", "l_extendedprice"
        )
        return (
            idx.stats()
            .orderBy("grp")
            .localCheckpoint(eager=True)  # temp dir deleted on return
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
