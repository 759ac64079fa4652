"""Distributed probabilistic sketches: Bloom filter and Count-Min.

Reference scope: the reference stack (tiny-tinker/cdc-demo) outsources
membership and frequency questions to its provisioned warehouses
(reference README.md "analytics" section); at 100 TB those questions
need sub-linear STATE, not sub-linear scans.  Two classic sketches,
built as plain DataFrame algebra so they shuffle their own size — never
the corpus:

- **Bloom filter** (Bloom CACM'70): membership of a 10B-element set in
  ~GBs of bits.  The pipeline use is cross-corpus decontamination — "was
  this shingle in ANY earlier crawl?" — where joining raw digests means
  shuffling the historical corpus per batch, but probing a bloom built
  once means a map-side join against a table of packed words whose size
  is the BIT BUDGET, independent of corpus size.
- **Count-Min** (Cormode & Muthukrishnan J.Alg'05): frequency estimates
  (always over-, never under-) in depth × width cells.  The pipeline use
  is heavy-hitter n-gram / boilerplate detection under a fixed memory
  budget; the exact groupBy it replaces holds one cell per DISTINCT
  n-gram, which at web scale is the corpus again.

Spark already exposes driver-side sketches (``df.stat.countMinSketch``,
``stat.bloomFilter``) — those collect the sketch TO THE DRIVER and are
build-only (no relational probe).  These stay distributed end-to-end:
build is a groupBy onto the sketch's own key space (word / (row, col)),
probe is an equi-join keyed the same way, so Catalyst co-partitions
probe and sketch and AQE broadcasts the sketch when it fits.

Hashing is the house md5 scheme (``md5(i || ':' || value)`` → first 15
hex digits → BIGINT), the same engine-portable construction as
q_minhash_signatures_md5: 60-bit positive values that DuckDB reproduces
bit-for-bit, so every derived query is value-exact oracle-checkable —
including the sketches' deliberate errors (Bloom false positives,
Count-Min overestimates), which are deterministic functions of the
data, not noise.  xxhash64 would be ~3× cheaper per call; at the
sketch-build grain (one pass at ingest) portability buys a hard oracle
for the whole family and the cost stays a rounding error next to the
shingle explode.

Packing: Bloom words carry **63 bits per long** (bit index 0..62).
Using all 64 would make the top bit the sign bit — Java wraps
``1L << 63`` negative while DuckDB raises an overflow error, so 63
keeps every packed word positive and portable.  The 1.6% space tax is
irrelevant at any budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 63


def md5_long(value: Column) -> Column:
    """The house engine-portable hash: first 15 hex digits of
    md5(value) as a positive long (< 2^60, so modulo stays positive in
    any engine).  ONE named copy of the conv-substring idiom the split
    / shard / signature schemes all build on (r13 review finding #7 —
    three inline copies had to be kept in sync by tests)."""
    return F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")


def md5_position(value: Column, i: Column | int, modulus: int) -> Column:
    """Hash ``i``'s position of ``value`` in ``[0, modulus)`` — the
    engine-portable permutation family.  Value must be a string column;
    the 15-hex-digit prefix is < 2^60 so the modulo is of a positive
    long in both engines."""
    i_col = F.lit(i) if isinstance(i, int) else i
    return md5_long(F.concat(i_col.cast("string"), F.lit(":"), value)) % F.lit(modulus)


def _positions(df: DataFrame, value_col: str, num_bits: int, num_hashes: int) -> DataFrame:
    """One row per (input row, hash i) with the bit position.  Keeps
    every other input column (callers group back by their own id)."""
    return df.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
    ).withColumn("pos", md5_position(F.col(value_col), F.col("i"), num_bits))


def bloom_build(
    df: DataFrame, value_col: str, num_bits: int, num_hashes: int = 4
) -> DataFrame:
    """Build a Bloom filter over ``df[value_col]`` (strings) as a packed
    table ``(word long, bits long)`` with ≤ ceil(num_bits / 63) rows.

    One explode (k rows per value) and ONE shuffle — the groupBy onto
    word ids, whose cardinality is the bit budget / 63, not the corpus.
    Duplicate values cost duplicate map-side rows but partial
    aggregation (bit_or is associative) collapses them before the
    exchange, so the shuffle writes at most the sketch size per task.
    At 100 TB you persist this table once per corpus generation and
    every later batch probes it map-side (AQE broadcasts it up to the
    configured threshold; beyond that the word-key equi-join
    co-partitions probe positions against it).

    NULL values are dropped — md5(NULL) is NULL, which would persist a
    junk (word=NULL, bits=NULL) row violating the packed-word contract
    (every stored word positive, every bits non-null).  The membership
    semantics are "NULL is never a member"; probe mirrors this."""
    return (
        _positions(
            df.select(F.col(value_col)).filter(F.col(value_col).isNotNull()),
            value_col, num_bits, num_hashes,
        )
        .select(
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word"),
            # expr: PySpark's shiftleft() only takes a literal shift
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {BITS_PER_WORD} as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    value_col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int = 4,
) -> DataFrame:
    """Membership test: ``probe`` columns + boolean ``bloom_member``.

    A value is a member iff ALL of its k positions have their bit set,
    tested as min(hit) == 1 — the min over the k probes equals the min
    over their DISTINCT positions even when two hash functions collide
    on one position, so no dedup pass is needed (a sum(hit) == k test
    WOULD need one: counting a position twice would let k-1 set bits
    pass.  An earlier revision paid a full-width distinct shuffle of
    the exploded probe table for exactly that reason).  No false
    negatives by construction; false positives at the classical
    (1 - e^{-kn/m})^k rate, deterministically — the same value always
    probes the same bits.

    Plan shape (r10 rewrite): k SEPARATE broadcast left joins, one per
    hash — each row grows per-hash position/word columns, each join
    picks up that hash's packed word from the sketch-sized broadcast
    bloom, and membership is the AND of the k bit tests.  Fully
    MAP-SIDE: no explode, no group-back — the previous shape exploded
    to k× probe rows and then shuffled them all (with the probe's own
    payload columns as grouping keys) just to re-assemble rows it had
    itself taken apart; at 200k-doc grain the two probes' group-backs
    cost ~19% of the whole decontam entry (27.4 → 22.1 s min-of-3 on
    bloom_200k_decontam — the rest is shingle generation and the
    build), and at 100 TB it was a corpus-width shuffle where none is
    needed.  Output row multiplicity is trivially
    preserved (bloom words are unique, so the joins never fan out).
    A NULL value hashes to NULL positions, misses every join, and
    reports ``bloom_member = false`` (mirrors build, which never
    admits NULL).  The broadcast hint assumes the packed bloom fits
    the driver/executors (ceil(num_bits/63) rows — 2 MB at 2^23 bits,
    32 MB at 2^27); for blooms beyond broadcast scale drop the hint
    and let the k joins co-partition, which is still k narrow
    sketch-key shuffles rather than one corpus-wide group-back."""
    out = probe
    tests = []
    for i in range(num_hashes):
        p = f"__bloom_p{i}"
        w = f"__bloom_w{i}"
        b = f"__bloom_b{i}"
        out = out.withColumn(
            p, md5_position(F.col(value_col), F.lit(i), num_bits)
        ).withColumn(w, (F.col(p) / BITS_PER_WORD).cast("long"))
        out = out.join(
            F.broadcast(
                bloom.select(F.col("word").alias(w), F.col("bits").alias(b))
            ),
            w,
            "left",
        )
        tests.append(
            F.expr(
                f"(shiftright(coalesce({b}, cast(0 as bigint)), "
                f"cast({p} % {BITS_PER_WORD} as int)) & 1) = 1"
            )
        )
    member = tests[0]
    for t in tests[1:]:
        member = member & t
    drop_cols = [
        c
        for i in range(num_hashes)
        for c in (f"__bloom_p{i}", f"__bloom_w{i}", f"__bloom_b{i}")
    ]
    return out.withColumn(
        "bloom_member", F.coalesce(member, F.lit(False))
    ).drop(*drop_cols)


def countmin_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over ``df[value_col]`` as a table
    ``(j int, cell long, cnt long)`` with ≤ depth × width rows.

    Each input row adds its weight (default 1) to one cell per row j;
    the groupBy onto (j, cell) is the only shuffle and its key space is
    the sketch grid.  Absent cells are zero (probe coalesces), so the
    stored table is at most grid-sized however large the corpus.
    NULL values are dropped (a NULL hashes to cell NULL — a junk grid
    row); the frequency semantics are "NULL is never counted", and
    estimate mirrors this with est = 0 for NULL probes."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(F.col(value_col), w.alias("w"))
        .filter(F.col(value_col).isNotNull())
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        )
        .withColumn("cell", md5_position(F.col(value_col), F.col("j"), width))
        .groupBy("j", "cell")
        .agg(F.sum("w").alias("cnt"))
    )


def countmin_estimate(
    values: DataFrame,
    value_col: str,
    cms: DataFrame,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per input row: ``values`` columns + ``est``.

    est = min over rows j of the cell the value hashes to — ≥ the true
    count always (every occurrence landed in all of its cells), and
    within εN of it with probability 1 − δ for width = ⌈e/ε⌉, depth =
    ⌈ln 1/δ⌉ (Cormode & Muthukrishnan J.Alg'05, Thm 1).  The estimate
    is a pure function of (value, sketch), so downstream filters
    (heavy hitters) are deterministic and oracle-checkable.

    Plan (r10 rewrite, same shape as bloom_probe's): ``depth``
    SEPARATE broadcast left joins — each row grows a per-row-j cell
    column, each join picks up that row's grid count from the
    grid-sized broadcast sketch, and the estimate is least() across
    the depth counts.  Fully map-side: no explode, no group-back
    shuffle of the probe table (the previous shape shuffled
    depth × |values| rows keyed by the probe's own payload columns
    just to re-assemble rows).  Grid cells are unique per j so the
    joins never fan out; duplicate input rows keep their own output
    row trivially.  A NULL value hashes nowhere and estimates 0
    (mirrors build, which never counts NULL)."""
    out = values
    ests = []
    for j in range(depth):
        c = f"__cms_c{j}"
        n = f"__cms_n{j}"
        out = out.withColumn(
            c, md5_position(F.col(value_col), F.lit(j), width)
        ).join(
            F.broadcast(
                cms.filter(F.col("j") == j).select(
                    F.col("cell").alias(c), F.col("cnt").alias(n)
                )
            ),
            c,
            "left",
        )
        ests.append(F.coalesce(F.col(n), F.lit(0)))
    drop_cols = [f"__cms_{k}{j}" for j in range(depth) for k in ("c", "n")]
    return out.withColumn("est", F.least(*ests)).drop(*drop_cols)


def histogram_build(
    df: DataFrame, value_col: str, lo: float, hi: float, n_buckets: int
) -> DataFrame:
    """Fixed-grid equi-width histogram over ``df[value_col]`` as a
    table ``(bucket int, cnt long)`` with ≤ n_buckets rows — the
    QUANTILE member of the sketch family (membership=Bloom,
    frequency=Count-Min, cardinality=HLL).

    Counts merge by SUM, so per-partition/per-batch histograms combine
    associatively — the engine-portable alternative to
    ``approx_percentile``, whose t-digest/GK state is engine-specific
    and therefore can never be oracle-checked (q_approx_percentiles is
    rows-only for exactly that reason; q_histogram_quantiles is
    value-exact).  Quantile error is bounded by one bucket width —
    a CHOSEN budget, not corpus-proportional.

    Values outside [lo, hi) clamp into the edge buckets (they shift
    those buckets' interpolated estimates; callers pick bounds from
    domain knowledge or a prior pass).  NULL, NaN, and non-castable
    values are dropped (same contract as the other sketches: junk is
    never counted — try_cast because ANSI mode makes plain cast THROW
    on junk strings, and filtering the RAW column alone is not enough:
    greatest(NULL, 0) skips nulls, so a failed cast or a NaN would
    silently fold into bucket 0 and skew the low edge)."""
    if not hi > lo:
        raise ValueError(f"histogram bounds must satisfy lo < hi, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"histogram needs at least one bucket, got {n_buckets}")
    v = F.col(value_col).try_cast("double")
    b = F.least(
        F.greatest(
            F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * n_buckets).cast("int"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    return (
        df.select(v.alias("__v"), b.alias("bucket"))
        .filter(F.col("__v").isNotNull() & ~F.isnan("__v"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, qs: list[float], lo: float, hi: float, n_buckets: int
) -> DataFrame:
    """Interpolated quantile estimates from a histogram: one row
    ``(q double, est double)`` per requested quantile.

    est = lo + (bucket + (q·N − cum_before) / cnt) · width for the
    first bucket whose cumulative count reaches q·N — linear
    interpolation inside the bucket, deterministic, and every
    arithmetic step is engine-portable double math (the DuckDB oracle
    reproduces it bit-for-bit before the round).  The CDF walk runs on
    the GRID-sized table (≤ n_buckets rows), so the single-partition
    ordered window is a driver-scale triviality, never a corpus
    shuffle.

    Quantiles must satisfy 0 < q ≤ 1, validated loudly: q = 0's target
    of 0 satisfies no (cum ≥ target AND cum_prev < target) bucket, so
    its row would silently VANISH from the output and misalign any
    caller zipping results to its request list.  An EMPTY histogram
    (no counted values: SUM(cnt) is NULL) raises at EXECUTION time for
    the same reason.  That check cannot live on an inner join's input
    (empty-relation propagation — static or AQE — prunes the whole
    join, and the assertion with it), so the CDF probe is a LEFT join:
    the quantile rows always survive, and a row that matched no bucket
    (⇔ empty histogram, since 0 < q ≤ 1 always hits a bucket of a
    non-empty CDF) trips an assert embedded in the output column."""
    bad = [q for q in qs if not 0 < q <= 1]
    if bad:
        raise ValueError(f"quantiles must be in (0, 1]: {bad}")
    if not hi > lo:
        raise ValueError(f"histogram bounds must satisfy lo < hi, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"histogram needs at least one bucket, got {n_buckets}")
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket", "cnt", F.sum("cnt").over(w).alias("cum")
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    total = hist.agg(F.sum("cnt").alias("n"))
    targets = total.select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"), "n"
    ).withColumn("target", F.col("q") * F.col("n"))
    width = float(hi - lo) / n_buckets
    est = F.lit(float(lo)) + (
        F.col("bucket") + (F.col("target") - F.col("cum_prev")) / F.col("cnt")
    ) * F.lit(width)
    # assert_true is NULL when its condition holds, so `when(assert IS
    # NULL, est)` is est on the good path but forces the assertion to
    # evaluate inside the output column — unprunable, since `est` IS
    # the result
    est_checked = F.when(
        F.assert_true(
            F.col("bucket").isNotNull(),
            F.lit("histogram_quantiles: empty histogram (no counted values)"),
        ).isNull(),
        est,
    )
    return (
        targets.join(
            cum,
            (F.col("cum") >= F.col("target")) & (F.col("cum_prev") < F.col("target")),
            "left",
        )
        # no round: every input is an integer count or a literal, so the
        # scalar double math is bit-identical across engines as-is
        .select("q", est_checked.alias("est"))
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 10
) -> DataFrame:
    """HyperLogLog registers as a DataFrame: one row per (group, bucket)
    with ``reg`` = max rank (Flajolet et al. AofA'07) — the sketch AS A
    TABLE, so coarser rollup grains merge with ``groupBy(bucket).max``
    instead of rescanning the fact table, and the whole construction is
    value-exact oracle-checkable (the house md5 scheme: 15 hex chars →
    60-bit BIGINT, identical in DuckDB).

    Layout: top ``p`` hash bits pick the bucket, the remaining
    ``q = 60 - p`` bits feed the rank: ``rho = (#leading zeros) + 1 =
    q + 1 - floor(log2(rem)) - 1 + 1`` computed exactly via
    ``length(bin(rem))`` (both engines print minimal binary), rem == 0
    → q + 1.  Absent (group, bucket) rows ARE register 0 — the
    estimator reconstructs them from the bucket count, so sketch state
    is O(occupied buckets) per group, never a dense m-vector shuffle.

    ``spark.sql.ansi.enabled`` safe: every shift/mask operand is a
    bounded positive literal."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be 4..16, got {p}")
    q = 60 - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    rem = h.bitwiseAND(F.lit((1 << q) - 1).cast("long"))
    rho = F.when(rem == 0, F.lit(q + 1)).otherwise(
        F.lit(q + 1) - F.length(F.bin(rem))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.shiftright(h, q).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 10, est_col: str = "est"
) -> DataFrame:
    """Cardinality estimate from ``hll_registers`` output, bit-exact
    across engines: the harmonic mean ``sum(2^-reg)`` is integer-scaled
    by 2^(q+1) so the sum is an EXACT int64 (reg <= q+1 and <= 2^p
    buckets → sum <= 2^(p+q+1) = 2^61; parallel sum order can't change
    it), and the only non-exact steps are one IEEE division (raw
    estimate) and — on the small-range branch — one ``ln`` (linear
    counting, Flajolet's correction), rounded at 1e-6.  The branch
    predicate itself compares exact values, so both engines take the
    same branch."""
    q = 60 - p
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # numerator alpha * m^2, pre-scaled by the same 2^(q+1) as the sum:
    # one Python-double constant, embedded identically in the oracle
    num = alpha * m * m * float(1 << (q + 1))
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {q + 1} - reg)")).alias(
            "wsum_present"
        ),
        F.count(F.lit(1)).alias("nb"),
    )
    zeros = (F.lit(m) - F.col("nb")).cast("long")
    wsum = F.col("wsum_present") + zeros * F.lit(1 << (q + 1)).cast("long")
    raw = F.lit(num) / wsum.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias(est_col))


def hll_oracle_sql(
    fact_sql: str, group_col: str, value_col: str, p: int = 10
) -> str:
    """DuckDB twin of hll_registers → rollup → hll_estimate for one
    grouping column plus a merged 'ALL' scope (shared by the query
    registration so the constants can never drift from the Spark
    path)."""
    q = 60 - p
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << (q + 1))
    rem = f"(hv & ((CAST(1 AS BIGINT) << {q}) - 1))"
    return f"""
WITH h AS (
  SELECT {group_col},
         CAST('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)
              AS BIGINT) AS hv
  FROM {fact_sql}
  WHERE {value_col} IS NOT NULL
),
r AS (
  SELECT {group_col}, hv >> {q} AS bucket,
         MAX(CASE WHEN {rem} = 0 THEN {q + 1}
                  ELSE {q + 1} - length(bin({rem})) END) AS reg
  FROM h GROUP BY 1, 2
),
scoped AS (
  SELECT 'type:' || {group_col} AS scope, bucket, reg FROM r
  UNION ALL
  SELECT 'ALL' AS scope, bucket, MAX(reg) AS reg FROM r GROUP BY 1, 2
),
agg AS (
  SELECT scope,
         SUM(CAST(1 AS BIGINT) << ({q + 1} - reg)) AS wsum_present,
         COUNT(*) AS nb
  FROM scoped GROUP BY scope
),
e AS (
  SELECT scope,
         {num!r} / CAST(wsum_present
                        + ({m} - nb) * (CAST(1 AS BIGINT) << {q + 1})
                        AS DOUBLE) AS raw,
         {m} - nb AS zeros
  FROM agg
)
SELECT scope,
       round(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                  THEN {float(m)!r} * ln({float(m)!r} / CAST(zeros AS DOUBLE))
                  ELSE raw END, 6) AS est_users
FROM e
ORDER BY scope
"""
