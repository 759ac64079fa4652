"""Deduplication operators (SURVEY.md §2 B51): exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design (the whole point at 100 TB):
- Exact dedup is a hash-shuffle on a digest of the dedup key — the
  shuffle carries (digest, doc_id), never the document text.
- Near-dup avoids the O(n²) pair space via LSH banding: docs only meet
  if they share a band bucket, so the shuffle key is (band_id, band
  hash) and the quadratic blowup is confined to same-bucket candidates.
  Band/row parameters tune the S-curve: P(candidate) = 1-(1-s^r)^b.
- Verification (exact Jaccard on candidates) touches only candidate
  pairs — at sane thresholds that's ~linear in corpus size.
- Skew guard: a degenerate bucket (e.g. empty-text docs) would explode;
  ``max_bucket`` caps bucket membership before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_demo_spark.operators.text import gram_at, tokens


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id row per distinct value of `cols` (deterministic
    survivor). groupBy on md5 digest of the key columns: the shuffle
    moves 16-byte digests + ids, not payloads."""
    digest = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))
    keep = df.withColumn("_digest", digest).groupBy("_digest").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


def duplicate_groups(df: DataFrame, cols: list[str]) -> DataFrame:
    """Groups with >1 identical rows over `cols` → (digest, n_dups)."""
    digest = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))
    return (
        df.select(digest.alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


# --------------------------------------------------------------------------
# Shingling + exact Jaccard (also the verifier for LSH candidates)
# --------------------------------------------------------------------------


def _shingle_positions(toks: F.Column, k: int) -> F.Column:
    """0-based shingle start positions for a token array — empty for
    docs shorter than k tokens (shared index expression of the string
    and hashed shingle builders)."""
    n = F.size(toks)
    # Docs shorter than k tokens emit NO shingles (not one truncated
    # shingle): two short docs sharing a partial shingle would otherwise
    # pair at jaccard 1.0 while the oracles exclude sub-k docs outright.
    return F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )


def shingle_array_of_tokens(toks: F.Column, k: int = 3) -> F.Column:
    """Distinct k-token shingles from an already-MATERIALIZED token
    array column (per-row, pure codegen — no explode, no shuffle).

    ``toks`` must be a bound attribute (a column projected in a prior
    select), never an inline ``split(...)`` expression: a lambda body
    re-evaluates every embedded expression PER ELEMENT (there is no
    common-subexpression elimination inside higher-order functions),
    which turns shingling O(tokens²) per document — the r11 spans
    finding, 34× measured on long docs (SCALE.md)."""
    # gram_at, not concat_ws(slice(...)): inside this interpreted
    # transform lambda the slice allocates a k-array per shingle —
    # measured 8x slower at the 200k fixture (see text.gram_at)
    sh = F.transform(_shingle_positions(toks, k), lambda i: gram_at(toks, i + 1, k))
    return F.array_distinct(sh)


def hashed_shingle_array(toks: F.Column, k: int = 3) -> F.Column:
    """Distinct xxhash64 k-shingle hashes from a materialized token
    array — ONE transform (gram string + hash per position) and ONE
    distinct over longs (r17 optimization round).  The previous idiom,
    ``array_distinct(transform(shingle_array_of_tokens(toks), xxhash64))``,
    deduplicated the shingle STRINGS first and the hashes second — two
    interpreted array passes, an intermediate string array, and a
    string-keyed hash set, for a result that is the same long set
    (distinct-of-hash(all positions) == distinct-of-hash(distinct
    strings); a cross-shingle hash collision inside a doc collapses
    identically in both).  Same contract as shingle_array_of_tokens:
    ``toks`` must be a bound attribute."""
    sh = F.transform(
        _shingle_positions(toks, k), lambda i: F.xxhash64(gram_at(toks, i + 1, k))
    )
    return F.array_distinct(sh)


def shingle_array(text_col, k: int = 3) -> F.Column:
    """Distinct k-token shingles of a TEXT column.  Convenience form
    for single-use/short-text call sites: the split is inlined into
    the shingle lambda, so it re-tokenizes per position — O(tokens²).
    Hot paths pre-project the token array and use
    ``shingle_array_of_tokens`` instead."""
    return shingle_array_of_tokens(tokens(text_col), k)


def _with_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __toks): the materialization boundary every shingle
    consumer needs (see shingle_array_of_tokens)."""
    return df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-token shingles per document: (id, shingle).

    Uniqueness comes from ``array_distinct`` BEFORE the explode — a
    per-row dedup inside codegen; a post-explode ``.distinct()`` would
    be a full shuffle for nothing."""
    return _with_tokens(df, id_col, text_col).select(
        "id",
        F.explode(shingle_array_of_tokens(F.col("__toks"), k)).alias("shingle"),
    )


def hashed_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-token shingles per document as 64-bit hashes:
    (id, h64). The hash happens INSIDE the array before the explode, so
    only 8-byte longs cross the explode boundary and every downstream
    join/shuffle carries longs instead of ~50-byte strings (measured
    win on the MinHash verification joins). xxhash64 collisions at
    corpus scale are ~|shingles|²/2⁶⁵.  POLICY (round 3+): hashes are
    the shuffle currency on ALL shingle paths, including the
    oracle-backed exact ones (jaccard_pairs, allpairs_jaccard) — the
    collision odds are orders of magnitude below LSH's miss rate and
    the driver's value-exact oracle gate is the standing backstop
    (a collision would surface as a hash-mismatch row).  Use
    ``shingles`` (strings) only where the shingle TEXT itself is the
    output (e.g. BPE merge candidates, contamination reporting)."""
    return _with_tokens(df, id_col, text_col).select(
        "id",
        F.explode(hashed_shingle_array(F.col("__toks"), k)).alias("h64"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    |A∩B| from a self-join on shingle; |A∪B| = |A|+|B|-|A∩B|. Only pairs
    that co-occur in some shingle posting list are materialized — docs
    with no overlap never pair up.

    ``df_cap`` bounds the join fan-out: shingles appearing in more than
    `df_cap` documents are dropped from the universe BEFORE the
    self-join (both intersections and set sizes are computed over the
    reduced universe, so the score stays a true Jaccard — of the
    stopword-shingle-filtered sets). Without it, one corpus-frequent
    shingle creates O(df²) candidate pairs — the classic quadratic
    blowup on boilerplate text; with it, fan-out per shingle is ≤
    df_cap², independent of corpus size. A shingle shared by that many
    documents carries no near-dup signal (it IS boilerplate), which is
    why posting-list caps are standard in large-scale dedup. Pass
    ``df_cap=None`` for the uncapped exact semantics.

    Shuffles carry 8-byte xxhash64 shingle hashes, never the shingle
    strings (collision odds ~|shingles|²/2⁶⁵ — the ``hashed_shingles``
    argument; the oracle gate is the backstop).
    """
    sh = hashed_shingles(df, id_col, text_col, k)
    if df_cap is not None:
        # Ultra-frequent shingles are few by construction -> broadcast
        # anti-join, same shape as the LSH skew guard below.
        frequent = (
            sh.groupBy("h64")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > df_cap)
            .select("h64")
        )
        sh = sh.join(F.broadcast(frequent), "h64", "left_anti")
    sh = sh.cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h64") == F.col("b.h64")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


_MERSENNE = (1 << 31) - 1


def _permutation_params(num_hashes: int, seed: int = 1234567) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(id, signature array<long>) via explode + codegen'd min-aggregates.

    Each shingle is string-hashed ONCE (xxhash64 mod 2³¹-1); the
    num_hashes permutations are affine mixes (a·h+b mod p) of that base
    hash — the standard universal-hashing construction. Map-side partial
    min means the shuffle carries one num_hashes-wide row per (id,
    partition) — documents never move. Alternatives measured and
    rejected: per-permutation xxhash64 inside the agg (num_hashes× the
    string hashing) and per-row higher-order-function folds (HOFs
    evaluate interpreted per element, ~2.5× slower). Products stay
    < 2^62 (h, a < 2^31): no long overflow even under ANSI mode.

    ``shingles_df`` lets a caller that already shingled share the work:
    pass the output of ``shingles`` (strings) or ``hashed_shingles``
    (longs; skips re-hashing)."""
    params = _permutation_params(num_hashes)
    sh = shingles_df if shingles_df is not None else shingles(df, id_col, text_col, k)
    base = (
        F.col("h64") if "h64" in sh.columns else F.xxhash64("shingle")
    )
    hashed = sh.select("id", F.pmod(base, F.lit(_MERSENNE)).alias("h"))
    # % (Remainder), not pmod, for the permutation mixes: h, a, b are all
    # non-negative (h < p after the pmod above), so h*a+b >= 0 and the two
    # are value-identical — but pmod evaluates TWO integer mods per element
    # (((x % p) + p) % p) where Remainder evaluates one, and this expression
    # runs num_hashes times per hash row (the hottest arithmetic in the
    # signature aggregate: 64 x ~30M evaluations at the 200k fixture).
    # r17 optimization round; signature values (and therefore every stored
    # incremental-index byte) are unchanged.
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = hashed.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows: int = 4, max_bucket: int = 200
) -> DataFrame:
    """Band the signatures and pair up docs sharing any band bucket.

    Bucket key = (band index, md5 of the band slice). ``max_bucket``
    drops degenerate buckets (skew guard) before the quadratic pairing.

    PRECONDITION (r16 ADVICE): ``size(signature) >= bands * rows`` for
    every row — the unrolled ``element_at`` reads below index positions
    1..bands*rows directly.  Every in-repo producer satisfies it
    (minhash_signatures emits exactly ``num_hashes = bands*rows``
    elements); an external caller with a SHORTER signature would get
    NULL elements folded into the bucket hash (silently different
    buckets than a slice-based hash) or an INVALID_ARRAY_INDEX error
    under ANSI mode — pass full-length signatures.
    """
    # Bucket = xxhash64 of the band's signature slice (a single hash of
    # an array<long>; equal slices always collide, unequal ones at
    # 2^-64 — negligible). Measured ~2× faster than the previous
    # md5-over-string-concat bucket, which paid 64 long->string casts +
    # a concat + md5 per signature.
    band_entries = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                # element_at reads, not slice: inside this interpreted
                # lambda a slice allocates a rows-array per band;
                # xxhash64(e1..ek) == xxhash64(slice) exactly (the hash
                # folds args the way it folds array elements — pinned
                # in tests/test_dedup.py)
                F.xxhash64(
                    *[F.element_at(F.col("signature"), b * rows + 1 + i)
                      for i in range(rows)]
                ).alias("bucket"),
            ),
        )
    )
    # Lazy local checkpoint (r17 optimization round): the bucket table has
    # THREE consumers below (the skew-guard aggregate and both sides of the
    # pairing self-join), and without the pin each one recomputes the whole
    # upstream SIGNATURE AGGREGATE plus the band hashing — the single most
    # expensive subtree of the near-dup pipeline, measured running ~3x in
    # the cold composite (same idiom and same O(corpus)-temp-storage trade
    # as the spans hybrid plan's gram checkpoint).  Materialized once at
    # the first action; rows are slim (id, band, bucket) longs.
    buckets = signatures.select("id", band_entries.alias("e")).select(
        "id", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket")
    ).localCheckpoint(eager=False)
    # Skew guard via groupBy+join (map-side partial count) rather than a
    # count-over-window, which would shuffle AND sort every bucket row.
    oversized = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > max_bucket)
        .select("band", "bucket")
    )
    buckets = buckets.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates
    → exact-Jaccard verification at `threshold` (no false positives; the
    miss rate follows the LSH S-curve, asserted in tests).

    Verification is a single ``array_intersect`` per candidate against
    cached per-doc hash arrays — the same rewrite that took
    allpairs_jaccard from 12.8s to 5.7s replaced the posting-list
    double re-join + groupBy here (2.88s → measured below); the
    exploded view feeds only the signature aggregate."""
    rows = num_hashes // bands
    # One hashed-shingle pass feeds signatures AND verification: docs
    # carries the per-doc hash arrays (array_distinct kills the rare
    # cross-shingle hash collision inside a doc), sh explodes it for the
    # signature min-aggregate. Every shuffle carries longs, never text.
    arr = hashed_shingle_array(F.col("__toks"), k)
    docs = _with_tokens(df, id_col, text_col).select("id", arr.alias("hs")).cache()
    sh = docs.select("id", F.explode("hs").alias("h64"))
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes, shingles_df=sh)
    # candidate pairs pinned (lazy): three consumers below — the id
    # union and both verify joins (r17)
    cands = lsh_candidate_pairs(sigs, bands, rows).localCheckpoint(eager=False)
    # Verify against the CANDIDATE docs only (r17): the two hash-array
    # attach joins each probe-scanned the full docs cache; semi-joining
    # docs to the candidate id set once (AQE broadcasts a small id set
    # at runtime — no hint, a huge candidate set degrades to a hash
    # join, never a second corpus pass) makes both attaches read a
    # candidate-sized frame instead.
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionAll(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docs_c = docs.join(cand_ids, "id", "left_semi").localCheckpoint(eager=False)
    # No broadcast hint on cands: forcing it serializes the whole LSH
    # stage before verification can start (measured slower); AQE converts
    # to broadcast at runtime when the pair set is actually small.
    verified = (
        cands.join(docs_c.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(docs_c.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("inter"),
            F.size("hs_a").alias("sz_a"),
            F.size("hs_b").alias("sz_b"),
        )
    )
    return (
        verified.withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_cross_near_duplicates(
    pool: DataFrame,
    evalset: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """CROSS-CORPUS MinHash-LSH: near-duplicate pairs BETWEEN two
    frames — the fuzzy-decontamination shape (pool docs that are a
    light edit of a held-out eval doc share most shingles but no exact
    text, so the exact/Bloom decontaminators miss them and the
    embedding one needs vectors; this catches them at the n-gram
    level).  Same signature math, banding, and exact-Jaccard
    verification as ``minhash_near_duplicates``, but the bucket join
    pairs pool ids against eval ids only — no within-side pairs, no
    id-order constraint, and the skew guard counts bucket occupancy
    across BOTH sides (a viral-boilerplate bucket explodes the join
    regardless of which side it came from).  Output one row per
    verified (pool_id, eval_id) pair at ``threshold``.

    Scale shape: both sides shingle/sign independently (map-side
    partial mins, shuffles carry longs, never text); the candidate
    join is bucket-keyed; verification joins the two hash-array caches
    once per candidate.  The eval side is typically tiny — AQE
    broadcasts its buckets and arrays, making the whole probe
    pool-scan-shaped."""
    rows = num_hashes // bands
    sides = {}
    for name, df in (("a", pool), ("b", evalset)):
        arr = hashed_shingle_array(F.col("__toks"), k)
        docs = _with_tokens(df, id_col, text_col).select("id", arr.alias("hs")).cache()
        sh = docs.select("id", F.explode("hs").alias("h64"))
        sigs = minhash_signatures(df, id_col, text_col, k, num_hashes, shingles_df=sh)
        band_entries = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        *[F.element_at(F.col("signature"), b * rows + 1 + i)
                          for i in range(rows)]
                    ).alias("bucket"),
                ),
            )
        )
        # same lazy pin as lsh_candidate_pairs (r17): each side's bucket
        # table feeds the occupancy union AND the candidate join — unpinned,
        # both recompute the side's signature aggregate
        buckets = sigs.select("id", band_entries.alias("e")).select(
            "id", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket")
        ).localCheckpoint(eager=False)
        sides[name] = (docs, buckets)
    docs_a, buckets_a = sides["a"]
    docs_b, buckets_b = sides["b"]
    oversized = (
        buckets_a.select("band", "bucket")
        .unionAll(buckets_b.select("band", "bucket"))
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > max_bucket)
        .select("band", "bucket")
    )
    buckets_a = buckets_a.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")
    buckets_b = buckets_b.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")
    cands = (
        buckets_a.select(F.col("id").alias("id_a"), "band", "bucket")
        .join(
            buckets_b.select(F.col("id").alias("id_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    verified = (
        cands.join(
            docs_a.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
        )
        .join(
            docs_b.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("inter"),
            F.size("hs_a").alias("sz_a"),
            F.size("hs_b").alias("sz_b"),
        )
    )
    return (
        verified.withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash over tokens: per-bit majority vote of token hashes.

    One aggregate over the token array (per-row, no shuffle): for each
    bit, sum ±1 votes across tokens, then pack the sign vector into a
    long. Near-dup = small Hamming distance. Shift amounts must be
    Python literals in Spark, so the per-bit expressions are unrolled at
    plan-build time (64 codegen'd exprs, still zero Python at runtime)."""
    toks = F.array_distinct(tokens(text_col))

    def bit_votes(w):
        h = F.xxhash64(w)
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
                .cast("long")
                for i in range(bits)
            ]
        )

    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, w: F.zip_with(acc, bit_votes(w), lambda a, v: a + v),
    )
    df = df.select(F.col(id_col).alias("id"), votes.alias("_votes"))
    packed = F.lit(0).cast("long")
    for i in range(bits):
        packed = packed.bitwiseOR(
            F.when(
                F.element_at("_votes", i + 1) > 0,
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return df.select("id", packed.alias("simhash"))


def hamming_distance(a, b) -> F.Column:
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)) if isinstance(a, str) else a.bitwiseXOR(b))


def simhash_near_duplicates(df: DataFrame, id_col: str, text_col: str, max_distance: int = 3) -> DataFrame:
    """Pair docs with Hamming(simhash) <= max_distance, via 4-chunk
    multi-probe blocking: candidates must share at least one exact
    16-bit chunk. Pigeonhole guarantee: <=3 flipped bits cannot touch
    all 4 chunks, so recall is 100% for max_distance<=3 (and high, not
    guaranteed, above). Shuffle key = (chunk index, chunk value) — 4
    rows per doc, never the O(n²) pair space."""
    sig = simhash(df, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for i in range(4)
        ]
    )
    blocked = sig.select("id", "simhash", F.explode(chunks).alias("c")).select(
        "id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .distinct()
        .withColumn("hamming", hamming_distance(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document overlap with a benchmark/eval set: (id, n_shingles,
    n_hits, contamination) where contamination = fraction of the doc's
    distinct k-gram shingles that also appear in ANY benchmark doc.
    The training-data decontamination primitive: docs above a
    contamination threshold are dropped (or quarantined) before
    training so eval numbers stay honest.

    Scale shape: the benchmark side is small by definition (eval sets
    are thousands of docs, the corpus is billions), so its DISTINCT
    shingle set is broadcast; corpus shingles stream past the hash map
    and only (id, hit?) longs reach the per-doc aggregate — the corpus
    text itself never shuffles. At 100 TB the only wide exchange is the
    final groupBy(id), which partial-aggregates map-side."""
    doc_sh = shingles(docs, id_col, text_col, k)
    bench_sh = shingles(benchmark, id_col, text_col, k).select("shingle").distinct()
    per_doc = (
        doc_sh.join(F.broadcast(bench_sh).withColumn("_hit", F.lit(1)), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hits"),
        )
    )
    return per_doc.select(
        "id",
        "n_shingles",
        "n_hits",
        F.round(
            F.col("n_hits").cast("double") / F.col("n_shingles").cast("double"), 6
        ).alias("contamination"),
    )


def allpairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LOSSLESS all-pairs Jaccard join at a threshold via prefix
    filtering (the AllPairs/PPJoin family, Bayardo et al. WWW'07).

    ``jaccard_pairs``'s df_cap bounds fan-out by *changing the
    universe* (frequent shingles are dropped from the sets, so scores
    are Jaccard-of-filtered-sets).  Prefix filtering bounds fan-out
    while staying EXACT: order the shingle universe canonically by
    (document frequency asc, shingle), and index only each document's
    first ``n - ceil(t*n) + 1`` shingles in that order.  If J(A,B) >= t
    then |A∩B| >= t*|A∪B| >= ceil(t*max(|A|,|B|)); were the smallest
    common shingle outside A's prefix, A would have >= prefix-length
    shingles before it none of which are in B, capping the
    intersection below that bound — contradiction.  So every
    qualifying pair shares a *prefix* shingle and the candidate join
    touches only prefixes.

    The rare-first canonical order is also the performance story: the
    corpus-frequent boilerplate shingles sort to the END of every
    document, so they fall out of the prefixes and the quadratic
    posting-list blowup never happens — frequency skew is neutralized
    by ordering, not by deleting data.  Candidates are then verified
    exactly against the FULL shingle sets.

    Scale: every shuffle carries 8-byte xxhash64 shingle hashes, never
    shingle strings (collisions perturb a count at ~|union|²/2⁶⁵ —
    immeasurable next to float rounding, same argument as
    ``hashed_shingles``; the external-oracle gate would catch one).
    Prefix index build is one hash-keyed join (df lookup) + one per-doc
    window; candidate generation joins prefix-to-prefix (posting lists
    of rare shingles — short by construction); verification is a single
    ``array_intersect`` per candidate against the per-doc hash arrays
    (built per-row in codegen — the full posting lists are never
    re-joined).  No driver state, no caps, no approximation.
    """
    from pyspark.sql import Window

    arr = hashed_shingle_array(F.col("__toks"), k)
    docs = _with_tokens(df, id_col, text_col).select("id", arr.alias("hs")).cache()
    sh = docs.select("id", F.explode("hs").alias("h64"))
    dfreq = sh.groupBy("h64").agg(F.count(F.lit(1)).alias("sh_df"))
    w_rank = Window.partitionBy("id").orderBy("sh_df", "h64")
    # count() rides the SAME ordered spec with an explicit
    # unbounded-both frame (r16 span-detection lesson, applied here
    # r17): the order-less count window sorted the joined shingle
    # stream a second time for a value the ordered partition already
    # holds — one Window node, one sort.
    prefix = (
        sh.join(dfreq, "h64")
        .select(
            "id",
            "h64",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1))
            .over(
                w_rank.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("n"),
        )
        .filter(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(float(threshold)) * F.col("n")) + 1
        )
        .select("id", "h64")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.h64") == F.col("b.h64")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(docs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(docs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("inter"),
            F.size("hs_a").alias("sz_a"),
            F.size("hs_b").alias("sz_b"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return verified.filter(jac >= F.lit(float(threshold))).select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    )


def simhash_md5(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """Engine-portable SimHash: md5 token hashes (identical hex in any
    engine) instead of xxhash64, 60 bits (15 hex chars -> the hash fits
    a signed int64 in both Spark and DuckDB via '0x'-cast), so the
    WHOLE pair graph is oracle-checkable value-exact — the upgrade that
    moves the SimHash family from rows-only to hash-match verification
    (q_simhash_hamming_pairs).

    Shape follows the house lesson from deletion_pairs (r6): explode
    tokens into rows and aggregate 60 codegen'd ±1 bit votes per doc —
    no interpreted array-HOF fold (the xxhash64 simhash() predates the
    lesson and keeps its shape for compatibility; at its 500-doc usage
    the difference is irrelevant, at corpus scale use this one).
    Integer votes, deterministic ties (v > 0 -> bit set): bit-exact
    across engines by construction."""
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be 1..60 (15 hex chars of md5), got {bits}")
    # single-space split, NOT the \s+ tokens() helper: the portability
    # claim includes tokenization, and SQL engines' string_split(' ')
    # emits empty tokens on runs of whitespace where \s+ would not —
    # a latent value divergence on any non-single-spaced corpus
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h = toks.select(
        "id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("hv")
    )
    votes = h.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright("hv", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed + F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("id", packed.alias("simhash"))


def hamming_pairs(
    sig: DataFrame,
    max_distance: int = 3,
    bits: int = 60,
    sig_col: str = "simhash",
) -> DataFrame:
    """(id_a, id_b, hamming) for signature pairs within ``max_distance``
    bit flips, via (max_distance+1)-chunk pigeonhole blocking (Manku et
    al. WWW'07): <= d flips cannot touch all d+1 disjoint chunks, so
    every qualifying pair shares at least one exact chunk — lossless by
    pigeonhole, verified exactly by bit_count(xor).  Generalizes the
    4x16-bit blocking in simhash_near_duplicates to any (bits, d) with
    (d+1) | bits.  Shuffle key = (chunk index, chunk value); candidate
    volume tracks chunk collisions, never the O(n²) pair space."""
    n_chunks = max_distance + 1
    if bits % n_chunks:
        raise ValueError(f"chunk count {n_chunks} must divide bits={bits}")
    width = bits // n_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(sig_col, width * i).bitwiseAND(F.lit(mask)).alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    blocked = sig.select("id", sig_col, F.explode(chunks).alias("c")).select(
        "id", sig_col, F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col(f"a.{sig_col}").alias("sh_a"),
            F.col(f"b.{sig_col}").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
    )
