"""DSIR-style importance resampling for domain-targeted data selection.

Given a raw multilingual/multi-source pool and a TARGET domain (a
predicate selecting the docs whose distribution we want more of), score
every raw document by how target-like it looks and resample the pool
proportionally — the method of Xie, Santurkar, Ma & Liang, "Data
Selection for Language Models via Importance Resampling" (DSIR,
NeurIPS 2023; arXiv:2302.03169).  The features are hashed n-gram bags
(unigrams + bigrams hashed into ``n_buckets`` buckets), the bucket
models are Laplace-smoothed categorical distributions fit on the
target slice and on the whole pool, and each document's importance
log-weight is

    log w(d) = sum over buckets b of  c_d[b] * (ln p_target[b] - ln p_raw[b])

Resampling without replacement proportional to w is the Gumbel-max
race: key(d) = log w(d) + G(d) with G = -ln(-ln u), u the engine's
deterministic md5-uniform (operators/sampling.uniform_from_id) — so
the selected subset is reproducible across runs, engines, and cluster
sizes, exactly like every other sampler in this repo.

Scale shape (100 TB): the corpus-grain work is TWO passes over the
hashed n-gram stream, each ending in a BOUNDED hash aggregate — pass 1
carries a per-doc target flag into the stream and counts both bucket
models in one ≤``n_buckets``-key aggregate; pass 2 joins the broadcast
≤``n_buckets``-row log-ratio table per gram and sums at DOC grain
(#docs keys).  The doc × bucket cross grain is deliberately NEVER
built in-query: its hash aggregate carries tens of millions of keys at
the 200k bench fixture and was both the wall-clock and the memory hot
spot of the first formulation (432 s, and pinning it OOMed the
aggregate; the gram-grain form runs the same math in ~a quarter of
that with flat memory).  ``hashed_ngram_counts`` still emits that
grain as the ON-DISK artifact shape — write it once and any number of
target models and weight sets derive from it via ``counts=`` without
re-scanning the corpus.  Nothing here collects more than
``n_buckets`` rows or a scalar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_demo_spark.operators.sampling import uniform_from_id
from cdc_demo_spark.operators.sketches import md5_long


def _bucket_of(g: Column, n_buckets: int, salt: str, hash_impl: str) -> Column:
    """gram -> bucket id under the chosen hash family: ``'md5'`` is the
    engine-portable default every oracle replays; ``'xx'`` is the
    xxhash64 PRODUCTION fast path (measured 2.3x cheaper per gram pass
    at the 200k bench grain — the same md5-twin-vs-xxhash split the
    MinHash family uses).  Bucketing quality is equivalent (both
    uniform); only cross-engine replayability differs."""
    keyed = F.concat(F.lit(salt + ":"), g)
    if hash_impl == "md5":
        return (md5_long(keyed) % n_buckets).cast("long")
    if hash_impl == "xx":
        return F.pmod(F.xxhash64(keyed), F.lit(n_buckets)).cast("long")
    raise ValueError(f"unknown hash_impl {hash_impl!r} (use 'md5' or 'xx')")


def _gram_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    salt: str,
    extra_cols: list[str] | None = None,
    hash_impl: str = "md5",
) -> DataFrame:
    """(id_col, b[, extra_cols]): the hashed n-gram stream at GRAM
    grain, un-aggregated — the shared corpus pass every consumer
    shapes to its own grain (bucket tables aggregate it to ≤B keys,
    weight sums to doc keys; nothing ever needs the doc × bucket cross
    grain in memory — see dsir_logweights' scale note).

    The token array is MATERIALIZED in a prior select before the
    bigram lambda touches it — the r11 shingle rule
    (operators/dedup.shingle_array_of_tokens): a lambda body
    re-evaluates embedded expressions per element, so an inline
    split() inside the bigram transform re-tokenizes per position,
    O(tokens²) per doc (measured 52 s -> ~4 s for this pass at the
    200k fixture)."""
    base = df.select(
        F.col(id_col), *(extra_cols or []),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    # guard n<2: F.sequence(1, 0) would generate a DESCENDING range
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select(
        F.col(id_col), *(extra_cols or []),
        F.explode(F.concat(toks, bigrams)).alias("g"),
    )
    b = _bucket_of(F.col("g"), n_buckets, salt, hash_impl)
    return ex.select(id_col, *(extra_cols or []), b.alias("b"))


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 512,
    salt: str = "dsir_v1",
    hash_impl: str = "md5",
) -> DataFrame:
    """(id_col, b, c): per-document hashed n-gram bucket counts — the
    materialized ARTIFACT form of the feature extraction (write it
    once, fit any number of target models from it via
    ``dsir_log_ratios`` / ``dsir_logweights(counts=...)``).  N-grams
    are the non-empty whitespace tokens (unigrams) plus the adjacent
    token bigrams; bucket = md5_long(salt:gram) % n_buckets, the
    engine-portable hash every sharding scheme here uses.  Documents
    with no tokens contribute no rows (callers LEFT JOIN and coalesce).

    NOTE: this grain (doc × bucket) is the right shape for an on-disk
    artifact, but the in-query operators do NOT route through it —
    its hash aggregate carries tens of millions of keys at the 200k
    bench fixture and that is exactly the memory/spill hot spot the
    gram-grain formulation avoids."""
    return (
        _gram_stream(df, text_col, id_col, n_buckets, salt, hash_impl=hash_impl)
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _bucket_models(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_ids: DataFrame,
    n_buckets: int,
    salt: str,
    hash_impl: str = "md5",
) -> DataFrame:
    """(b, cr, ct): BOTH bucket models from ONE corpus pass — each doc
    carries its target-membership flag into the gram stream (slim
    broadcast-able id join), and a single ≤B-key aggregate counts the
    raw and target occurrences side by side.  Exact integers, so the
    downstream ratio math is engine-identical.  The flag join is
    doc-grain (AQE broadcasts a small target set; a huge one degrades
    to a hash join, never a corpus re-scan)."""
    flagged = df.select(F.col(id_col), F.col(text_col)).join(
        target_ids.select(id_col).withColumn("_t", F.lit(1)),
        id_col,
        "left",
    )
    grams = _gram_stream(
        flagged, text_col, id_col, n_buckets, salt, ["_t"], hash_impl=hash_impl
    )
    return grams.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("ct"),
    )


def dsir_log_ratios(
    counts: DataFrame, id_col: str, target_ids: DataFrame, n_buckets: int
) -> DataFrame:
    """(b, lam): per-bucket ln p_target - ln p_raw with Laplace
    smoothing (+1 over total + n_buckets), fit from a (id, b, c)
    count table and the target-membership id set.  At most
    ``n_buckets`` rows — always broadcastable.  Buckets never seen in
    the raw pool don't need rows: no document can reference them.
    The ratio is a pure function of exact integer counts, so both
    engines compute bit-identical operands into ln()."""
    rawb = counts.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt = counts.join(target_ids, id_col, "left_semi")
    tgtb = tgt.groupBy("b").agg(F.sum("c").alias("ct"))
    tot = counts.agg(F.sum("c").cast("double").alias("tr"))
    ttot = tgt.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("double").alias("tt"))
    B = F.lit(float(n_buckets))
    return (
        rawb.join(tgtb, "b", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("tt") + B)
                )
                - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + B))
            ).alias("lam"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_expr: Column | None = None,
    n_buckets: int = 512,
    salt: str = "dsir_v1",
    target_ids: DataFrame | None = None,
    counts: DataFrame | None = None,
    hash_impl: str = "md5",
) -> DataFrame:
    """(id_col, n_ngrams, logweight_raw): every document's DSIR
    importance log-weight toward the target domain.  The target is
    either ``target_expr`` (a predicate over ``df``'s own columns) or
    an explicit ``target_ids`` id-set frame (the pipeline shape: the
    predicate lives on a DIFFERENT frame, e.g. raw-input metadata
    joined by id) — exactly one must be given.  Documents with no
    n-grams get weight ln(1) = 0.0 (every model assigns them
    probability 1 over the empty product — they are
    distribution-neutral).  ``logweight_raw`` is the unrounded
    double; queries round for oracle comparison.  ``counts`` lets a
    caller supply an already-materialized (id, b, c) artifact (read
    back from parquet) and routes the math through it instead of
    re-scanning the corpus.

    Scale shape (the 432 s lesson, late r15): the default path never
    builds the doc × bucket grain — its hash aggregate carries tens of
    millions of keys at the 200k fixture and was both the wall-clock
    and the memory hot spot (pinning it OOMed the aggregate).
    Instead, TWO gram-grain corpus passes with bounded aggregates:
    pass 1 carries a per-doc target flag into the stream and counts
    both models in one ≤B-key aggregate; pass 2 joins the broadcast λ
    per gram and sums at DOC grain (#docs keys).  Gram rows are never
    stored, only streamed through map-side partial aggregation."""
    if (target_expr is None) == (target_ids is None):
        raise ValueError(
            "dsir_logweights: pass exactly one of target_expr / target_ids"
        )
    if target_ids is None:
        target_ids = df.filter(target_expr).select(id_col)
    else:
        target_ids = target_ids.select(id_col)
    B = F.lit(float(n_buckets))
    if counts is not None:
        # artifact path: bucket-grain math over the supplied table
        lam = dsir_log_ratios(counts, id_col, target_ids, n_buckets)
        per = (
            counts.join(F.broadcast(lam), "b")
            .groupBy(id_col)
            .agg(
                F.sum("c").cast("long").alias("n_ngrams"),
                F.sum(F.col("c") * F.col("lam")).alias("logweight_raw"),
            )
        )
    else:
        models = _bucket_models(
            df, text_col, id_col, target_ids, n_buckets, salt, hash_impl=hash_impl
        )
        tot = models.agg(
            F.coalesce(F.sum("cr"), F.lit(0)).cast("double").alias("tr"),
            F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("tt"),
        )
        lam = (
            models.crossJoin(F.broadcast(tot))
            .select(
                "b",
                (
                    F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + B))
                    - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + B))
                ).alias("lam"),
            )
        )
        grams = _gram_stream(df, text_col, id_col, n_buckets, salt,
                             hash_impl=hash_impl)
        per = (
            grams.join(F.broadcast(lam), "b")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_ngrams"),
                F.sum("lam").alias("logweight_raw"),
            )
        )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce(F.col("logweight_raw"), F.lit(0.0)).alias("logweight_raw"),
        )
    )


def dsir_multi_logweights(
    counts: DataFrame,
    id_col: str,
    targets: dict[str, DataFrame],
    n_buckets: int = 512,
    all_ids: DataFrame | None = None,
) -> DataFrame:
    """Score MANY target domains from ONE materialized counts artifact
    — the amortization ``hashed_ngram_counts`` exists for, made a
    single operator: given the (id, b, c) table and a dict of
    ``name -> target-id frame``, return one row per document with a
    ``lw_<name>`` importance log-weight column per target (plus
    ``n_ngrams``).  A DSIR deployment rarely wants ONE target — it
    scores the pool against several domains (languages, quality
    strata, eval-adjacent slices) and mixes; re-running the corpus
    pass per target would cost T corpus scans, this costs O(1) in the
    corpus regardless of T.

    Scale shape: THREE scans of the artifact, none of the corpus —
    (1) raw bucket totals (≤B keys); (2) per-target bucket totals in
    ONE aggregate — the tagged membership union joins doc-grain and
    aggregates to ≤B·T keys (a doc in several targets is correctly
    counted once per tag because the tag is part of the join output,
    and raw totals deliberately come from scan 1, unmultiplied);
    (3) one doc-grain scoring aggregate against the broadcast wide λ
    table (≤B rows, T+1 columns).  Laplace smoothing and ln() math
    are bit-identical to ``dsir_logweights`` per target — pinned in
    tests/test_importance.py.  ``all_ids`` (default: the ids present
    in ``counts``) supplies the zero-n-gram documents, which score
    0.0 toward every target (distribution-neutral), matching the
    single-target operator."""
    if not targets:
        raise ValueError("dsir_multi_logweights: targets dict is empty")
    for name in targets:
        if not name.isidentifier():
            raise ValueError(
                f"dsir_multi_logweights: target name {name!r} must be a "
                "valid identifier (it becomes the lw_<name> column)"
            )
    B = F.lit(float(n_buckets))

    # scan 1: raw model (≤B keys) + its total
    rawb = counts.groupBy("b").agg(F.sum("c").alias("cr"))
    tot = rawb.agg(F.sum("cr").cast("double").alias("tr"))

    # scan 2: every target's bucket model in ONE tagged aggregate
    membership = None
    for name, ids in targets.items():
        tagged = ids.select(F.col(id_col)).distinct().withColumn("_t", F.lit(name))
        membership = tagged if membership is None else membership.unionByName(tagged)
    tgtb = (
        counts.join(membership, id_col)
        .groupBy("b", "_t")
        .agg(F.sum("c").alias("ct"))
    )
    ttot = tgtb.groupBy("_t").agg(F.sum("ct").cast("double").alias("tt"))

    # wide λ table: pivot the per-target counts to columns (≤B rows
    # after), then derive every λ column in one projection against the
    # broadcast raw total and the ≤T collected target totals
    ct_wide = tgtb.groupBy("b").pivot("_t", list(targets)).agg(F.first("ct"))
    tt_rows = {r["_t"]: float(r["tt"]) for r in ttot.collect()}  # ≤T rows
    lam_wide = rawb.crossJoin(F.broadcast(tot)).join(ct_wide, "b", "left")
    lam_cols = []
    for name in targets:
        tt = F.lit(tt_rows.get(name, 0.0))
        lam_cols.append(
            (
                F.log(
                    (F.coalesce(F.col(name), F.lit(0)) + 1).cast("double")
                    / (tt + B)
                )
                - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + B))
            ).alias(f"lam_{name}")
        )
    lam = lam_wide.select("b", *lam_cols)

    # scan 3: one doc-grain aggregate against the broadcast wide λ
    per = (
        counts.join(F.broadcast(lam), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_ngrams"),
            *[
                F.sum(F.col("c") * F.col(f"lam_{name}")).alias(f"lw_{name}")
                for name in targets
            ],
        )
    )
    base = (all_ids if all_ids is not None else counts).select(id_col).distinct()
    return base.join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
        *[
            F.coalesce(F.col(f"lw_{name}"), F.lit(0.0)).alias(f"lw_{name}")
            for name in targets
        ],
    )


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_expr: Column,
    k: int,
    n_buckets: int = 512,
    salt: str = "dsir_v1",
    pick_salt: str = "dsir_pick",
    logweights: DataFrame | None = None,
    hash_impl: str = "md5",
) -> DataFrame:
    """``k`` documents drawn without replacement with probability
    proportional to exp(logweight) — the DSIR selection step, as a
    deterministic Gumbel-max race: key = round(logweight, 6) +
    (-ln(-ln u)) with u = md5-uniform(pick_salt:id).  Rounding the
    weight first makes the deterministic part engine-exact, so the
    race key differs across engines only by libm ulps in ln() — the
    same accepted-margin argument as operators/sampling.weighted_sample
    (the registered query additionally measures its rank-k boundary
    gap in tests).  Plans as TakeOrderedAndProject: per-partition
    top-k heaps, no global sort.  Pass ``logweights`` (a
    dsir_logweights result already in hand) to reuse the scored frame
    instead of re-running the whole feature/model/weight chain."""
    lw = (
        logweights
        if logweights is not None
        else dsir_logweights(
            df, text_col, id_col, target_expr, n_buckets, salt,
            hash_impl=hash_impl,
        )
    )
    u = uniform_from_id(F.col(id_col), pick_salt)
    key = F.round(F.col("logweight_raw"), 6) - F.log(-F.log(u))
    return (
        df.join(lw, id_col)
        .withColumn("_key", key)
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(int(k))
    )


def freeze_dsir_ratios(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_expr: Column | None = None,
    n_buckets: int = 512,
    salt: str = "dsir_v1",
    target_ids: DataFrame | None = None,
) -> list[float]:
    """The per-bucket log-ratio model as a DENSE driver-side list
    (index = bucket id) — the FROZEN form a streaming epoch ships:
    derive once from a corpus snapshot, then score micro-batches with
    ``dsir_score_expr`` (a pure expression, no join), the same
    freeze-per-epoch rationale as the streaming mixture twin (a
    per-batch model would make a doc's score depend on which batch
    delivered it).  Buckets the snapshot never saw get the smoothed
    unseen ratio ln((Tr+B)/(Tt+B)) — what the Laplace model assigns a
    count-0 bucket — so a NEW n-gram arriving mid-epoch scores
    consistently instead of 0.  ONE corpus pass (the flagged
    gram-grain aggregate — same scale shape as dsir_logweights), one
    ≤B-row collect; ratios and totals derive driver-side from the
    exact integer counts."""
    if (target_expr is None) == (target_ids is None):
        raise ValueError(
            "freeze_dsir_ratios: pass exactly one of target_expr / target_ids"
        )
    tgt_ids = (
        df.filter(target_expr).select(id_col)
        if target_ids is None
        else target_ids.select(id_col)
    )
    rows = _bucket_models(
        df, text_col, id_col, tgt_ids, n_buckets, salt
    ).collect()
    return _dense_ratios(rows, n_buckets)


def dsir_score_expr(
    lam: list[float],
    text_col: str,
    id_col: str,
    salt: str = "dsir_v1",
    pick_salt: str = "dsir_pick",
) -> Column:
    """The Gumbel race key as ONE pure codegen expression over a
    frozen model: fold the row's unigram+bigram stream through the
    λ array literal (bucket = the same md5 hash, lookup =
    try_element_at — zero joins, zero shuffles), round the weight, add
    the md5-uniform Gumbel.  A pure function of (id, text): identical
    on replay, on any batching, and in the batch twin — which is what
    makes it safe inside a foreachBatch keep predicate.
    ``len(lam)`` IS the bucket count (freeze_dsir_ratios emits dense
    lists), so model and hash can't disagree about B."""
    n_buckets = len(lam)
    lam_arr = F.lit([float(x) for x in lam])

    def score_of(toks: Column) -> Column:
        # toks is a BOUND lambda variable here (see below) — the r11
        # shingle rule: referencing an inline split() from the bigram
        # lambda would re-tokenize per position, O(tokens²) per doc
        n = F.size(toks)
        bigrams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.aggregate(
            F.concat(toks, bigrams),
            F.lit(0.0),
            lambda acc, g: acc
            + F.coalesce(
                F.try_element_at(
                    lam_arr,
                    (
                        md5_long(F.concat(F.lit(salt + ":"), g)) % n_buckets
                    ).cast("int")
                    + 1,
                ),
                F.lit(0.0),
            ),
        )

    # The expression must stay self-contained (callers use it inside a
    # filter with no chance to pre-project), so bind the token array
    # once via a single-element-array transform: the outer lambda's
    # variable is evaluated exactly once per row.
    toks_inline = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    logw = F.element_at(F.transform(F.array(toks_inline), score_of), 1)
    u = uniform_from_id(F.col(id_col), pick_salt)
    return F.round(logw, 6) - F.log(-F.log(u))


def dsir_keep_expr(
    lam: list[float],
    threshold: float,
    text_col: str,
    id_col: str,
    salt: str = "dsir_v1",
    pick_salt: str = "dsir_pick",
) -> Column:
    """Streaming-shaped DSIR selection: keep iff the race key clears
    ``threshold``.  Where the batch stage takes top-k (a global
    operation no stream can run), an epoch freezes (model, threshold)
    — e.g. the rank-k key from the snapshot the model was fit on —
    and selection becomes this map-side predicate with the SAME
    acceptance law; the kept set is then independent of delivery
    batching and redelivery."""
    return dsir_score_expr(lam, text_col, id_col, salt, pick_salt) >= F.lit(
        float(threshold)
    )


def _dense_ratios(rows, n_buckets: int) -> list[float]:
    """Driver-side dense λ list from (b, cr, ct) rows — the shared
    math of freeze_dsir_ratios (one-shot) and DsirModelIndex
    (incremental): exact integer counts in, so two routes that agree
    on the counts agree on the list BIT-EXACTLY."""
    import math

    tr = float(sum(int(r["cr"]) for r in rows))
    tt = float(sum(int(r["ct"]) for r in rows))
    unseen = math.log(tr + n_buckets) - math.log(tt + n_buckets)
    out = [unseen] * n_buckets
    for r in rows:
        out[int(r["b"])] = math.log(
            (int(r["ct"]) + 1) / (tt + n_buckets)
        ) - math.log((int(r["cr"]) + 1) / (tr + n_buckets))
    return out


class DsirModelIndex:
    """INCREMENTAL DSIR bucket models — the fourth member of the
    AdditiveLedger family (after Count-Min, histogram, token counts):
    state is the (b, cr, ct) bucket table, which merges by ADDITION
    over any disjoint batch split of the corpus, so **incremental ==
    one-shot EXACTLY** and the frozen λ list derived from the ledger
    is bit-equal to ``freeze_dsir_ratios`` over the union
    (tests/test_importance.py pins both).

    This closes the streaming loop: epochs feed document batches via
    ``append_batch`` (exactly-once per stream epoch — the base
    protocol's marker claim), and the NEXT epoch freezes its
    ``(lam, threshold)`` from ``freeze_ratios()`` — an O(delta)
    model update instead of a full-corpus refit.  Each append costs
    one gram-grain pass over the BATCH with a ≤n_buckets-key
    aggregate; state on disk is ≤n_buckets rows per batch dir, folded
    by the ledger's superseding compaction."""

    _TABLE = "buckets"
    _SCHEMA = "b long, cr long, ct long"
    _KEYS = ("b",)
    _VALUES = ("cr", "ct")

    def __init__(self, spark, path, n_buckets: int = 512,
                 salt: str = "dsir_v1", backend=None):
        from cdc_demo_spark.operators.additive_ledger import AdditiveLedger
        from cdc_demo_spark.storage import DEFAULT_BACKEND

        class _Ledger(AdditiveLedger):
            _TABLE = DsirModelIndex._TABLE
            _SCHEMA = DsirModelIndex._SCHEMA
            _KEYS = DsirModelIndex._KEYS
            _VALUES = DsirModelIndex._VALUES

        self.n_buckets = int(n_buckets)
        self.salt = salt
        self._ledger = _Ledger(spark, path, backend or DEFAULT_BACKEND)
        self._ledger._freeze_meta({
            "kind": "dsir_model", "v": 1,
            "n_buckets": self.n_buckets, "salt": salt,
        })

    def append_batch(
        self,
        df: DataFrame,
        text_col: str,
        id_col: str,
        target_expr: Column | None = None,
        target_ids: DataFrame | None = None,
        batch_id: int | None = None,
    ) -> bool:
        """Admit one document batch's bucket counts (raw + target in
        one flagged gram pass).  Same exactly-once epoch contract as
        TokenCountIndex.append_batch; returns True iff THIS call
        committed."""
        if (target_expr is None) == (target_ids is None):
            raise ValueError(
                "DsirModelIndex.append_batch: pass exactly one of "
                "target_expr / target_ids"
            )
        if not self._ledger._accepts(batch_id):
            return False
        tgt = (
            df.filter(target_expr).select(id_col)
            if target_ids is None
            else target_ids.select(id_col)
        )
        state = _bucket_models(df, text_col, id_col, tgt, self.n_buckets, self.salt)
        return self._ledger._append_state(state, batch_id)

    def models(self) -> DataFrame:
        """The merged (b, cr, ct) table — exactly the one-shot
        _bucket_models over the union of admitted batches."""
        return self._ledger.state()

    def freeze_ratios(self) -> list[float]:
        """The dense λ list from the CURRENT ledger state — what the
        next epoch ships into dsir_score_expr / dsir_keep_expr."""
        return _dense_ratios(self.models().collect(), self.n_buckets)

    def compact(self):
        """Fold committed batch dirs into one superseding checkpoint
        (the base ledger's covered-set compaction)."""
        return self._ledger.compact()
