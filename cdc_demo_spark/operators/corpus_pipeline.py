"""End-to-end corpus construction as ONE composed operator (VERDICT
r12 #1): the chain a 100 TB pretraining-data run executes —

    quality filter  ->  exact dedup  ->  MinHash-LSH near-dup dedup
      ->  duplicated-span removal  ->  leakage-safe train/val/test
      split  ->  chunk + pack into training blocks  ->  shards

Every stage is an individually oracle/pytest-verified operator from
this package (queries/textops.q_quality_filter's Gopher rule shape,
operators/dedup.exact_dedup + minhash_near_duplicates,
operators/spans.remove_duplicated_spans, queries/dedup.
q_leakage_safe_split's cluster-grain md5 split, operators/chunking +
packing); what was never measured before this module is the
COMPOSITION — whether the component pass feeds both dedup and split
without a second edge build, whether the span stage reads pinned
survivors instead of recomputing the LSH chain, and what the composed
plan's shuffle inventory is.  See SCALE.md "Composite corpus
pipeline" for the plan-shape audit and bench.py's corpus_e2e_200k for
the measured wall number.

Cross-stage invariants (pinned by tests/test_corpus_pipeline.py and
asserted cheaply in the bench gate):

- split safety: BOTH ends of every verified near-dup pair get the
  same split (split is a pure function of the pair's shared
  connected component), so no eval doc has a training near-copy;
- conservation: sum(total_tokens) over packed blocks == sum of
  post-span-removal token counts over surviving docs (the default
  stride == chunk_tokens makes chunking a partition of each doc's
  token sequence, so packing must conserve tokens exactly);
- provenance: every block's doc_ids ⊆ the surviving doc set of its
  own split.

Scale shape: one quality projection (zero shuffle), one digest
shuffle (exact dedup), the banded-LSH stack (O(tokens) shingling,
never all-pairs), star-contraction component rounds on the slim pair
list, the span stack's two gram shuffles, then chunk (zero shuffle)
and one applyInPandas per (split, shard) pack group.  Nothing
collects to the driver but the ledger's per-stage scalar aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_demo_spark.operators.chunking import chunk_documents
from cdc_demo_spark.operators.dedup import exact_dedup, minhash_near_duplicates
from cdc_demo_spark.operators.graph import connected_components_star
from cdc_demo_spark.operators.packing import pack_chunks
from cdc_demo_spark.operators.sketches import md5_long
from cdc_demo_spark.operators.spans import remove_duplicated_spans

#: default Gopher-style rule band (queries/textops.q_quality_filter's
#: shape, thresholds are corpus-specific by design — these match the
#: sf documents table; bench passes a band fitted to its synthetic
#: vocabulary)
DEFAULT_RULES = {
    "min_tokens": 25,
    "mean_token_len": (4.0, 5.0),
    "min_distinct_ratio": 0.35,
}


def quality_keep_expr(text_col: str, rules: dict) -> F.Column:
    """The q_quality_filter keep-verdict as a reusable predicate:
    token count, mean token length band, distinct-token ratio — plus,
    when the rules carry a ``blocklist`` (list of terms) with
    ``max_blocked_frac``, the q_blocklist_filter wordlist rule: a doc
    survives only while its blocklisted-token fraction stays at or
    under the cap (r16; the list folds as a plan literal, so the
    whole verdict stays ONE pure map-side expression and the
    streaming twin inherits it unchanged)."""
    toks = F.split(text_col, " ")
    n_tokens = F.size(toks).cast("long")
    lo, hi = rules["mean_token_len"]
    mtl = (F.length(text_col) - n_tokens + 1).cast("double") / n_tokens
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    keep = (
        (n_tokens >= int(rules["min_tokens"]))
        & (mtl >= float(lo))
        & (mtl <= float(hi))
        & (dr >= float(rules["min_distinct_ratio"]))
    )
    if rules.get("blocklist"):
        bl = F.lit([str(t) for t in rules["blocklist"]])
        n_blocked = F.size(
            F.filter(toks, lambda w: F.array_contains(bl, w))
        )
        keep = keep & (
            n_blocked.cast("double") / n_tokens
            <= float(rules.get("max_blocked_frac", 0.0))
        )
    return keep


def split_expr(component: F.Column) -> F.Column:
    """The house md5 split scheme: 80/10/10 as a pure function of the
    near-dup CLUSTER id.  This is THE split predicate — the
    oracle-backed q_leakage_safe_split (queries/dedup.py) and the
    composed pipeline both call it (one copy, r13 review finding #7)."""
    h = md5_long(component.cast("string")) % 100
    return F.when(h < 80, "train").when(h < 90, "val").otherwise("test")


def temperature_thresholds(
    counts: list[tuple[str, int]], alpha: float, target_frac: float
) -> dict[str, str]:
    """ONE copy of the temperature-mixture threshold derivation (the
    q_mixture_temperature scheme): per-stratum weight floor(n^alpha),
    keep-rate min(1, target·w_s/(Σw·n_s)), md5 threshold = the rate
    2^32-scaled in INTEGER arithmetic, keep-all as the 'g' sentinel
    (> every hex key, so a maximal md5 can't be dropped).  Shared by
    build_corpus' 4b stage and by streaming callers that FREEZE an
    epoch's thresholds for corpus_stream_sink."""
    import math

    weights = {s: int(math.floor(n ** alpha)) for s, n in counts}
    n_total = sum(n for _, n in counts)
    s_total = max(sum(weights.values()), 1)
    n_target = int(n_total * target_frac)
    out = {}
    for s, n in counts:
        t = min(1 << 32, (n_target * weights[s] * (1 << 32)) // (s_total * n))
        out[s] = "g" if t >= (1 << 32) else format(t, "08x")
    return out


def mixture_keep_expr(
    stratum_col: str,
    thresholds: dict[str, str],
    id_col: str = "doc_id",
    salt: str = "mix-corpus:",
) -> F.Column:
    """The mixture keep predicate as ONE reusable expression: a doc
    survives iff md5(salt:id)[:8] < its stratum's threshold.  A
    stratum ABSENT from ``thresholds`` drops (NULL threshold → NULL
    comparison → filtered): for frozen-threshold streaming that means
    a brand-new stratum appearing mid-epoch contributes nothing until
    the next epoch's thresholds include it — the honest behavior, and
    loud in the ledgers rather than silently keep-all."""
    key = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    thr = F.lit(None).cast("string")
    for s in sorted(thresholds):
        thr = F.when(F.col(stratum_col) == s, thresholds[s]).otherwise(thr)
    return key < thr


def _docs_tokens(df: DataFrame, text_col: str) -> tuple[int, int]:
    """(docs, tokens) census by re-tokenizing ``text_col`` — the
    reference census expression.  build_corpus now carries the value
    as a __ntok column instead of re-running this per stage (r16
    optimization round); kept for callers with no carried column."""
    row = df.agg(
        F.count(F.lit(1)).alias("d"),
        F.coalesce(F.sum(F.size(F.split(text_col, " "))), F.lit(0)).alias("t"),
    ).collect()[0]
    return int(row["d"]), int(row["t"])


def build_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rules: dict | None = None,
    minhash_threshold: float = 0.5,
    survivor: str = "min_id",
    span_n: int = 5,
    # "auto" since r13: the sampled skew probe is ~free and the
    # composed pipeline is exactly the 100 TB caller the self-routing
    # plan exists for (SCALE.md r13 section)
    span_plan: str = "auto",
    span_hashed: bool = False,
    chunk_tokens: int = 64,
    stride: int | None = None,
    block_tokens: int = 256,
    pack_strategy: str = "greedy",
    emit_segments: bool = False,
    mixture_alpha: float | None = None,
    mixture_stratum: str = "lang",
    mixture_target_frac: float = 0.5,
    dsir_target: F.Column | None = None,
    dsir_keep_frac: float = 0.5,
    dsir_buckets: int = 4096,
    n_shards: int = 16,
    shard_salt: str = "epoch0",
    normalize_whitespace: bool = False,
    bpe_merges: int | list[tuple[str, str]] | None = None,
) -> dict:
    """Run the full construction chain; returns a dict with the final
    ``blocks`` DataFrame, the intermediate DataFrames the invariant
    tests need (``pairs``, ``splits``, ``final_docs``), and a
    ``ledger`` of per-stage (docs, tokens) counts — the artifact a
    production run files next to the shards.

    ``stride`` defaults to ``chunk_tokens`` (non-overlapping windows)
    so chunking partitions each doc's tokens and the conservation
    invariant holds exactly; pass a smaller stride for overlapping
    training windows (the ledger then reports packed > surviving).

    ``dsir_target`` (late r15): a predicate over the RAW input frame
    naming the target domain; when set, stage 4c keeps the
    ``dsir_keep_frac`` of surviving docs drawn without replacement
    ∝ exp(DSIR importance weight) toward that domain
    (operators/importance.py; composes after the mixture stage, and
    every downstream census sees the selected corpus).

    ``bpe_merges`` (r13 VERDICT #1 — the last mile to a model-ready
    deliverable): an int trains that many BPE merges ON the surviving
    corpus (train_bpe — the realistic order: the tokenizer sees the
    data the model will), a merge list reuses a shipped vocabulary,
    None (default) skips the stage.  When set, the result carries
    ``tokens`` — one row per training chunk
    (doc_id, chunk_id, split, n_tokens, n_words, n_bpe_tokens,
    token_ids array<int>) via the vocabulary-grain encoder
    (operators/bpe.encode_corpus_ids) — and the ledger gains a
    ``tokens`` stage whose slot census must equal the packed ledger's
    token total exactly (every packed word slot is accounted for by
    exactly one encoded chunk row; asserted by
    assert_corpus_invariants).

    Every stage is pinned (eager localCheckpoint) before reuse: the
    component pass feeds BOTH survivor selection and the split map,
    the quality output feeds both dedup stages, and the ledger's
    counts read pinned results instead of re-executing upstream
    lineage (the r10 span-stage finding, applied uniformly)."""
    import time as _time

    rules = dict(DEFAULT_RULES if rules is None else rules)
    if stride is None:
        stride = chunk_tokens
    # The pack stage's applyInPandas schema requires an integral id
    # named doc_id (operators/packing.OUT_SCHEMA) — normalize the
    # caller's id up front so a mismatch fails HERE, not after the
    # expensive dedup stages (r13 review finding #2).
    if id_col != "doc_id":
        if "doc_id" in docs.columns:
            # renaming would leave TWO doc_id columns; dict(dtypes)
            # keeps the last and the failure surfaces as an
            # ambiguous-column error deep in the stages this early
            # check exists to protect (r13 ADVICE)
            raise ValueError(
                f"build_corpus: input already has a 'doc_id' column distinct "
                f"from id_col={id_col!r}; drop or rename it first"
            )
        docs = docs.withColumnRenamed(id_col, "doc_id")
        id_col = "doc_id"
    dtype = dict(docs.dtypes).get("doc_id")
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"build_corpus requires an integral id column (pack stage packs "
            f"doc_ids as array<long>); got {id_col}:{dtype}"
        )
    # Optional whitespace normalization.  NOT needed for the
    # invariants since r13: every stage (quality, spans, chunking,
    # ledger censuses) tokenizes on the same literal space (review
    # finding #1 — chunking's \s+ split used to disagree on
    # consecutive/non-space whitespace and falsify token
    # conservation).  Turn on for corpora where runs of whitespace
    # should not become empty tokens in chunk text.
    if normalize_whitespace:
        docs = docs.withColumn(
            text_col, F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
        )
    ledger: dict[str, dict] = {}
    t_mark = _time.perf_counter()

    def _stage_secs() -> float:
        nonlocal t_mark
        now = _time.perf_counter()
        dt, t_mark = now - t_mark, now
        return round(dt, 3)

    # Token census carried as a column (r16 optimization round): the
    # per-stage (docs, tokens) ledger used to re-split the TEXT of the
    # whole checkpointed frame at every stage boundary — 4+ full
    # tokenize passes per run for numbers that don't change while the
    # text doesn't.  __ntok = size(split(text)) is computed ONCE on the
    # input (the exact census expression _docs_tokens used), rides the
    # stage checkpoints (one long per row), and each census is a plain
    # sum.  After span removal the cleaned token count is derived from
    # the removal's own (n_tokens - n_removed) — equal by construction
    # to size(split(clean_text)) for every surviving doc (the rebuild
    # joins kept tokens with single spaces and keeps empty tokens), the
    # identity the conservation invariant already rests on.
    if "__ntok" in docs.columns:
        raise ValueError(
            "build_corpus: input must not carry a '__ntok' column "
            "(internal census name); drop or rename it first"
        )
    docs = docs.withColumn(
        "__ntok", F.size(F.split(F.col(text_col), " ")).cast("long")
    )

    def _census(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("d"),
            F.coalesce(F.sum("__ntok"), F.lit(0)).alias("t"),
        ).collect()[0]
        return int(row["d"]), int(row["t"])

    d, t = _census(docs)
    ledger["input"] = {"docs": d, "tokens": t, "secs": _stage_secs()}

    # 1. quality gate — pure codegen projection, zero shuffle
    quality = docs.filter(quality_keep_expr(text_col, rules)).localCheckpoint(
        eager=True
    )
    d, t = _census(quality)
    ledger["quality"] = {"docs": d, "tokens": t, "secs": _stage_secs()}

    # 2. exact dedup — md5-digest shuffle (16-byte keys, never text)
    exact = exact_dedup(quality, [text_col], id_col).localCheckpoint(eager=True)
    d, t = _census(exact)
    ledger["exact_dedup"] = {"docs": d, "tokens": t, "secs": _stage_secs()}

    # 3. near-dup pairs (banded LSH, exact-Jaccard verified) ->
    #    connected components.  ONE component pass serves both the
    #    survivor choice and the split map.
    pairs = minhash_near_duplicates(
        exact, id_col, text_col, threshold=minhash_threshold
    ).localCheckpoint(eager=True)
    comps = connected_components_star(
        exact.select(id_col), pairs, id_col=id_col
    ).localCheckpoint(eager=True)
    splits = comps.select(
        id_col,
        F.col("component").alias("cluster_id"),
        split_expr(F.col("component")).alias("split"),
    )
    if survivor == "min_id":
        surv_ids = comps.filter(F.col(id_col) == F.col("component")).select(id_col)
    elif survivor == "longest":
        # quality-aware curation (the q_dedup_keep_best policy): keep
        # the LONGEST doc per cluster, id as the deterministic
        # tiebreak — one windowed rank over cluster-joined lengths
        # (partitions are cluster-sized: tiny)
        from pyspark.sql.window import Window

        w = Window.partitionBy("component").orderBy(
            F.desc(F.length(text_col)), F.asc(id_col)
        )
        surv_ids = (
            exact.select(id_col, text_col)
            .join(comps, id_col)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(id_col)
        )
    else:
        raise ValueError(
            f"unknown survivor {survivor!r}; expected 'min_id' or 'longest'"
        )
    survivors = exact.join(surv_ids, id_col, "left_semi").localCheckpoint(eager=True)
    d, t = _census(survivors)
    ledger["neardup_dedup"] = {"docs": d, "tokens": t, "secs": _stage_secs()}

    # 4. duplicated-span removal (keep-one) — docs emptied by the cut
    #    drop out; the rest carry their cleaned text forward
    cleaned = remove_duplicated_spans(
        survivors, id_col, text_col, n=span_n, plan=span_plan,
        hashed=span_hashed,
    ).localCheckpoint(eager=True)
    spans_cut = int(
        cleaned.agg(F.coalesce(F.sum("n_removed"), F.lit(0))).collect()[0][0]
    )
    final_docs = (
        cleaned.filter(F.length("clean_text") > 0)
        .select(
            F.col("id").alias(id_col),
            F.col("clean_text").alias(text_col),
            # == size(split(clean_text)) for every surviving doc (see
            # the __ntok note above) — no re-tokenize pass needed
            (F.col("n_tokens") - F.col("n_removed")).cast("long").alias("__ntok"),
        )
        .join(splits.select(id_col, "split"), id_col)
        .localCheckpoint(eager=True)
    )
    d, t = _census(final_docs)
    ledger["span_removal"] = {
        "docs": d, "tokens": t, "tokens_cut": spans_cut, "secs": _stage_secs()
    }

    # 4b. optional temperature mixture (r15): rebalance strata (lang
    #    by default) with keep-rates ∝ count^alpha before anything is
    #    chunked — the multilingual-balancing stage real pipelines run.
    #    Same scheme as the oracle-exact q_mixture_temperature: one
    #    bounded stratum-count collect, thresholds derived driver-side
    #    (integer 2^32-scaled; the alpha power is a driver-side Python
    #    literal — cross-engine exactness lives in the registered
    #    query twins), applied as a map-side md5 CASE.  Every
    #    downstream census (split/pack/tokens — the tokenizer too)
    #    sees the MIXED corpus.
    if mixture_alpha is not None:
        if mixture_stratum not in docs.columns:
            raise ValueError(
                f"mixture_stratum {mixture_stratum!r} not in input columns "
                f"{docs.columns}; pass mixture_stratum= or add the column"
            )
        strata = final_docs.join(
            docs.select(id_col, mixture_stratum), id_col
        )
        counts = sorted(
            (r[mixture_stratum], r["n"])
            for r in strata.groupBy(mixture_stratum)
            .agg(F.count(F.lit(1)).alias("n")).collect()
        )
        thr = temperature_thresholds(counts, mixture_alpha, mixture_target_frac)
        final_docs = (
            strata.filter(mixture_keep_expr(mixture_stratum, thr, id_col))
            .select(id_col, text_col, "split", "__ntok")
            .localCheckpoint(eager=True)
        )
        d, t = _census(final_docs)
        ledger["mixture"] = {
            "docs": d, "tokens": t, "alpha": mixture_alpha,
            "target_frac": mixture_target_frac, "secs": _stage_secs(),
        }

    # 4c. optional DSIR selection (late r15): keep the dsir_keep_frac
    #    of surviving docs that look most like the TARGET domain
    #    (operators/importance.py — Xie et al. NeurIPS 2023), drawn
    #    without replacement ∝ exp(importance weight) via the
    #    deterministic Gumbel-max race.  The ratio model fits on the
    #    CLEANED text (the bytes the tokenizer will see); target
    #    membership is a predicate over the RAW input frame (metadata
    #    like lang/source survives there even when the pipeline
    #    dropped the column), joined by id.  Where the mixture stage
    #    rebalances by a NAMED stratum column, this stage rebalances
    #    by distributional similarity — the two compose (mixture
    #    first, then DSIR sees the mixed corpus).
    if dsir_target is not None:
        from cdc_demo_spark.operators.importance import dsir_logweights
        from cdc_demo_spark.operators.sampling import uniform_from_id

        if not (0.0 < dsir_keep_frac <= 1.0):
            raise ValueError(
                f"dsir_keep_frac must be in (0, 1]; got {dsir_keep_frac}"
            )
        n_before = int(final_docs.count())
        k = max(1, int(n_before * dsir_keep_frac))
        target_ids = docs.filter(dsir_target).select(id_col)
        lw = dsir_logweights(
            final_docs, text_col, id_col,
            n_buckets=dsir_buckets, target_ids=target_ids,
        )
        key = F.round(F.col("logweight_raw"), 6) - F.log(
            -F.log(uniform_from_id(F.col(id_col), "dsir_pick"))
        )
        final_docs = (
            final_docs.join(lw, id_col)
            .orderBy(F.desc(key), F.asc(id_col))
            .limit(k)
            .select(id_col, text_col, "split", "__ntok")
            .localCheckpoint(eager=True)
        )
        d, t = _census(final_docs)
        ledger["dsir"] = {
            "docs": d, "tokens": t, "keep_frac": dsir_keep_frac,
            "buckets": dsir_buckets, "secs": _stage_secs(),
        }

    # 5. ledger the split census at doc grain (the split map itself is
    #    cluster-grain and covers every deduped doc)
    ledger["split"] = {
        r["split"]: r["n"]
        for r in final_docs.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 6-7. chunk (zero shuffle) -> pack per (split, shard) group.
    #    Shard = md5(salt|doc_id) — deterministic, engine-portable,
    #    epoch re-salt = reshuffle; the (split, shard) group key keeps
    #    blocks split-pure by construction.
    shard = md5_long(
        F.concat_ws("|", F.lit(shard_salt), F.col(id_col))
    ) % int(n_shards)
    # pack_chunks only reads (doc_id, chunk_id, n_tokens, group) — drop
    # chunk_text BEFORE the (split, shard) groupBy so the pipeline's
    # largest shuffle moves slim count rows, not the corpus text
    # (r13 review finding #6); with_text=False also skips BUILDING the
    # chunk strings (Catalyst can't prune struct fields inside the
    # Generate's lambda — r16 optimization round)
    chunks = chunk_documents(
        final_docs, id_col=id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, stride=stride, with_text=False,
    ).join(
        final_docs.select(
            id_col, F.format_string("%s/%02d", F.col("split"), shard).alias("group")
        ),
        id_col,
    ).select(id_col, "chunk_id", "n_tokens", "group")
    # emit_segments (r15): thread the per-block segment layout through
    # so the blocks frame carries what a trainer needs for
    # block-diagonal attention — same fold, extra array columns only
    seg_cols = (
        ["seg_doc_ids", "seg_chunk_ids", "seg_tokens", "seg_offsets"]
        if emit_segments
        else []
    )
    blocks = pack_chunks(
        chunks, "group", block_tokens=block_tokens, strategy=pack_strategy,
        emit_segments=emit_segments,
    ).select(
        F.split_part("group", F.lit("/"), F.lit(1)).alias("split"),
        F.split_part("group", F.lit("/"), F.lit(2)).cast("int").alias("shard"),
        "group",
        "block_id",
        "n_chunks",
        "total_tokens",
        "doc_ids",
        *seg_cols,
    ).localCheckpoint(eager=True)
    pack_row = blocks.agg(
        F.count(F.lit(1)).alias("b"),
        F.coalesce(F.sum("total_tokens"), F.lit(0)).alias("t"),
    ).collect()[0]
    ledger["pack"] = {
        "blocks": int(pack_row["b"]),
        "tokens": int(pack_row["t"]),
        # fill rate of the block budget: packed tokens / (blocks ×
        # block_tokens) — the padding-waste metric a trainer cares
        # about; strategy="nfd" exists to push it up
        "efficiency": round(
            int(pack_row["t"]) / (max(int(pack_row["b"]), 1) * block_tokens), 4
        ),
        "strategy": pack_strategy,
        "secs": _stage_secs(),
    }

    # 8. optional model-ready token ids (r13 VERDICT #1): train (or
    #    reuse) a BPE vocabulary, encode the surviving corpus at
    #    VOCABULARY grain (merge folds once per distinct word, never
    #    per occurrence), and slice each document's per-word id arrays
    #    on the SAME chunk boundaries the pack stage used (shared
    #    chunk_starts formula; equality with chunk-then-encode pinned
    #    in tests/test_bpe.py).  Chunk text is never materialized —
    #    the corpus is touched once at doc grain (the chunk-grain
    #    first cut re-derived chunk text for each of the encoder's
    #    scans and regrouped per CHUNK; 41.2 s -> see SCALE.md r14).
    tokens_df = None
    merges: list[tuple[str, str]] | None = None
    if bpe_merges is not None:
        from cdc_demo_spark.operators.bpe import (
            encode_chunked_corpus_ids,
            train_bpe,
            word_frequencies,
        )

        # ONE (word, freq) aggregate feeds BOTH the trainer and the
        # encoder's vocabulary (r16 optimization round): train_bpe and
        # encode_chunked_corpus_ids each derived their own
        # corpus-explode→distinct — the same table, scanned twice.
        wf = word_frequencies(final_docs, text_col).localCheckpoint(eager=True)
        if isinstance(bpe_merges, int):
            # the realistic order: the tokenizer trains on the same
            # surviving corpus the model will see; collect is bounded
            # (n_merges rows — the artifact a tokenizer ships)
            merges = [
                (r["lhs"], r["rhs"])
                for r in train_bpe(
                    final_docs, text_col, n_merges=bpe_merges, word_freqs=wf
                ).collect()
            ]
        else:
            merges = [(str(a), str(b)) for a, b in bpe_merges]
        tokens_df = (
            encode_chunked_corpus_ids(
                final_docs, text_col, merges, id_col,
                chunk_tokens=chunk_tokens, stride=stride,
                vocab=wf.select("word"),
            )
            .join(final_docs.select(id_col, "split"), id_col)
            .localCheckpoint(eager=True)
        )
        trow = tokens_df.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("slots"),
            F.coalesce(F.sum("n_words"), F.lit(0)).alias("w"),
            F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).alias("b"),
        ).collect()[0]
        ledger["tokens"] = {
            "chunks": int(trow["c"]),
            "slots": int(trow["slots"]),
            "words": int(trow["w"]),
            "bpe_tokens": int(trow["b"]),
            "n_merges": len(merges),
            "secs": _stage_secs(),
        }

    return {
        "blocks": blocks,
        "pairs": pairs,
        "splits": splits,
        # public frame keeps its documented shape; __ntok is an
        # internal census column (reads the pinned frame, no recompute)
        "final_docs": final_docs.select(id_col, text_col, "split"),
        "tokens": tokens_df,
        "bpe_merges": merges,
        "ledger": ledger,
    }


def assert_corpus_invariants(result: dict, id_col: str = "doc_id") -> None:
    """The cross-stage invariants (cheap: slim-column joins + scalar
    aggregates).  Raises AssertionError with the offending census."""
    pairs, splits = result["pairs"], result["splits"]
    final_docs, ledger = result["final_docs"], result["ledger"]
    blocks = result["blocks"]

    # split safety: both ends of every near-dup pair share a split
    sp = splits.select(F.col(id_col), "split")
    straddle = (
        pairs.join(sp.withColumnsRenamed({id_col: "id_a", "split": "sa"}), "id_a")
        .join(sp.withColumnsRenamed({id_col: "id_b", "split": "sb"}), "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0, f"{straddle} near-dup pairs straddle splits"

    # conservation: packed tokens == surviving tokens (the LAST
    # doc-grain stage that ran — dsir supersedes mixture supersedes
    # span_removal as "surviving")
    packed = ledger["pack"]["tokens"]
    surviving = ledger.get(
        "dsir", ledger.get("mixture", ledger["span_removal"])
    )["tokens"]
    assert packed == surviving, f"packed {packed} != surviving {surviving}"

    # provenance: every block's doc_ids belong to its own split
    exploded = blocks.select("split", F.explode("doc_ids").alias(id_col))
    foreign = exploded.join(
        final_docs.select(id_col, F.col("split").alias("doc_split")), id_col
    ).filter(F.col("split") != F.col("doc_split")).count()
    assert foreign == 0, f"{foreign} block-doc split mismatches"
    orphan = exploded.join(final_docs.select(id_col), id_col, "left_anti").count()
    assert orphan == 0, f"{orphan} packed doc_ids not in final doc set"

    # ledger monotonicity: docs never increase through the funnel
    stages = ["input", "quality", "exact_dedup", "neardup_dedup", "span_removal"]
    if "mixture" in ledger:
        stages.append("mixture")
    if "dsir" in ledger:
        stages.append("dsir")
    seq = [ledger[k]["docs"] for k in stages]
    assert all(a >= b for a, b in zip(seq, seq[1:])), f"funnel grew: {seq}"

    # token-id stage (when run): every packed word slot is accounted
    # for by exactly one encoded chunk row — slot census == packed
    # census, chunk census == the blocks' own chunk census — and the
    # encode direction is sane (each non-empty word emits >= 1 subword)
    if result.get("tokens") is not None:
        tl = ledger["tokens"]
        assert tl["slots"] == ledger["pack"]["tokens"], (
            f"encoded slots {tl['slots']} != packed {ledger['pack']['tokens']}"
        )
        packed_chunks = int(
            blocks.agg(F.coalesce(F.sum("n_chunks"), F.lit(0))).collect()[0][0]
        )
        assert tl["chunks"] == packed_chunks, (
            f"encoded chunks {tl['chunks']} != packed chunks {packed_chunks}"
        )
        assert tl["words"] <= tl["slots"], f"{tl['words']} words > {tl['slots']} slots"
        assert tl["bpe_tokens"] >= tl["words"], (
            f"bpe tokens {tl['bpe_tokens']} < words {tl['words']}"
        )


def corpus_stream_sink(
    minhash_index,
    token_index,
    rules: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    mixture_thresholds: dict[str, str] | None = None,
    mixture_stratum: str = "lang",
    dsir_model: tuple[list[float], float] | None = None,
):
    """foreachBatch adapter for the corpus pipeline's INCREMENTAL
    stages (r13 VERDICT #8): each streaming epoch applies the SAME
    quality predicate the batch composite runs (quality_keep_expr —
    one copy, the r13 rule), then feeds the near-dup index
    (operators/incremental_dedup.MinHashIndex, verified pairs
    persisted) and the vocabulary ledger
    (operators/incremental_tokens.TokenCountIndex) under the SAME
    epoch id.  Both ledgers key their commits on the streaming batch
    id, so at-least-once redelivery is skipped per ledger; a crash
    BETWEEN the two appends converges on replay (the committed ledger
    skips, the uncommitted one admits) — each ledger is individually
    exactly-once and the pair needs no cross-ledger transaction.

    The batch twin is build_corpus' quality + near-dup stages plus a
    word count over the survivors; equality pinned by
    tests/test_corpus_pipeline.py::test_streaming_twin_equals_batch_composite.

    ``mixture_thresholds`` (r15): FROZEN temperature-mixture keep
    thresholds (derive once per epoch via ``temperature_thresholds``
    over a counts snapshot) applied as part of the same per-batch keep
    predicate — the streaming form of build_corpus' 4b stage.  Rates
    must be frozen because a per-micro-batch derivation would make a
    doc's survival depend on which batch delivered it (breaking
    replay determinism); the keep is then a pure function of
    (id, stratum), so at-least-once redelivery and wave boundaries
    cannot change the kept set.  A stratum absent from the dict drops
    (see mixture_keep_expr).  Streaming == batch with the same frozen
    thresholds is pinned in tests.

    ``dsir_model`` (late r15): a FROZEN ``(lam, threshold)`` pair —
    ``lam`` the dense per-bucket log-ratio list from
    ``operators/importance.freeze_dsir_ratios`` (derived once per
    epoch from a corpus snapshot), ``threshold`` the race-key cutoff
    standing in for the batch stage's top-k (which no stream can run).
    The keep becomes ``dsir_keep_expr``: the whole score folds through
    a λ array literal per row — zero joins, a pure function of
    (id, text) — so batching and redelivery cannot change the kept
    set.  Same freeze rationale as the mixture thresholds; streaming
    == batch with the same frozen pair is pinned in tests.
    """
    rules = dict(DEFAULT_RULES if rules is None else rules)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the quality predicate (split + distinct-ratio over
        # every doc) feeds BOTH ledgers — without the pin it would
        # re-run per append (r14 review finding); unpersist in finally
        # so epochs never accumulate storage
        keep = quality_keep_expr(text_col, rules)
        if mixture_thresholds is not None:
            keep = keep & mixture_keep_expr(
                mixture_stratum, mixture_thresholds, id_col
            )
        if dsir_model is not None:
            from cdc_demo_spark.operators.importance import dsir_keep_expr

            lam, threshold = dsir_model
            keep = keep & dsir_keep_expr(lam, threshold, text_col, id_col)
        kept = batch_df.filter(keep).persist()
        try:
            minhash_index.append_batch(
                kept, id_col, text_col, batch_id=int(batch_id), persist_pairs=True
            )
            token_index.append_batch(
                kept.select(
                    F.explode(
                        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
                    ).alias("token")
                ),
                "token",
                batch_id=int(batch_id),
            )
        finally:
            kept.unpersist()

    return process


def write_token_shards(
    tokens: DataFrame,
    path: str,
    n_shards: int = 16,
    shard_salt: str = "epoch0",
    id_col: str = "doc_id",
) -> dict:
    """Lay the token-stage output down as the files a trainer reads —
    the last hop from ledger to bytes-on-disk.  One parquet file per
    (split, shard) directory under ``path`` (layout
    ``split=train/shard=3/part-*.parquet``), rows ordered by
    (doc_id, chunk_id) inside each file, plus a ``_manifest.json``
    recording per-shard (chunks, words, bpe_tokens) censuses — the
    artifact a training job checks before it maps the bytes.

    The shard key is md5(salt|doc_id) % n_shards — the SAME
    deterministic function the pack stage groups by, so a block's docs
    and its token rows agree on shard membership; re-salting is a full
    reshuffle for the next epoch without touching upstream state.

    Scale shape: ONE hash shuffle on exactly (split, shard) — every
    group lands wholly in one task, so each directory holds exactly
    one file and the write parallelism is the live (split, shard)
    count; the manifest is a grouped aggregate (3 × n_shards rows to
    the driver, never row data).  Returns the manifest dict."""
    import json as _json
    import os as _os

    shard = (md5_long(F.concat_ws("|", F.lit(shard_salt), F.col(id_col)))
             % int(n_shards)).cast("int")
    laid = (
        tokens.withColumn("shard", shard)
        .repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions(id_col, "chunk_id")
    )
    laid.write.mode("error").partitionBy("split", "shard").parquet(path)
    rows = (
        tokens.withColumn("shard", shard)
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.sum("n_words").alias("words"),
            F.sum("n_bpe_tokens").alias("bpe_tokens"),
        )
        .collect()
    )
    manifest = {
        "n_shards": int(n_shards),
        "shard_salt": shard_salt,
        "shards": {
            f"{r['split']}/{int(r['shard']):02d}": {
                "chunks": int(r["chunks"]),
                "words": int(r["words"]),
                "bpe_tokens": int(r["bpe_tokens"]),
            }
            for r in rows
        },
    }
    with open(_os.path.join(path, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, sort_keys=True, indent=1)
    return manifest


def write_block_index(blocks: DataFrame, path: str) -> dict:
    """Persist the PACKED-BLOCK COMPOSITION next to the token shards —
    the artifact that lets a trainer assemble fixed-budget batches
    without re-packing: per (split, shard), the block rows with their
    full segment layouts (seg_doc_ids/seg_chunk_ids/seg_tokens/
    seg_offsets — requires build_corpus(emit_segments=True)).  Lands
    under ``path``/_blocks — the underscore prefix keeps the index
    invisible to parquet readers of the token rows themselves — with
    the same one-file-per-dir guarantee as the writer, and extends the
    manifest with per-shard {blocks, chunks} censuses, CHECKED against
    the token shards' own chunk censuses at write time (a block index
    that disagrees with the rows it indexes must fail here, not in a
    training run).  Blocks are DERIVED data: ``erase_docs_from_token_
    shards`` drops the touched shards' index dirs (block composition
    cannot be locally patched — re-pack regenerates); appends leave
    existing blocks valid (new chunks are simply unpacked until the
    next pack)."""
    import json as _json
    import os as _os

    for c in ("seg_doc_ids", "seg_chunk_ids", "seg_tokens", "seg_offsets"):
        if c not in blocks.columns:
            raise ValueError(
                f"write_block_index needs segment columns (missing {c!r}); "
                "run build_corpus/pack_chunks with emit_segments=True"
            )
    import shutil as _shutil

    mpath = _os.path.join(path, "_manifest.json")
    with open(mpath) as f:
        manifest = _json.load(f)
    idx_root = _os.path.join(path, "_blocks")
    if _os.path.exists(idx_root):
        raise ValueError(
            f"write_block_index: {idx_root} already exists — erase or "
            "re-pack before writing a new index"
        )
    # VALIDATE FIRST (the aggregate needs no written files): a block
    # index that disagrees with the rows it indexes must fail BEFORE
    # anything lands on disk, so a corrected re-run never trips over
    # an orphaned _blocks dir from the failed attempt.
    rows = (
        blocks.groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("blocks"),
            F.coalesce(F.sum("n_chunks"), F.lit(0)).alias("chunks"),
        )
        .collect()
    )
    index = {}
    for r in rows:
        key = f"{r['split']}/{int(r['shard']):02d}"
        want = manifest["shards"].get(key, {}).get("chunks")
        if want != int(r["chunks"]):
            raise ValueError(
                f"block index disagrees with token shards at {key}: index "
                f"covers {int(r['chunks'])} chunks, shard holds {want}"
            )
        index[key] = {"blocks": int(r["blocks"]), "chunks": int(r["chunks"])}
    laid = (
        blocks.select(
            "split", "shard", "block_id", "n_chunks", "total_tokens",
            "seg_doc_ids", "seg_chunk_ids", "seg_tokens", "seg_offsets",
        )
        .repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("block_id")
    )
    # stage + single-rename swap: a crash mid-write leaves only the
    # hidden staging dir (invisible to readers, removable on retry),
    # never a half-written _blocks
    staging = _os.path.join(path, "_blocks_staging")
    _shutil.rmtree(staging, ignore_errors=True)
    laid.write.mode("error").partitionBy("split", "shard").parquet(staging)
    _os.rename(staging, idx_root)
    manifest["blocks"] = index
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(manifest, f, sort_keys=True, indent=1)
    _os.replace(tmp, mpath)
    return index


def read_block_index(spark, path: str, split: str | None = None,
                     shards: list[int] | None = None) -> DataFrame:
    """Read the block index back, with the same partition-level
    split/shard pruning as read_token_shards."""
    df = spark.read.parquet(_bi_root(path))
    if split is not None:
        df = df.filter(F.col("split") == split)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def _bi_root(path: str):
    import os as _os

    return _os.path.join(path, "_blocks")


def assemble_training_blocks(
    spark, path: str, split: str | None = None, shards: list[int] | None = None
) -> DataFrame:
    """The read side a trainer actually runs: zip the on-disk block
    index with the on-disk token rows into ASSEMBLED batches — one row
    per block with ``input_ids`` (every segment's BPE ids concatenated
    in pack order) and ``seg_id_lens`` (per-segment id counts, the
    array a collator turns into block-diagonal attention masks and
    position-id resets — note these are ID lengths, which differ from
    the index's seg_tokens WORD-SLOT lengths).

    Scale shape: both sides prune to the same (split, shard) dirs; the
    layout explodes WITH ORDINALITY (posexplode) so reassembly is
    positional, the join key is the chunk identity inside one shard
    (slim), and the per-block regroup is an array_sort over
    (position, ids) structs — the same positional-regroup idiom as
    encode_corpus_ids.  Everything stays inside the shard: with both
    reads pruned to one dir, a trainer worker assembles its own shard
    with no cross-shard traffic."""
    bi = read_block_index(spark, path, split=split, shards=shards)
    toks = read_token_shards(spark, path, split=split, shards=shards).select(
        "split", "shard", "doc_id", "chunk_id", "token_ids"
    )
    seg = bi.select(
        "split", "shard", "block_id", "n_chunks",
        F.col("total_tokens").alias("n_slots"),
        F.posexplode(F.arrays_zip("seg_doc_ids", "seg_chunk_ids")).alias("_pos", "s"),
    ).select(
        "split", "shard", "block_id", "n_chunks", "n_slots", "_pos",
        F.col("s.seg_doc_ids").alias("doc_id"),
        F.col("s.seg_chunk_ids").alias("chunk_id"),
    )
    joined = seg.join(toks, ["split", "shard", "doc_id", "chunk_id"])
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("_pos"), F.col("token_ids").alias("_ids")))
    )
    return (
        joined.groupBy("split", "shard", "block_id")
        .agg(
            F.first("n_chunks").alias("n_chunks"),
            F.first("n_slots").alias("n_slots"),
            F.flatten(F.transform(ordered, lambda s: s["_ids"])).alias("input_ids"),
            F.transform(ordered, lambda s: F.size(s["_ids"])).alias("seg_id_lens"),
        )
        .withColumn("n_ids", F.size("input_ids").cast("long"))
    )


def append_token_shards(
    tokens: DataFrame, path: str, batch_id: str, validate_new: bool = False
) -> dict:
    """O(delta) APPEND of new documents' token rows into an existing
    shard layout — the incremental-ledger idiom (bronze/MinHashIndex)
    at the trainer-artifact level: the delta hashes to shards with the
    manifest's OWN key function (same salt, same n_shards — a delta
    can never disagree with the base about shard membership), lands as
    ONE new parquet file per touched (split, shard) dir (the same
    repartition guarantee as the writer), and the manifest censuses
    SUM-merge.  ``batch_id`` makes replays exactly-once: applied ids
    are recorded in the manifest and a repeated call no-ops — the same
    idempotence contract as the bronze sink.  Untouched dirs are never
    read or written; nothing existing is rewritten (appends add files
    — run ``compact_token_shards`` when dirs accumulate).  Per-file
    rows stay (doc_id, chunk_id)-sorted; cross-file order within a dir
    is epoch order, which the reader does not promise anyway.

    The delta MUST be new documents: batch_id catches the realistic
    dup vector (redelivery of the same batch), but a caller re-sending
    old docs under a FRESH batch_id would silently double them —
    ``validate_new=True`` buys insurance against that caller bug with
    one anti-join probe of only the touched dirs (pruned read, slim
    columns) and raises listing sample offenders.

    Crash-safety protocol (write-ahead, same spirit as the bronze
    sink's staged-until-claimed AdditiveLedger): the delta lands first
    in a HIDDEN staging dir (``_append_staging/<h(batch_id)>`` —
    invisible to parquet readers), then ONE atomic manifest rewrite
    records the merged censuses + batch_id + a ``pending_appends``
    marker, and only then are the staged files moved into the live
    shard dirs and the marker cleared.  A crash before the manifest
    write leaves nothing visible (retry re-stages from scratch); a
    crash after it leaves the batch recorded-but-staged, and the NEXT
    call with the same batch_id finishes the per-file moves
    idempotently instead of doubling rows."""
    import json as _json
    import os as _os

    mpath = _os.path.join(path, "_manifest.json")
    with open(mpath) as f:
        manifest = _json.load(f)
    applied = manifest.setdefault("applied_batches", [])
    if batch_id in applied:
        pending = manifest.get("pending_appends", {})
        if batch_id in pending:
            # recorded but not fully moved in: finish the crashed move
            moved = _finish_pending_append(path, manifest, batch_id)
            return {"appended_chunks": 0, "dirs_touched": moved,
                    "replayed": True, "recovered": True}
        return {"appended_chunks": 0, "dirs_touched": 0, "replayed": True}
    n_shards, salt = int(manifest["n_shards"]), manifest["shard_salt"]

    shard = (md5_long(F.concat_ws("|", F.lit(salt), F.col("doc_id")))
             % n_shards).cast("int")
    if validate_new:
        spark = tokens.sparkSession
        touched = sorted(
            int(r["shard"])
            for r in tokens.withColumn("shard", shard).select("shard").distinct().collect()
        )
        existing = read_token_shards(spark, path, shards=touched).select("doc_id")
        dup = (
            tokens.select("doc_id").distinct()
            .join(existing.distinct(), "doc_id", "left_semi")
        )
        offenders = [r["doc_id"] for r in dup.limit(5).collect()]
        if offenders:
            raise ValueError(
                f"append_token_shards: delta re-sends existing doc_ids "
                f"(sample: {offenders}) under new batch_id {batch_id!r} — "
                "appending would silently double them; erase first or fix "
                "the delta"
            )
    # 1) stage the delta to a HIDDEN dir — nothing reader-visible yet.
    #    A leftover staging dir from a crash BEFORE the manifest write
    #    (batch unrecorded) is simply discarded and re-staged.
    import hashlib as _hashlib
    import shutil as _shutil

    staging_rel = _os.path.join(
        "_append_staging", _hashlib.md5(batch_id.encode()).hexdigest()[:16]
    )
    staging = _os.path.join(path, staging_rel)
    _shutil.rmtree(staging, ignore_errors=True)
    laid = (
        tokens.withColumn("shard", shard)
        .repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("doc_id", "chunk_id")
    )
    laid.write.mode("error").partitionBy("split", "shard").parquet(staging)
    rows = (
        tokens.withColumn("shard", shard)
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.coalesce(F.sum("n_words"), F.lit(0)).alias("words"),
            F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).alias("bpe_tokens"),
        )
        .collect()
    )
    for r in rows:
        key = f"{r['split']}/{int(r['shard']):02d}"
        old = manifest["shards"].get(
            key, {"chunks": 0, "words": 0, "bpe_tokens": 0}
        )
        manifest["shards"][key] = {
            "chunks": old["chunks"] + int(r["chunks"]),
            "words": old["words"] + int(r["words"]),
            "bpe_tokens": old["bpe_tokens"] + int(r["bpe_tokens"]),
        }
    # 2) ONE atomic manifest rewrite claims the batch: censuses merged,
    #    batch recorded, pending marker pointing at the staged files
    applied.append(batch_id)
    manifest.setdefault("pending_appends", {})[batch_id] = staging_rel
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(manifest, f, sort_keys=True, indent=1)
    _os.replace(tmp, mpath)
    # 3) move staged files into the live shard dirs (atomic per file,
    #    idempotent on retry) and clear the marker
    _finish_pending_append(path, manifest, batch_id)
    return {
        "appended_chunks": sum(int(r["chunks"]) for r in rows),
        "dirs_touched": len(rows),
        "replayed": False,
    }


def _finish_pending_append(path: str, manifest: dict, batch_id: str) -> int:
    """Move a claimed batch's staged parquet files into the live shard
    dirs and clear its ``pending_appends`` marker — the completion half
    of append_token_shards' write-ahead protocol, also run on replay
    after a crash between the manifest claim and the moves.  Each file
    move is an atomic rename keeping the staged (task-UUID) file name,
    so a re-run skips files already moved and a crash mid-loop just
    shortens the remaining work.  Returns the number of dirs touched
    by the moves it performed."""
    import json as _json
    import os as _os
    import shutil as _shutil

    staging = _os.path.join(path, manifest["pending_appends"][batch_id])
    moved_dirs = 0
    if _os.path.isdir(staging):
        for split_dir in sorted(_os.listdir(staging)):
            if not split_dir.startswith("split="):
                continue
            for shard_dir in sorted(_os.listdir(_os.path.join(staging, split_dir))):
                if not shard_dir.startswith("shard="):
                    continue
                src_dir = _os.path.join(staging, split_dir, shard_dir)
                dst_dir = _os.path.join(path, split_dir, shard_dir)
                _os.makedirs(dst_dir, exist_ok=True)
                n = 0
                for fname in sorted(_os.listdir(src_dir)):
                    if fname.endswith(".parquet"):
                        _os.replace(
                            _os.path.join(src_dir, fname),
                            _os.path.join(dst_dir, fname),
                        )
                        n += 1
                if n:
                    moved_dirs += 1
        _shutil.rmtree(staging, ignore_errors=True)
    del manifest["pending_appends"][batch_id]
    if not manifest["pending_appends"]:
        del manifest["pending_appends"]
    mpath = _os.path.join(path, "_manifest.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(manifest, f, sort_keys=True, indent=1)
    _os.replace(tmp, mpath)
    return moved_dirs


def _swap_in_dir(staged: str, target: str) -> None:
    """Crash-safe directory replacement for the compact/RTBF rewrites:
    rename the live dir aside to a HIDDEN sibling (``_old_<name>`` —
    underscore-prefixed dirs are invisible to parquet readers) BEFORE
    moving the staged dir in, then drop the aside copy.  Every
    intermediate state keeps the rows reachable under a recoverable
    name: a crash between the two renames leaves the data in
    ``_old_<name>`` (plus the staged copy), never stranded in staging
    with no pointer the way a rmtree-then-replace sequence would."""
    import os as _os
    import shutil as _shutil

    parent, name = _os.path.split(target.rstrip("/"))
    aside = _os.path.join(parent, "_old_" + name)
    _shutil.rmtree(aside, ignore_errors=True)  # leftover from a prior crash
    _os.replace(target, aside)
    _os.replace(staged, target)
    _shutil.rmtree(aside)


def compact_token_shards(spark, path: str, max_files: int = 4) -> dict:
    """Rewrite every (split, shard) dir holding more than ``max_files``
    parquet files back to ONE file — the superseding-compaction idiom
    the incremental indexes use, applied to the shard layout appends
    grow.  Same staging + filesystem-swap discipline as the RTBF erase
    (never overwrites a path Spark is lazily reading); row content is
    unchanged so the manifest needs no update; dirs at or under the
    threshold are untouched (never read, never written).  Returns
    {dirs_compacted, files_removed}."""
    import os as _os
    import shutil as _shutil

    crowded = []
    for split_dir in sorted(_os.listdir(path)):
        if not split_dir.startswith("split="):
            continue
        for shard_dir in sorted(_os.listdir(_os.path.join(path, split_dir))):
            if not shard_dir.startswith("shard="):
                continue
            d = _os.path.join(path, split_dir, shard_dir)
            n = len([f for f in _os.listdir(d) if f.endswith(".parquet")])
            if n > max_files:
                crowded.append(
                    (split_dir.split("=", 1)[1], int(shard_dir.split("=", 1)[1]), n)
                )
    if not crowded:
        return {"dirs_compacted": 0, "files_removed": 0}

    cond = F.lit(False)
    for s, sh, _ in crowded:
        cond = cond | ((F.col("split") == s) & (F.col("shard") == sh))
    keep = (
        read_token_shards(spark, path)
        .filter(cond)
        .repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("doc_id", "chunk_id")
    )
    staging = _os.path.join(path, "_compact_staging")
    _shutil.rmtree(staging, ignore_errors=True)
    keep.write.mode("error").partitionBy("split", "shard").parquet(staging)
    removed = 0
    for s, sh, n in crowded:
        target = _os.path.join(path, f"split={s}", f"shard={sh}")
        _swap_in_dir(_os.path.join(staging, f"split={s}", f"shard={sh}"), target)
        removed += n - 1
    _shutil.rmtree(staging, ignore_errors=True)
    return {"dirs_compacted": len(crowded), "files_removed": removed}


def erase_docs_from_token_shards(
    spark, path: str, doc_ids: list[int], id_col: str = "doc_id"
) -> dict:
    """Right-to-be-forgotten erase at the TRAINER-ARTIFACT level (the
    shard files write_token_shards laid down), mirroring the O(delta)
    RTBF the incremental indexes already have: because the shard key
    is a PURE FUNCTION of doc_id (md5(salt|id) % n_shards, recorded in
    the manifest), the affected shard ids are computed driver-side
    WITHOUT scanning anything — at most len(doc_ids) hashes — and only
    those shard directories are read (partition-pruned), filtered, and
    rewritten.  The rewrite STAGES to a temp dir under ``path`` and
    swaps each touched directory at the filesystem level — never
    overwriting a path Spark is lazily reading from, and keeping the
    one-file-per-dir layout (same repartition+sortWithinPartitions as
    the writer).  Untouched shard files are never read or written
    (byte-identity pinned in tests).  A (split, shard) dir whose every
    row is erased is removed outright.  The manifest censuses are
    updated for touched shards and atomically re-written (tmp +
    rename); erasure is idempotent — a second call touches nothing.
    Returns {erased_chunks, erased_words, erased_bpe_tokens,
    dirs_rewritten, dirs_removed}."""
    import hashlib
    import json as _json
    import os as _os
    import shutil as _shutil

    with open(_os.path.join(path, "_manifest.json")) as f:
        manifest = _json.load(f)
    n_shards, salt = int(manifest["n_shards"]), manifest["shard_salt"]
    targets = sorted(set(int(d) for d in doc_ids))
    shard_of = {
        d: int(hashlib.md5(f"{salt}|{d}".encode()).hexdigest()[:15], 16) % n_shards
        for d in targets
    }
    touched_shards = sorted(set(shard_of.values()))
    if not touched_shards:
        return {"erased_chunks": 0, "erased_words": 0, "erased_bpe_tokens": 0,
                "dirs_rewritten": 0, "dirs_removed": 0,
                "block_index_dropped": 0}

    # one pruned read of ONLY the candidate shard dirs (split unknown
    # per doc until read — the shard id alone prunes to <= n_touched
    # dirs per split)
    cand = read_token_shards(spark, path, shards=touched_shards)
    hit = cand.filter(F.col(id_col).isin(targets))
    erased = hit.groupBy("split", "shard").agg(
        F.count(F.lit(1)).alias("chunks"),
        F.coalesce(F.sum("n_words"), F.lit(0)).alias("words"),
        F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).alias("bpe_tokens"),
    ).collect()
    if not erased:
        return {"erased_chunks": 0, "erased_words": 0, "erased_bpe_tokens": 0,
                "dirs_rewritten": 0, "dirs_removed": 0,
                "block_index_dropped": 0}

    # classify touched dirs: fully-erased (remove) vs partial (rewrite)
    remove_pairs, rewrite_pairs = [], []
    for r in erased:
        key = f"{r['split']}/{int(r['shard']):02d}"
        old = manifest["shards"][key]
        if old["chunks"] - int(r["chunks"]) == 0:
            remove_pairs.append((r["split"], int(r["shard"])))
            del manifest["shards"][key]
        else:
            rewrite_pairs.append((r["split"], int(r["shard"])))
            manifest["shards"][key] = {
                "chunks": old["chunks"] - int(r["chunks"]),
                "words": old["words"] - int(r["words"]),
                "bpe_tokens": old["bpe_tokens"] - int(r["bpe_tokens"]),
            }

    def _dir(split, shard):
        return _os.path.join(path, f"split={split}", f"shard={shard}")

    if rewrite_pairs:
        cond = F.lit(False)
        for s, sh in rewrite_pairs:
            cond = cond | ((F.col("split") == s) & (F.col("shard") == sh))
        keep = (
            cand.filter(cond)
            .filter(~F.col(id_col).isin(targets))
            .repartition(F.col("split"), F.col("shard"))
            .sortWithinPartitions(id_col, "chunk_id")
        )
        staging = _os.path.join(path, "_rtbf_staging")
        _shutil.rmtree(staging, ignore_errors=True)
        # one pass: read completes against the ORIGINAL files while the
        # staging write runs; directory swaps happen only afterwards
        keep.write.mode("error").partitionBy("split", "shard").parquet(staging)
        for s, sh in rewrite_pairs:
            _swap_in_dir(
                _os.path.join(staging, f"split={s}", f"shard={sh}"), _dir(s, sh)
            )
        _shutil.rmtree(staging, ignore_errors=True)
    for s, sh in remove_pairs:
        _shutil.rmtree(_dir(s, sh))

    # the block index (when present) is DERIVED data over the erased
    # rows: block composition cannot be locally patched (budgets would
    # change), so touched shards' index dirs drop with their manifest
    # censuses — re-pack regenerates them.  Untouched shards keep
    # their index.
    bi_dropped = 0
    for s, sh in rewrite_pairs + remove_pairs:
        key = f"{s}/{sh:02d}"
        d = _os.path.join(_bi_root(path), f"split={s}", f"shard={sh}")
        if _os.path.isdir(d):
            _shutil.rmtree(d)
            bi_dropped += 1
        if key in manifest.get("blocks", {}):
            del manifest["blocks"][key]

    tmp = _os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(manifest, f, sort_keys=True, indent=1)
    _os.replace(tmp, _os.path.join(path, "_manifest.json"))
    return {
        "erased_chunks": sum(int(r["chunks"]) for r in erased),
        "erased_words": sum(int(r["words"]) for r in erased),
        "erased_bpe_tokens": sum(int(r["bpe_tokens"]) for r in erased),
        "dirs_rewritten": len(rewrite_pairs),
        "dirs_removed": len(remove_pairs),
        "block_index_dropped": bi_dropped,
    }


def read_token_shards(spark, path: str, split: str | None = None,
                      shards: list[int] | None = None) -> DataFrame:
    """Read the shard layout back, optionally pruning to one split
    and/or a shard subset — both prunes are PARTITION-directory prunes
    (the write partitioned by (split, shard)), so a trainer's worker
    reads only its own shard's bytes, verified by the partition-
    pruning assert in tests."""
    df = spark.read.parquet(path)
    if split is not None:
        df = df.filter(F.col("split") == split)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
