"""Cross-document duplicated-SPAN detection and removal — passage-level
dedup, the level below the doc-level MinHash/SimHash family.

Doc-level dedup keeps two documents that share a 200-token boilerplate
header but differ elsewhere; span-level dedup finds the shared passage
itself.  This is the "exact substring deduplication" stage of modern
LLM corpus pipelines (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022 — public paper), re-expressed in
DataFrame algebra instead of a suffix array:

1. every token position contributes its length-``n`` gram
   (positional n-grams, NOT the distinct shingle set dedup uses);
2. a gram occurring at >= 2 sites (across docs OR repeated within one
   doc) marks all its positions as duplicated;
3. per document, overlapping/adjacent duplicated positions merge into
   maximal spans (gaps-and-islands over token positions);
4. removal keeps the gram's globally-first site (min (doc_id, pos)) —
   the Lee-et-al. keep-one policy — and cuts every other covered
   token.  When two DIFFERENT duplicated passages overlap, the kept
   site of one can still lose tokens to the other's cut (same
   behavior as suffix-array-based removal); a passage that overlaps
   no other duplication survives in exactly one copy.

Scale shape (100 TB): the only wide stages shuffle (gram, doc, pos)
rows — positional grams are O(total tokens), never O(pairs); the gram
aggregate partial-aggregates; span merging is a per-doc window (hash
shuffle on doc_id, spillable sort).  Nothing materializes a document
pair, so boilerplate shared by a million documents costs a million
gram rows, not a trillion pair rows.  Grams stay strings here for
oracle portability; the production variant would xxhash64 them like
the shingle operators (collision risk 2^-64-scale, same trade the
MinHash family documents).

Reference parity note: the reference system (tiny-tinker/cdc-demo) has
no text operators at all — this family is part of the
training-data-pipeline surface the task brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_demo_spark.operators.text import gram_at


def ngram_positions(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, hashed: bool = False
) -> DataFrame:
    """(id, pos, gram): the length-``n`` token gram starting at each
    1-based token position.  Single-space tokenization — exact parity
    with the DuckDB oracles (see q_dup_ngram_fraction's note).

    ``hashed`` replaces the gram string with xxhash64 of it — the
    scale path (the wide shuffle carries 8-byte longs instead of
    ~n·word strings; 2⁻⁶⁴-scale collision risk, the same trade the
    hashed-shingle operators document).  Equality of the two paths is
    pytest-pinned on the planted corpus.

    The tokens MUST materialize in their own projection before the
    lambda touches them: an inlined ``split(text)`` is re-evaluated
    for EVERY element of the transform (no common-subexpression
    elimination inside higher-order-function lambdas), turning the
    gram pass O(tokens²) per document — measured 34× slower on
    5000-token docs (r11 A/B, SCALE.md)."""
    base = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("__toks")
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            # gram_at, not concat_ws(slice(...)): an interpreted slice
            # allocates an n-array per gram site — 8x measured on the
            # 35M-site pass (see text.gram_at, r16 optimization round)
            lambda j: F.struct(j.alias("pos"), gram_at(toks, j, n).alias("gram")),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
    e = F.explode(grams).alias("g")
    gram = F.xxhash64(F.col("g.gram")) if hashed else F.col("g.gram")
    return base.select("id", e).select(
        "id", F.col("g.pos").alias("pos"), gram.alias("gram")
    )


# A gram at or past this many sites routes to the hybrid plan's
# map-side path instead of the window.  Default sized for the 100 TB
# shape: a window partition of a few hundred thousand hashed-long
# rows sorts comfortably in one task; the r11 fixture measured the
# window plan at 66x its normal cost once ONE gram owned ~25M sites.
HOT_GRAM_OCC = 200_000


def probe_max_occ(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    hashed: bool,
    hot_occ: int,
    probe_fraction: float,
) -> float:
    """Estimated max gram occupancy for the auto plan's routing.

    Two-part probe (r13 review finding: document-grain sampling alone
    misses a viral gram CONCENTRATED in one huge doc with probability
    ~(1 - probe_fraction)):

    - MEGA docs — any doc long enough to single-handedly hold
      ``hot_occ`` gram sites — are tokenized EXACTLY.  The threshold
      is ``hot_occ + n - 2`` CHARS, the tight bound: a doc of length
      L splits into at most L+1 tokens (ngram_positions splits on
      literal space and does NOT drop empty tokens, so "each token is
      >= 2 chars with its separator" is false for runs of spaces —
      the r13 ADVICE counter-example was ~hot_occ consecutive spaces
      yielding ~hot_occ empty-gram sites under a 2*hot_occ
      threshold), hence at most L+1-(n-1) = L+2-n sites, which
      reaches hot_occ only when L >= hot_occ + n - 2.  (The first r14
      cut used plain hot_occ — conservative for n >= 2 but one char
      short for n = 1, where an (hot_occ-1)-char doc holds exactly
      hot_occ 1-gram slots.)  Mega docs are rare at any real corpus
      shape, and they are precisely the docs a sample may miss.
    - The rest are sampled at ``probe_fraction`` and the max occupancy
      scaled by 1/fraction.  Cross-doc viral grams span many docs by
      construction (no single small doc can hold them), so the sample
      catches them w.h.p. and a near-boundary miss only routes to the
      window plan, whose partitions stay ~hot_occ.

    ``probe_fraction=1.0`` is the exact probe.  Routing never affects
    results (all plans equal), only the physical shape.
    """
    if probe_fraction <= 0:
        raise ValueError(f"probe_fraction must be in (0, 1]; got {probe_fraction}")

    def _max_occ(frame: DataFrame) -> int:
        row = (
            ngram_positions(frame, id_col, text_col, n, hashed)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("occ"))
            .agg(F.max("occ").alias("mx"))
            .first()
        )
        return int(row["mx"]) if row and row["mx"] is not None else 0

    if probe_fraction >= 1.0:
        return float(_max_occ(df))
    # tight: L+2-n sites max, so only L >= hot_occ+n-2 can reach hot_occ
    mega_chars = max(1, hot_occ + n - 2)
    mega = df.filter(F.length(F.col(text_col)) >= mega_chars)
    small = df.filter(F.length(F.col(text_col)) < mega_chars)
    est_small = (
        _max_occ(small.sample(fraction=probe_fraction, seed=13)) / probe_fraction
    )
    return max(est_small, float(_max_occ(mega)))


def _window_marked(g: DataFrame, keep_first: bool) -> DataFrame:
    """The gram-partitioned window body shared by the window plan, the
    auto plan's cold route, and the hybrid plan's cold side.

    Both window functions ride ONE ordered spec (r16 optimization
    round): count() over the explicit unbounded-both frame of the
    ordered window is the full partition count — identical to the
    order-less count — but now both expressions share a single Window
    node, so the plan sorts the gram table ONCE instead of twice
    (the order-less count window sorted by gram alone, then the
    row_number window re-sorted by (gram, id, pos) — two full sorts
    of the O(total tokens) gram stream for one pass's worth of
    information)."""
    w = Window.partitionBy("gram").orderBy("id", "pos")
    marked = g.select(
        "id",
        "pos",
        F.count(F.lit(1))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("occ"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("occ") >= 2)
    if keep_first:
        marked = marked.filter(F.col("rn") > 1)
    return marked.select("id", "pos")


def duplicated_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    keep_first: bool = False,
    hashed: bool = False,
    plan: str = "window",
    hot_occ: int = HOT_GRAM_OCC,
    probe_fraction: float = 0.02,
) -> DataFrame:
    """(id, pos) sites whose gram occurs at >= 2 sites corpus-wide.
    With ``keep_first`` the globally-first site per gram
    (min (id, pos)) is EXCLUDED — those are the copies removal
    preserves.

    Two physical plans compute the same answer (equality
    hypothesis-pinned in tests/test_spans_hypothesis.py):

    - ``plan="window"`` (default): ONE gram-partitioned window pass —
      both occ and the keep-first rank come out of one shuffle + one
      spillable sort of ~O(tokens) hashed-long rows.  Measured 30 s vs
      107 s at 200k docs / 35M sites, because the join-back variant
      recomputed the tokenize/gram/hash pass for its probe side and
      planned a second sort-merge shuffle.  Its weakness: a window
      partition is AQE-UNSPLITTABLE, so one viral boilerplate gram
      (millions of sites) is a straggler task.
    - ``plan="join"``: aggregate the duplicated-gram table (partial
      aggregation collapses a hot gram map-side), then join it back to
      the site rows.  Costs the recomputation above, but the join's
      partitions CAN be split/broadcast by AQE, so it degrades
      gracefully on skewed corpora.
    - ``plan="hybrid"`` (the 100 TB shape, promoted r11 after the
      viral-boilerplate fixture showed the window plan at 66× its
      normal cost — SCALE.md): ONE gram aggregate finds each gram's
      occ and global first site (partial aggregation collapses even a
      corpus-wide gram map-side); grams with occ ≥ ``hot_occ`` are
      finished ENTIRELY map-side — their sites are duplicated by
      definition and keep-first compares against the broadcast first
      site, no shuffle, no straggler — while cold grams take the
      window pass with every partition now bounded by ``hot_occ``.
      The broadcast side holds ≤ total_sites / hot_occ grams (a few
      thousand rows at any real skew).  The explode `g` is pinned
      (lazy localCheckpoint) so its three consumers — stats aggregate,
      hot join, cold anti-join — tokenize once, not three times
      (r11 ADVICE).
    - ``plan="auto"``: route window↔hybrid on the corpus's measured
      skew, so a 100 TB caller doesn't need to know HOT_GRAM_OCC.
      r13: the probe is a SAMPLED skew estimate — tokenize a
      deterministic ``probe_fraction`` doc sample, take max gram
      occupancy, scale by 1/fraction, route hybrid past
      ``hot_occ / 2``.  Routing can never change the ANSWER (all four
      plans compute identical results, hypothesis-pinned), only the
      physical shape, so a probabilistic probe is safe by
      construction: a deep-viral gram (the 66× window blowup) spans
      thousands of docs and is caught w.h.p.; docs long enough to hold
      ``hot_occ`` sites single-handedly (the one shape a doc sample
      can miss) are tokenized EXACTLY by ``probe_max_occ``'s mega-doc
      branch; a near-boundary miss falls back to the window plan,
      whose partitions stay ~hot_occ — the regime it is sized for.
      The r12 exact probe (max occ over
      the localCheckpoint'd FULL gram table) measured ~3× the whole
      window plan on the unskewed 200k-doc bench corpus because the
      checkpoint materializes every gram row; the sampled probe costs
      ~probe_fraction of one tokenize pass (SCALE.md).  Pass
      ``probe_fraction=1.0`` for the exact probe (tests use it to pin
      the hybrid route deterministically).
    """
    g = ngram_positions(df, id_col, text_col, n, hashed)
    if plan == "window":
        return _window_marked(g, keep_first)
    if plan == "join":
        dup = (
            g.groupBy("gram")
            .agg(
                F.count(F.lit(1)).alias("occ"),
                F.min(F.struct("id", "pos")).alias("first"),
            )
            .filter(F.col("occ") >= 2)
        )
        marked = g.join(dup, "gram")
        if keep_first:
            marked = marked.filter(
                (F.col("id") != F.col("first.id")) | (F.col("pos") != F.col("first.pos"))
            )
        return marked.select("id", "pos")
    if plan == "auto":
        mx_est = probe_max_occ(
            df, id_col, text_col, n, hashed, hot_occ, probe_fraction
        )
        if mx_est < hot_occ / 2:
            # No deep-viral gram in evidence: the single-pass window
            # plan over the UNPINNED g (no checkpoint, no storage
            # footprint — repeated calls cannot accumulate blocks).
            return _window_marked(g, keep_first)
        plan = "hybrid"
    if plan == "hybrid":
        # Three consumers read g below (stats aggregate, hot broadcast
        # join, cold anti-join); without the pin each re-runs the
        # tokenize/explode pass — the most expensive stage at the
        # 100 TB shape this plan targets (r11 ADVICE).  Lazy local
        # checkpoint: materialized once at the first action, then all
        # consumers read the stored rows; the API stays lazy.
        g = g.localCheckpoint(eager=False)
        stats = (
            g.groupBy("gram")
            .agg(
                F.count(F.lit(1)).alias("occ"),
                F.min(F.struct("id", "pos")).alias("first"),
            )
            .filter(F.col("occ") >= 2)
        )
        hot = stats.filter(F.col("occ") >= hot_occ)
        # hot grams: every site is duplicated by definition; keep-first
        # drops the broadcast first site — all map-side, no shuffle of
        # the viral mass, no AQE-unsplittable window partition
        hot_sites = g.join(F.broadcast(hot), "gram")
        if keep_first:
            hot_sites = hot_sites.filter(
                (F.col("id") != F.col("first.id"))
                | (F.col("pos") != F.col("first.pos"))
            )
        # cold grams: the window plan, with partition size now bounded
        # by hot_occ (the broadcast anti-join is map-side too)
        cold = g.join(F.broadcast(hot.select("gram")), "gram", "left_anti")
        cold_marked = _window_marked(cold, keep_first)
        return hot_sites.select("id", "pos").unionByName(cold_marked)
    raise ValueError(
        f"unknown plan {plan!r}; expected 'window', 'join', 'hybrid', "
        "or 'auto'"
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    keep_first: bool = False,
    hashed: bool = False,
    plan: str = "window",
    hot_occ: int = HOT_GRAM_OCC,
    probe_fraction: float = 0.02,
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start,
    span_end, span_tokens) over 1-based token indices.  A duplicated
    position ``j`` covers tokens [j, j+n-1]; spans merge while the
    next start is inside-or-adjacent to the running span
    (gaps-and-islands: new island iff pos - prev_pos > n)."""
    dup = duplicated_positions(
        df, id_col, text_col, n, keep_first, hashed, plan, hot_occ,
        probe_fraction,
    )
    wd = Window.partitionBy("id").orderBy("pos")
    island = F.sum(
        F.when(F.col("pos") - F.lag("pos").over(wd) > n, 1).otherwise(0)
    ).over(wd)
    return (
        dup.withColumn("island", island)
        .groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    hashed: bool = False,
    plan: str = "window",
    hot_occ: int = HOT_GRAM_OCC,
    probe_fraction: float = 0.02,
) -> DataFrame:
    """Cut every duplicated passage except its globally-first
    occurrence (Lee et al.'s keep-one policy): tokens covered by any
    non-first duplicated gram site are dropped, the rest re-join in
    order.  Returns (id, clean_text, n_tokens, n_removed).  See the
    module docstring for the overlapping-passages caveat.

    Rebuild shape (r16 optimization round): the covered-index set is
    aggregated to ONE sorted array per CUT document (collect_set over
    the O(n · removable sites) explode — output-bound, duplicated-span
    docs only), then attached to the corpus in a single join and the
    text rebuilt per row in pure codegen: kept indices =
    array_except(sequence(1, n_tokens), cuts), tokens re-joined via
    element_at.  Documents with no covered positions — the vast
    majority of any real corpus — take the no-op branch (clean_text =
    their own token array re-joined, zero array surgery).  The
    previous shape posexploded EVERY token of EVERY document into
    (id, idx, tok) rows, left-joined the covered set at token grain,
    and re-assembled all documents through a corpus-wide
    collect_list(struct) aggregate — two full-corpus shuffles (the
    explode join's exchange + the regroup) and one extra corpus scan
    (the n_tokens count aggregate) that this shape does not have
    (measured at the 200k bench fixture, isolated steady-state A/B of
    this operator: 23.1 s → 15.3 s; plan: 3 corpus scans → 2, the
    36M-row ObjectHashAggregate regroup + token-grain join gone —
    see plans/r16/q_remove_duplicated_spans_{before,after}.txt).
    Equality with the old shape is pinned by the unchanged DuckDB
    oracle (q_remove_duplicated_spans replays cover-and-cut from
    first principles) and the spans pytest/hypothesis suites."""
    removable = duplicated_positions(
        df, id_col, text_col, n, keep_first=True, hashed=hashed, plan=plan,
        hot_occ=hot_occ, probe_fraction=probe_fraction,
    )
    cuts = (
        removable.select(
            "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("idx")
        )
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("idx")).alias("__cuts"))
    )
    # NULL text never reaches the output (split(NULL) posexploded to no
    # rows in the previous shape) — keep that contract explicitly.
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("__toks")
    )
    toks, cut = F.col("__toks"), F.col("__cuts")
    kept_idx = F.array_except(F.sequence(F.lit(1), F.size(toks)), cut)
    clean = F.when(cut.isNull(), F.concat_ws(" ", toks)).otherwise(
        F.concat_ws(" ", F.transform(kept_idx, lambda i: F.element_at(toks, i)))
    )
    return base.join(cuts, "id", "left").select(
        "id",
        clean.alias("clean_text"),
        F.size(toks).cast("long").alias("n_tokens"),
        # covered indices are distinct and always within [1, n_tokens]
        # (pos <= n_tokens - n + 1), so their count IS the removed count
        F.coalesce(F.size(cut), F.lit(0)).cast("long").alias("n_removed"),
    )
