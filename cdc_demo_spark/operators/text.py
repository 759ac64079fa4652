"""Text analysis operators (SURVEY.md §2 B53): tokenization, quality
scoring, language ID, fingerprinting — all JVM-side expressions.

Design for 100 TB: these are embarrassingly-parallel per-row projections
(no shuffle at all); throughput is bounded by scan speed, which is why
every one is a codegen-able builtin expression rather than a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID.  Public knowledge (most-frequent function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "mit", "ist", "den", "im", "ein"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the corpus is space-separated)."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def gram_at(toks: Column, j: Column, k: int) -> Column:
    """The k-token gram of ``toks`` starting at 1-based position ``j``
    as one space-joined string — value-identical to
    ``concat_ws(" ", slice(toks, j, k))`` whenever ``j + k - 1 <=
    size(toks)`` (every caller's index range guarantees that, and
    split() never produces NULL elements), but built from ``k``
    positional ``element_at`` reads instead of a ``slice``.

    Why it exists (r16 optimization round): gram/shingle builders run
    INSIDE ``transform`` lambdas, which Spark evaluates interpreted
    per element — and an interpreted ``slice`` allocates a fresh
    k-element array per evaluation.  Replacing it with k direct reads
    measured 11.1 s → 1.4 s for the 35M-shingle string pass at the
    200k bench fixture (the single hottest expression in the MinHash
    and span-detection pipelines).  Callers with LARGE k (the 64-token
    chunk builders) keep ``slice``: one array copy amortized over 64
    elements beats 64 chained concat arguments there."""
    return F.concat_ws(" ", *[F.element_at(toks, j + i) for i in range(k)])


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count word pieces of <=4 chars. A word of
    length L contributes ceil(L/4) pieces — a public rule-of-thumb proxy
    for subword tokenizers, computed without any Python."""
    t = tokens(text)
    return F.aggregate(
        F.transform(t, lambda w: F.ceil(F.length(w) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def stopword_hits(text: Column | str, lang: str) -> Column:
    """How many tokens are in `lang`'s stopword list."""
    t = tokens(text)
    words = STOPWORDS[lang]
    return F.size(F.filter(t, lambda w: F.lower(w).isin(*words)))


def predict_lang(text: Column | str) -> Column:
    """Stopword-frequency language ID: argmax over per-language hit
    counts, 'und' (undetermined) when no list matches."""
    hit_cols = [
        F.struct(stopword_hits(text, lg).alias("hits"), F.lit(lg).alias("lg"))
        for lg in sorted(STOPWORDS)
    ]
    best = F.array_max(F.array(*hit_cols))
    return F.when(best["hits"] > 0, best["lg"]).otherwise(F.lit("und"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Heuristic quality signals: length, punctuation ratio, stopword
    ratio, mean token length, alpha ratio."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    t = tokens(c)
    n_tokens = F.size(t)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    en_stop = stopword_hits(c, "en")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": n_punct / F.nullif(n_chars, F.lit(0)),
        "alpha_ratio": n_alpha / F.nullif(n_chars, F.lit(0)),
        "stopword_ratio": en_stop / F.nullif(n_tokens, F.lit(0)),
        "mean_token_len": (n_chars - n_tokens + 1) / F.nullif(n_tokens, F.lit(0)),
    }


def content_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Documents that differ only by token order/duplication get
    the same fingerprint — a cheap bag-of-words canonical form."""
    t = tokens(text)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(t)), " "))


def rolling_hash_fingerprint(text: Column | str, window: int = 8, mod: int = 1 << 31) -> Column:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp style):
    min over all `window`-grams of a base-31 hash — a deterministic,
    engine-portable locality-sensitive fingerprint (pure integer
    arithmetic, reproducible in ANSI SQL)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    gram_hash = lambda i: F.aggregate(  # noqa: E731
        F.sequence(i, i + window - 1),
        F.lit(0).cast("long"),
        lambda acc, j: (acc * 31 + F.ascii(F.substring(c, j, 1))) % mod,
    )
    return F.array_min(F.transform(idx, gram_hash))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature set as columns (single projection pass)."""
    feats = quality_features(text_col)
    out = df
    for name, col in feats.items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("pred_lang", predict_lang(text_col))
        .withColumn("fingerprint", content_fingerprint(text_col))
        .withColumn("bpe_tokens", bpe_ish_token_count(text_col))
    )


def bigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, ppl) — per-document perplexity under the
    corpus's own add-k-smoothed bigram model (the CCNet/KenLM-shaped
    filter; q_bigram_perplexity is the oracle-checked registration).
    P(b|a) = (c(a,b) + k) / (ctx(a) + k·V) with ctx(a) = Σ_b c(a,b)
    and V the vocabulary size.  The LM tables join back at bigram-key
    grain — broadcast when small, hash-partitioned when not; nothing
    assumes they fit anywhere.  Documents with < 2 tokens have no
    bigrams and drop out."""
    # token array projected before the bigram lambda touches it — an
    # inlined split re-evaluates per element (O(tokens²), r11; SCALE.md)
    tok_docs = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    pair_idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bg = (
        tok_docs.filter(F.size(toks) >= 2)
        .select(
            "id",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda j: F.struct(
                        F.element_at(toks, j).alias("a"),
                        F.element_at(toks, j + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .select("id", "p.a", "p.b")
    )
    c2 = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("a").agg(F.sum("c").alias("ctx"))
    vocab = (
        tok_docs.select(F.explode(toks).alias("w"))
        .agg(F.countDistinct("w").cast("double").alias("v"))
    )
    logp = F.log((F.col("c") + F.lit(k)) / (F.col("ctx") + F.lit(k) * F.col("v")))
    return (
        bg.join(c2, ["a", "b"])
        .join(c1, "a")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.exp(-F.sum(logp) / F.count(F.lit(1))).alias("ppl"),
        )
    )


def kneser_ney_perplexity(
    docs: DataFrame,
    target_expr: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """(id, n_bigrams, ppl) — per-document perplexity under an
    interpolated Kneser-Ney bigram model FIT ON A TARGET SLICE and
    scored over the whole pool: the actual CCNet filter shape (Wenzek
    et al., LREC 2020 fit a KenLM on Wikipedia and kept the
    low-perplexity tail of Common Crawl; ``bigram_perplexity`` is the
    self-scored add-k sibling).  Kneser-Ney differs from add-k where
    it matters for filtering: the backoff mass of a context is carried
    by CONTINUATION counts (in how many distinct contexts does this
    word appear) rather than raw frequency, so boilerplate tokens that
    are frequent but context-locked score low under backoff.

        P(b|a) = max(c(a,b) - D, 0)/ctx(a) + D·n_after(a)/ctx(a) · Pc(b)
        Pc(b)  = (n_before(b) + 1) / (N + V)        [+1/V: unseen-word mass]
        P(b|a) = Pc(b)                              [context a unseen]

    with D = ``discount`` (0.75 — exactly representable, so both
    engines compute identical operands), ctx(a) = Σ_b c(a,b),
    n_after/n_before the distinct-successor/-predecessor counts, N the
    distinct bigram types and V the target vocabulary.  Unseen events
    are REACHABLE here by construction (the pool is scored against a
    slice model), hence the +1-smoothed continuation floor: every
    probability is positive without special-casing.

    Scale shape: the model is three aggregates of the TARGET slice's
    bigram stream (bigram grain, then two ≤vocab-grain rollups) plus
    two scalars; scoring joins the pool's bigram stream against the
    model tables at bigram-key grain — AQE broadcasts them while they
    fit, the same plan runs hash-partitioned when the model outgrows
    broadcast (no collect anywhere).  Documents with < 2 tokens have
    no bigrams and drop out, as in bigram_perplexity."""
    D = float(discount)
    tok_docs = docs.select(
        F.col(id_col).alias("id"),
        target_expr.alias("_t"),
        F.split(F.col(text_col), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    pair_idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bg = (
        tok_docs.filter(F.size(toks) >= 2)
        .select(
            "id",
            "_t",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda j: F.struct(
                        F.element_at(toks, j).alias("a"),
                        F.element_at(toks, j + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .select("id", "_t", "p.a", "p.b")
    )
    c2 = bg.filter(F.col("_t")).groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    ctx = c2.groupBy("a").agg(
        F.sum("c").alias("ctx"), F.count(F.lit(1)).alias("n_after")
    )
    cont = c2.groupBy("b").agg(F.count(F.lit(1)).alias("n_before"))
    scal = c2.agg(
        F.count(F.lit(1)).cast("double").alias("n")
    ).crossJoin(
        tok_docs.filter(F.col("_t"))
        .select(F.explode(toks).alias("w"))
        .agg(F.countDistinct("w").cast("double").alias("v"))
    )
    pc = (F.coalesce(F.col("n_before"), F.lit(0)) + 1) / (F.col("n") + F.col("v"))
    p = F.when(
        F.col("ctx").isNotNull(),
        F.greatest(F.coalesce(F.col("c"), F.lit(0)).cast("double") - D, F.lit(0.0))
        / F.col("ctx")
        + (F.lit(D) * F.col("n_after") / F.col("ctx")) * pc,
    ).otherwise(pc)
    return (
        bg.join(c2, ["a", "b"], "left")
        .join(ctx, "a", "left")
        .join(cont, "b", "left")
        .crossJoin(F.broadcast(scal))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.exp(-F.sum(F.log(p)) / F.count(F.lit(1))).alias("ppl"),
        )
    )
