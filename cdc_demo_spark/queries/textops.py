"""Text-analysis query surface over the documents table (B53)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators import text as T
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_token_stats",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(len(string_split(text, ' '))) AS min_tokens,
       max(len(string_split(text, ' '))) AS max_tokens
FROM documents GROUP BY lang
""",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token census per language — one scan, tiny shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("long")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min(n).alias("min_tokens"),
        F.max(n).alias("max_tokens"),
    )


@register(
    "q_text_quality",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       round(CAST(length(regexp_replace(text, '[A-Za-z0-9_ \t\n]', '', 'g')) AS DOUBLE)
             / nullif(length(text), 0), 6) AS punct_ratio,
       round(CAST(len(list_filter(string_split(text, ' '),
                 w -> list_contains(['the','and','of','to','a','in','is','it','that','was'], lower(w))))
             AS DOUBLE) / nullif(len(string_split(text, ' ')), 0), 6) AS stopword_ratio,
       round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             / nullif(len(string_split(text, ' ')), 0), 6) AS mean_token_len
FROM documents
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (pure projections; no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9_ \t\n]", ""))
    stop = F.size(
        F.filter(
            toks, lambda w: F.lower(w).isin(*T.STOPWORDS["en"])
        )
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct.cast("double") / F.nullif(F.length(text), F.lit(0)), 6).alias("punct_ratio"),
        F.round(stop.cast("double") / F.nullif(n_tokens, F.lit(0)), 6).alias("stopword_ratio"),
        F.round(
            (F.length(text) - n_tokens + 1).cast("double") / F.nullif(n_tokens, F.lit(0)), 6
        ).alias("mean_token_len"),
    )


@register(
    "q_bpe_token_count",
    oracle="""
SELECT source,
       CAST(sum(list_sum(list_transform(string_split(text, ' '),
                                   w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT) AS bpe_tokens,
       count(*) AS n_docs
FROM documents GROUP BY source
""",
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-ish token budget per source (ceil(len/4) per word — a
    public rule-of-thumb proxy for BPE tokenizers)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(T.bpe_ish_token_count("text")).alias("bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "q_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents
""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words content fingerprint (order-insensitive md5)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.content_fingerprint("text").alias("fingerprint"))


def _lang_id_oracle() -> str:
    """DuckDB replica of predict_lang's argmax: per-language stopword
    hit counts; ties resolve to the lexicographically-largest language
    code (mirrors Spark's array_max over (hits, lang) structs)."""
    hit = (
        "len(list_filter(string_split(text, ' '), "
        "w -> list_contains({words}, lower(w))))"
    )
    cols = ",\n       ".join(
        f"{hit.format(words=T.STOPWORDS[lg])} AS h_{lg}" for lg in sorted(T.STOPWORDS)
    )
    # tie-break order = descending language code
    case = (
        "CASE WHEN m = 0 THEN 'und' "
        + " ".join(
            f"WHEN h_{lg} = m THEN '{lg}'"
            for lg in sorted(T.STOPWORDS, reverse=True)
        )
        + " END"
    )
    return f"""
WITH hits AS (
  SELECT lang,
       {cols}
  FROM documents
), best AS (
  SELECT lang, greatest(h_de, h_en, h_es, h_fr, h_zh) AS m,
         h_de, h_en, h_es, h_fr, h_zh
  FROM hits
)
SELECT lang, {case} AS pred_lang, count(*) AS n
FROM best GROUP BY 1, 2
"""


@register("q_lang_id", oracle=_lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-frequency language ID vs the labeled lang column;
    the oracle re-derives the same argmax in SQL (tie-break included);
    determinism + known-text accuracy asserted in tests/test_text.py."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.predict_lang("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_document_chunks",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), meta AS (
  SELECT doc_id, t, len(t) AS n,
         greatest(CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1, 1) AS nc
  FROM toks
), idx AS (
  SELECT doc_id, t, n, unnest(range(0, nc)) AS i FROM meta
)
SELECT doc_id, i AS chunk_id,
       array_to_string(t[i*48+1 : i*48+64], ' ') AS chunk_text,
       least(n - i*48, 64) AS n_tokens
FROM idx
""",
)
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows, stride 48 (16-token
    overlap), one row per chunk — the corpus-preparation primitive for
    training pipelines. Pure codegen, no shuffle (see
    operators/chunking.py)."""
    from cdc_demo_spark.operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, stride=48)


# The DuckDB twin of the deterministic fold in
# operators/packing.pack_chunks: the per-group cumsum over a
# DETERMINISTIC chunk order makes the order-dependent fold
# SQL-expressible — each block's end row is "count of rows with csum
# <= base + budget", clamped to at least one chunk (exactly
# pack_chunks' searchsorted).  The order is the template's ONE free
# variable: greedy packs in (doc_id, chunk_id) order, NFD in
# (n_tokens DESC, doc_id, chunk_id) — same fold, different sort, so
# one template oracle-checks both strategies.  Shared by
# q_packed_census / q_packed_blocks (greedy) and q_packed_blocks_nfd.
def _packed_fold_ctes(order: str) -> str:
    """The fold's CTE body (toks..blk) WITHOUT a final SELECT, so each
    packing query appends its own projection over `blk` (block ranges)
    and `ordered` (rn-indexed chunks) — the census queries aggregate,
    q_packed_segments list-aggs the per-block segment layout."""
    return """
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), meta AS (
  SELECT doc_id, t, len(t) AS n,
         greatest(CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1, 1) AS nc
  FROM toks
), idx AS (
  SELECT doc_id, n, unnest(range(0, nc)) AS i FROM meta
), chunks AS (
  SELECT c.doc_id, c.i AS chunk_id,
         CAST(least(c.n - c.i*48, 64) AS BIGINT) AS n_tokens,
         d.source AS grp
  FROM idx c JOIN documents d USING (doc_id)
), ordered AS (
  SELECT grp, doc_id, chunk_id, n_tokens,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(sum(n_tokens) OVER w AS BIGINT) AS csum
  FROM chunks
  WINDOW w AS (PARTITION BY grp ORDER BY {order})
), maxr AS (
  SELECT grp, max(rn) AS n FROM ordered GROUP BY grp
), blk(grp, block_id, start_rn, end_rn, base, end_csum) AS (
  SELECT m.grp, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         greatest(CAST(1 AS BIGINT),
                  (SELECT count(*) FROM ordered o2
                   WHERE o2.grp = m.grp AND o2.csum <= 256)),
         CAST(0 AS BIGINT),
         (SELECT o3.csum FROM ordered o3
          WHERE o3.grp = m.grp AND o3.rn =
            greatest(CAST(1 AS BIGINT),
                     (SELECT count(*) FROM ordered o2
                      WHERE o2.grp = m.grp AND o2.csum <= 256)))
  FROM maxr m
  UNION ALL
  SELECT b.grp, b.block_id + 1, b.end_rn + 1,
         greatest(b.end_rn + 1,
                  (SELECT count(*) FROM ordered o2
                   WHERE o2.grp = b.grp AND o2.csum <= b.end_csum + 256)),
         b.end_csum,
         (SELECT o3.csum FROM ordered o3
          WHERE o3.grp = b.grp AND o3.rn =
            greatest(b.end_rn + 1,
                     (SELECT count(*) FROM ordered o2
                      WHERE o2.grp = b.grp AND o2.csum <= b.end_csum + 256)))
  FROM blk b JOIN maxr m ON m.grp = b.grp
  WHERE b.end_rn < m.n
)
""".replace("{order}", order)


def _packed_fold_sql(order: str) -> str:
    return _packed_fold_ctes(order) + """
SELECT b.grp, b.block_id,
       b.end_rn - b.start_rn + 1 AS n_chunks,
       b.end_csum - b.base AS total_tokens,
       array_to_string(list_sort(list(DISTINCT o.doc_id)), ',') AS doc_ids_csv
FROM blk b
JOIN ordered o ON o.grp = b.grp AND o.rn BETWEEN b.start_rn AND b.end_rn
GROUP BY b.grp, b.block_id, b.start_rn, b.end_rn, b.base, b.end_csum
"""


_PACKED_FOLD_SQL = _packed_fold_sql("doc_id, chunk_id")
_PACKED_FOLD_NFD_SQL = _packed_fold_sql("n_tokens DESC, doc_id, chunk_id")


@register(
    "q_packed_blocks",
    oracle=(
        'SELECT grp AS "group", block_id, n_chunks, total_tokens, doc_ids_csv '
        "FROM (" + _PACKED_FOLD_SQL + ") AS census"
    ),
)
def q_packed_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the corpus then greedily pack chunks into 256-token
    training blocks per source shard (invariants — nothing lost, budget
    kept, deterministic — asserted in tests/test_text.py). doc_ids is
    serialized to a CSV string so every output column is scalar (the
    driver's canonicalizer sorts columns and cannot hash arrays).
    Oracle-backed (was rows-only through r9): adopts q_packed_census's
    recursive-CTE replay of the same greedy fold (_PACKED_FOLD_SQL),
    with grp aliased back to this query's "group" column."""
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", F.col("source").alias("group")), "doc_id"
    )
    packed = pack_chunks(chunks, "group", block_tokens=256)
    return packed.select(
        "group",
        "block_id",
        "n_chunks",
        "total_tokens",
        F.concat_ws(",", F.transform("doc_ids", lambda x: x.cast("string"))).alias(
            "doc_ids_csv"
        ),
    )


@register(
    "q_packed_blocks_nfd",
    oracle=(
        'SELECT grp AS "group", block_id, n_chunks, total_tokens, doc_ids_csv '
        "FROM (" + _PACKED_FOLD_NFD_SQL + ") AS census"
    ),
)
def q_packed_blocks_nfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_packed_blocks under strategy='nfd' (next-fit decreasing,
    operators/packing.py r14): the SAME recursive-CTE fold replay as
    the greedy oracle with the ONE free variable changed — the chunk
    order window becomes (n_tokens DESC, doc_id, chunk_id) — so the
    decreasing-order packing that cuts padding waste 10.9% -> 1.3%
    (SCALE.md r14) is oracle-checked value-exact, not just
    pytest-gated.  Same scalar output shape as q_packed_blocks."""
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", F.col("source").alias("group")), "doc_id"
    )
    packed = pack_chunks(chunks, "group", block_tokens=256, strategy="nfd")
    return packed.select(
        "group",
        "block_id",
        "n_chunks",
        "total_tokens",
        F.concat_ws(",", F.transform("doc_ids", lambda x: x.cast("string"))).alias(
            "doc_ids_csv"
        ),
    )


# Final SELECT shared by the greedy and NFD segment-layout oracles:
# list-agg `ordered` rows rn-ordered within each block's range, so the
# whole layout (not just the census) replays value-exact.
_SEGMENTS_SELECT_SQL = """
SELECT b.grp AS "group", b.block_id,
       CAST(b.end_rn - b.start_rn + 1 AS BIGINT) AS n_chunks,
       CAST(b.end_csum - b.base AS BIGINT) AS total_tokens,
       array_to_string(list(o.doc_id ORDER BY o.rn), ',') AS seg_doc_ids_csv,
       array_to_string(list(o.chunk_id ORDER BY o.rn), ',') AS seg_chunk_ids_csv,
       array_to_string(list(o.n_tokens ORDER BY o.rn), ',') AS seg_tokens_csv,
       array_to_string(list(o.csum - o.n_tokens - b.base ORDER BY o.rn), ',')
           AS seg_offsets_csv
FROM blk b
JOIN ordered o ON o.grp = b.grp AND o.rn BETWEEN b.start_rn AND b.end_rn
GROUP BY b.grp, b.block_id, b.start_rn, b.end_rn, b.base, b.end_csum
"""


@register(
    "q_packed_segments",
    oracle=_packed_fold_ctes("doc_id, chunk_id") + _SEGMENTS_SELECT_SQL,
)
def q_packed_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block SEGMENT LAYOUT for packed training blocks (greedy
    order): the ordered (doc_id, chunk_id, n_tokens, start_offset)
    arrays a trainer turns into block-diagonal attention masks and
    per-document position-id resets — the standard metadata when
    multiple documents share one packed context window (without it,
    tokens attend across unrelated documents).  Arrays serialize to
    CSV strings (driver canonicalizer needs scalar columns, the
    q_packed_blocks convention); offsets are the exclusive prefix sum
    of segment lengths, so last offset + last length == total_tokens
    (pinned with the other invariants in tests/test_text.py).  Oracle:
    the same parameterized recursive-CTE fold as q_packed_blocks, with
    the final projection list-agging `ordered` rows rn-ordered within
    each block's (start_rn, end_rn) range — the layout is replayed
    value-exact, not just censused.  Scale shape: identical to
    pack_chunks (per-shard applyInPandas groups); the segment arrays
    add output columns, zero extra shuffles."""
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", F.col("source").alias("group")), "doc_id"
    )
    packed = pack_chunks(chunks, "group", block_tokens=256, emit_segments=True)
    csv = lambda c: F.concat_ws(",", F.transform(c, lambda x: x.cast("string")))
    return packed.select(
        "group",
        "block_id",
        "n_chunks",
        "total_tokens",
        csv("seg_doc_ids").alias("seg_doc_ids_csv"),
        csv("seg_chunk_ids").alias("seg_chunk_ids_csv"),
        csv("seg_tokens").alias("seg_tokens_csv"),
        csv("seg_offsets").alias("seg_offsets_csv"),
    )


@register(
    "q_packed_segments_nfd",
    oracle=_packed_fold_ctes("n_tokens DESC, doc_id, chunk_id") + _SEGMENTS_SELECT_SQL,
)
def q_packed_segments_nfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_packed_segments under strategy='nfd': the decreasing-order
    packing that cuts padding waste (q_packed_blocks_nfd) must also
    hand the trainer a correct segment layout — same shared fold CTEs
    with the order window swapped, same list-agg final SELECT, so the
    NFD layout is replayed value-exact too (the strategy changes
    COMPOSITION; the layout contract — lengths, exact prefix-sum
    offsets, exactly-once cover — is strategy-independent, pinned in
    tests/test_text.py for both)."""
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", F.col("source").alias("group")), "doc_id"
    )
    packed = pack_chunks(
        chunks, "group", block_tokens=256, strategy="nfd", emit_segments=True
    )
    csv = lambda c: F.concat_ws(",", F.transform(c, lambda x: x.cast("string")))
    return packed.select(
        "group",
        "block_id",
        "n_chunks",
        "total_tokens",
        csv("seg_doc_ids").alias("seg_doc_ids_csv"),
        csv("seg_chunk_ids").alias("seg_chunk_ids_csv"),
        csv("seg_tokens").alias("seg_tokens_csv"),
        csv("seg_offsets").alias("seg_offsets_csv"),
    )


@register(
    "q_packed_census",
    oracle=_PACKED_FOLD_SQL,
)
def q_packed_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing pipeline's ORACLE-BACKED census: the same chunk ->
    greedy-pack path as q_packed_blocks (operators/chunking.py ->
    operators/packing.py), checked value-exact against a DuckDB twin
    that replays the identical greedy fold as a recursive CTE over the
    per-group token cumsum (deterministic (doc_id, chunk_id) order
    makes the order-dependent fold SQL-expressible: each block's end is
    'count of rows with csum <= base + budget', clamped to at least one
    chunk — exactly pack_chunks' searchsorted). Every output column is
    scalar so the driver's canonicalizer can hash it."""
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", F.col("source").alias("grp")), "doc_id"
    )
    packed = pack_chunks(chunks, "grp", block_tokens=256)
    return packed.select(
        F.col("group").alias("grp"),
        "block_id",
        "n_chunks",
        "total_tokens",
        F.concat_ws(",", F.transform("doc_ids", lambda x: x.cast("string"))).alias(
            "doc_ids_csv"
        ),
    )


@register(
    "q_stratified_sample",
    oracle="""
SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_id
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc'
GROUP BY lang
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~30% sample per language stratum via md5-threshold
    on the id — unlike rand()/TABLESAMPLE, this is reproducible across
    engines, runs AND cluster sizes (the property a training-data
    pipeline needs for resumable corpus construction). The hex compare
    is uniform because md5 is; tune the threshold for other rates."""
    docs = load_table(spark, sf_dir, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < "4ccccccc"
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("min_id"))
    )


@register(
    "q_text_normalize",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_digest,
       length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_len
FROM documents
""",
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, collapse whitespace,
    trim) digested — the preprocessing step before exact dedup, so that
    case/spacing variants collapse to one digest. Pure codegen."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_digest"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@register(
    "q_tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
  SELECT count(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tf DESC, df ASC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf,
       round(score, 6) AS tfidf
FROM ranked WHERE rk <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword-extraction
    signal. One explode + two aggregates + a per-doc window; the DF
    (document frequency) side is a small dictionary joined broadcast-
    style by AQE. Ranking ties break by (tf, df, term) — integer-exact
    across engines, so the oracle can't drift on float ulps."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.count()  # one scalar, computed once at plan build
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("rk").cast("long").alias("rk"),
            "term",
            "tf",
            F.round("score", 6).alias("tfidf"),
        )
    )


@register(
    "q_repetition_ratio",
    oracle="""
WITH g AS (
  SELECT doc_id, t, len(t) - 1 AS total,
         len(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                                          i -> concat_ws(' ', t[i], t[i+1])))) AS dist
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 2
)
SELECT doc_id,
       CAST(total AS BIGINT) AS n_bigrams,
       round(1.0 - CAST(dist AS DOUBLE) / total, 6) AS repetition_ratio
FROM g
""",
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-bigram ratio per document (1 - distinct/total bigrams) —
    the standard boilerplate/spam signal in corpus quality filtering.
    Pure per-row codegen (array ops), no shuffle at all."""
    from cdc_demo_spark.operators.dedup import shingle_array_of_tokens
    from cdc_demo_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # token arrays projected before the shingle lambda (r11; SCALE.md)
    tok_docs = docs.select(
        "doc_id",
        F.split("text", " ").alias("__t1"),
        tokens(F.col("text")).alias("__t2"),
    )
    toks = F.col("__t1")
    total = (F.size(toks) - 1).cast("long")
    dist = F.size(shingle_array_of_tokens(F.col("__t2"), 2))
    return (
        tok_docs.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            total.alias("n_bigrams"),
            F.round(F.lit(1.0) - dist.cast("double") / total, 6).alias("repetition_ratio"),
        )
    )


@register(
    "q_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), cf AS (
  SELECT term, count(*) AS c FROM tok GROUP BY term
), tot AS (
  SELECT count(*) AS t FROM tok
)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       round(sum(ln(CAST(cf.c AS DOUBLE) / tot.t)) / count(*), 6) AS avg_logprob
FROM tok JOIN cf USING (term) CROSS JOIN tot
GROUP BY tok.doc_id
""",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average per-token unigram log-probability under the corpus's own
    unigram model — the cheapest perplexity-style quality signal (low
    score = rare-token gibberish, high = stereotyped boilerplate).
    One explode, one small dictionary join (AQE broadcasts it), one
    aggregate; the corpus total rides in as a literal-free cross join
    so the plan stays a single pass over tokens."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("t"))
    return (
        tok.join(cf, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("c").cast("double") / F.col("t"))) / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


@register(
    "q_quality_filter",
    oracle="""
WITH f AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_token_len,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS distinct_ratio
  FROM documents
)
SELECT doc_id, lang, source, n_tokens,
       round(mean_token_len, 6) AS mean_token_len,
       round(distinct_ratio, 6) AS distinct_ratio,
       CASE WHEN n_tokens < 25 THEN 'too_short'
            WHEN mean_token_len < 4.0 OR mean_token_len > 5.0 THEN 'token_len'
            WHEN distinct_ratio < 0.35 THEN 'repetitive'
            ELSE NULL END AS drop_reason,
       (n_tokens >= 25 AND mean_token_len >= 4.0 AND mean_token_len <= 5.0
        AND distinct_ratio >= 0.35) AS keep
FROM f
ORDER BY doc_id
""",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule cascade: compose per-doc quality features into
    a keep/drop verdict with the FIRST failing rule as the reason —
    the shippable form of a corpus quality filter (the features alone,
    q_text_quality, are the diagnostics view). Pure codegen
    projections; zero shuffle, trivially 100 TB-safe.  The keep
    verdict is the SHARED predicate the composed corpus pipeline
    filters with (operators/corpus_pipeline.quality_keep_expr, r13
    review finding #7: one copy, not two kept in sync by a test)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        DEFAULT_RULES,
        quality_keep_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    mtl = (F.length("text") - n_tokens + 1).cast("double") / n_tokens
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    reason = (
        F.when(n_tokens < 25, "too_short")
        .when((mtl < 4.0) | (mtl > 5.0), "token_len")
        .when(dr < 0.35, "repetitive")
        .otherwise(F.lit(None).cast("string"))
    )
    keep = quality_keep_expr("text", DEFAULT_RULES)
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        F.round(mtl, 6).alias("mean_token_len"),
        F.round(dr, 6).alias("distinct_ratio"),
        reason.alias("drop_reason"),
        keep.alias("keep"),
    ).orderBy("doc_id")


@register(
    "q_pii_mask",
    oracle="""
SELECT c_custkey,
       concat(
         regexp_replace(substring(c_name, 1, length(c_name) - 4),
                        '[0-9]', '*', 'g'),
         substring(c_name, length(c_name) - 3, 4)
       ) AS masked_name,
       CAST(length(regexp_replace(substring(c_name, 1, length(c_name) - 4),
                                  '[^0-9]', '', 'g')) AS BIGINT) AS n_masked
FROM customer
ORDER BY c_custkey
""",
)
def q_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking — the redaction pass a training-data pipeline
    runs before a corpus ships (account/phone-number shapes): every
    digit except the last four becomes '*', plus an audit count of
    masked digits.  Exercised on c_name's embedded account number (the
    fixture's only digit-bearing identity column).  Pure codegen string
    expressions (regexp_replace + substring), no UDF; at 100 TB this is
    a map-only pass that pipelines into the scan.  Spark's
    regexp_replace replaces ALL matches by default; the oracle passes
    DuckDB's 'g' flag for the same semantics — value-exact across
    engines."""
    cust = load_table(spark, sf_dir, "customer")
    head = F.expr("substring(c_name, 1, length(c_name) - 4)")
    tail = F.expr("substring(c_name, length(c_name) - 3, 4)")
    return cust.select(
        "c_custkey",
        F.concat(F.regexp_replace(head, "[0-9]", "*"), tail).alias("masked_name"),
        F.length(F.regexp_replace(head, "[^0-9]", "")).cast("long").alias("n_masked"),
    ).orderBy("c_custkey")


@register(
    "q_dup_ngram_fraction",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         toks[u.j + 1] || ' ' || toks[u.j + 2] || ' ' || toks[u.j + 3] || ' ' ||
         toks[u.j + 4] || ' ' || toks[u.j + 5] AS gram
  FROM t, UNNEST(range(greatest(len(toks) - 4, 0))) AS u(j)
),
df AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_fraction
FROM g JOIN df USING (gram)
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
)
def q_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram fraction per document (the RefinedWeb /
    Gopher-repetition corpus metric): the share of a doc's distinct
    5-gram set that also appears in at least one OTHER document —
    high values mark boilerplate/mirrored content that survives
    doc-level dedup.  Scale shape: one explode to (doc, gram) rows, a
    document-frequency aggregate on the gram key, one join back —
    every stage partial-aggregates and shuffles on the gram/doc keys;
    at 100 TB the df table is the big intermediate and would bucket by
    gram hash (here grams stay strings for oracle portability; the
    production variant would xxhash64 them like the shingle ops)."""
    docs = load_table(spark, sf_dir, "documents")
    # single-space split, projected before the lambda (inline split
    # re-evaluates per element: O(tokens^2), r11 finding; SCALE.md)
    tok_docs = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    g = tok_docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 5,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 4),
                    lambda j: T.gram_at(toks, j, 5),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    ).distinct()
    df = g.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.sum((F.col("nd") > 1).cast("long")).alias("n_dup")
    return (
        g.join(df, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), dup)
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_grams"), 6).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_linear_quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
tok AS (SELECT doc_id, u.w AS w FROM t, UNNEST(toks) AS u(w)),
feat AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1024 AS bucket
  FROM tok
),
weighted AS (
  SELECT doc_id,
         (CAST('0x' || substr(md5('w:' || CAST(bucket AS VARCHAR)), 1, 6)
               AS BIGINT) % 2001 - 1000) / 1000.0 AS wgt
  FROM feat
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(AVG(wgt), 6) AS score
FROM weighted
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q_linear_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring in the fastText shape — the filter
    every web-scale corpus runs (CCNet/LLaMA wiki-ref filtering): hash
    each token into a 1024-bucket feature space, look up a weight,
    average into a document score.  The WEIGHTS here are a
    deterministic md5-derived stand-in (the container has no model
    artifacts — same stance as the multimodal decode stubs): the
    deliverable is the scoring plumbing, which is exactly what a real
    exported linear model needs — hash features codegen-side, a
    broadcast weight lookup (here inlined as an expression; a real
    1024-row weight table would broadcast-join), one partial-agg
    average.  No Python anywhere; at 100 TB this is a map-side-only
    pass.  Value-exact against DuckDB: integer md5 buckets, integer
    stand-in weights over 1000.0, round(avg, 6)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")  # single-space: exact parity with the oracle's string_split
    tok = docs.select("doc_id", F.explode(toks).alias("w"))
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 1024
    )
    wgt = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 6),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    ) / 1000.0
    return (
        tok.select("doc_id", wgt.alias("wgt"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("wgt"), 6).alias("score"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_bm25_topk",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
tok AS (SELECT doc_id, u.w AS w FROM t, UNNEST(toks) AS u(w)),
dl AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(len AS DOUBLE)) AS avgdl FROM dl
),
q(term) AS (VALUES ('filter'), ('window'), ('merge')),
tf AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf
  FROM tok JOIN q ON tok.w = q.term
  GROUP BY doc_id, w
),
idf AS (
  SELECT term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term) d,
       stats s
),
scored AS (
  SELECT tf.doc_id,
         SUM(idf.idf * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / s.avgdl))) AS score
  FROM tf
  JOIN idf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS bm25
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT 20
""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck-Jones; the
    probabilistic-idf variant with k1=1.2, b=0.75) for a fixed 3-term
    query over the documents table, top 20 — the lexical-retrieval
    primitive of every RAG/eval pipeline, expressed as pure aggregates:
    one token explode shared by the length and term-frequency branches,
    a two-row broadcastable stats aggregate, and a per-(doc, term) sum.
    Deterministic top-k: ordered by the ROUNDED score then doc_id, so
    float ulps at the boundary can't reorder across engines (the
    q_unigram_logprob precedent shows ln() itself agrees to well under
    the 1e-6 round).  At 100 TB: the idf/stats side is bytes-sized and
    broadcasts; only the token explode shuffles, keyed by doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    tok = docs.select("doc_id", F.explode(toks).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("len").cast("double")).alias("avgdl"),
    )
    q = spark.createDataFrame([("filter",), ("window",), ("merge",)], "term string")
    tf = (
        tok.join(F.broadcast(q), tok.w == q.term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("len") / F.col("avgdl")))
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@register(
    "q_bigram_perplexity",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT doc_id, t[j] AS a, t[j+1] AS b
  FROM toks, UNNEST(range(1, len(t))) AS u(j)
  WHERE len(t) >= 2
), c2 AS (
  SELECT a, b, count(*) AS c FROM bg GROUP BY a, b
), c1 AS (
  SELECT a, sum(c) AS ctx FROM c2 GROUP BY a
), vocab AS (
  SELECT CAST(count(DISTINCT u.w) AS DOUBLE) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) u
)
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       round(exp(-sum(ln((c2.c + 0.5) / (c1.ctx + 0.5 * vocab.v))) / count(*)), 6)
         AS ppl
FROM bg
JOIN c2 USING (a, b)
JOIN c1 USING (a)
CROSS JOIN vocab
GROUP BY bg.doc_id
""",
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus's own add-k-smoothed
    bigram model — the CCNet/KenLM-shaped perplexity filter (documents
    whose text the corpus LM finds surprising are boilerplate,
    gibberish, or wrong-language; the filter drops the tail).  The
    unigram half is q_unigram_logprob; the operator is
    operators/text.bigram_perplexity — one explode to bigram grain,
    two count aggregates, the model joined back at bigram-key grain
    (AQE broadcasts the LM tables at this scale; at 100 TB the bigram
    table outgrows broadcast and the SAME plan runs hash-partitioned),
    one per-doc aggregate.  Documents with fewer than two tokens have
    no bigrams and are excluded by construction."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bigram_perplexity(docs).select(
        F.col("id").alias("doc_id"),
        "n_bigrams",
        F.round("ppl", 6).alias("ppl"),
    )


@register(
    "q_kneser_ney_perplexity",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT doc_id, lang, t[j] AS a, t[j+1] AS b
  FROM toks, UNNEST(range(1, len(t))) AS u(j)
  WHERE len(t) >= 2
), c2 AS (
  SELECT a, b, count(*) AS c FROM bg WHERE lang = 'en' GROUP BY a, b
), ctx AS (
  SELECT a, sum(c) AS ctx, count(*) AS n_after FROM c2 GROUP BY a
), cont AS (
  SELECT b, count(*) AS n_before FROM c2 GROUP BY b
), scal AS (
  SELECT CAST((SELECT count(*) FROM c2) AS DOUBLE) AS n,
         CAST((SELECT count(DISTINCT u.w)
               FROM (SELECT unnest(string_split(text, ' ')) AS w
                     FROM documents WHERE lang = 'en') u) AS DOUBLE) AS v
), probs AS (
  SELECT bg.doc_id, bg.lang,
         CASE WHEN ctx.ctx IS NOT NULL THEN
           greatest(CAST(coalesce(c2.c, 0) AS DOUBLE) - 0.75, 0.0) / ctx.ctx
           + (0.75 * ctx.n_after / ctx.ctx)
             * ((coalesce(cont.n_before, 0) + 1) / (scal.n + scal.v))
         ELSE (coalesce(cont.n_before, 0) + 1) / (scal.n + scal.v) END AS p
  FROM bg
  LEFT JOIN c2 USING (a, b)
  LEFT JOIN ctx USING (a)
  LEFT JOIN cont USING (b)
  CROSS JOIN scal
)
SELECT doc_id, lang,
       count(*) AS n_bigrams,
       round(exp(-sum(ln(p)) / count(*)), 6) AS ppl
FROM probs
GROUP BY doc_id, lang
""",
)
def q_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney perplexity, fit on the English slice
    and scored over the WHOLE multilingual pool — the actual CCNet
    filter shape (Wenzek et al., LREC 2020: KenLM fit on Wikipedia,
    Common Crawl kept by perplexity band; q_bigram_perplexity is the
    self-scored add-k sibling).  Backoff mass rides on CONTINUATION
    counts, so context-locked boilerplate scores low even when
    frequent; non-English documents hit the unseen-context backoff
    and land in the high-perplexity tail the filter exists to cut
    (operators/text.kneser_ney_perplexity carries the scale
    argument: model = three target-slice aggregates, scoring = the
    pool's bigram stream joined at bigram-key grain, broadcast while
    it fits, hash-partitioned beyond)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        T.kneser_ney_perplexity(docs, F.col("lang") == "en")
        .join(
            load_table(spark, sf_dir, "documents").select(
                F.col("doc_id").alias("id"), "lang"
            ),
            "id",
        )
        .select(
            F.col("id").alias("doc_id"),
            "lang",
            "n_bigrams",
            F.round("ppl", 6).alias("ppl"),
        )
    )


_BLOCKLIST = ["slow", "dup", "corrupt", "spill"]
_BLOCK_FRAC = 0.03


@register(
    "q_blocklist_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), hits AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         len(list_filter(t, x -> list_contains({_BLOCKLIST!r}, x)))
           AS n_blocked,
         len(list_distinct(list_filter(t, x -> list_contains({_BLOCKLIST!r}, x))))
           AS n_blocked_terms
  FROM toks
)
SELECT doc_id, n_tokens, n_blocked, n_blocked_terms,
       round(n_blocked * 1.0 / nullif(n_tokens, 0), 6) AS blocked_frac,
       coalesce(n_blocked * 1.0 / nullif(n_tokens, 0) > {_BLOCK_FRAC}, FALSE)
         AS blocked
FROM hits
""",
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TERM-BLOCKLIST filtering: every document reports how many of
    its tokens hit a curated blocklist, how many DISTINCT blocked
    terms appear, the blocked fraction, and a flag at 3% — the
    wordlist-based content filter every production corpus applies
    (C4's badwords list, RefinedWeb's URL/word filters) as a pure
    map-side expression.  The blocklist ships as an array literal
    folded per token (zero joins, zero shuffles — composes into any
    scan); a list too large for a plan literal flips to a broadcast
    semi-join at token grain, same output, one expression swap.
    Deterministic integer counts; the only float is the final ratio,
    rounded in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    base = docs.select("doc_id", toks.alias("__toks"))
    bl = F.lit(_BLOCKLIST)
    hit = F.filter(F.col("__toks"), lambda w: F.array_contains(bl, w))
    return base.select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(hit).cast("long").alias("n_blocked"),
        F.size(F.array_distinct(hit)).cast("long").alias("n_blocked_terms"),
        F.round(
            F.size(hit) / F.nullif(F.size("__toks"), F.lit(0)), 6
        ).alias("blocked_frac"),
        F.coalesce(
            F.size(hit) / F.nullif(F.size("__toks"), F.lit(0)) > _BLOCK_FRAC,
            F.lit(False),
        ).alias("blocked"),
    )
