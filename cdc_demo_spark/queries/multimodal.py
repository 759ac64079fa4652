"""Multimodal + Pandas-UDF query surface (B48-B50, B54 plumbing).

These are rows-only checks for the driver (binary payloads are
generated in-engine, not part of the DuckDB view set), with full
roundtrip/shape assertions in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators import multimodal as M
from cdc_demo_spark.operators.pandas_udfs import median_by_group, zscore_per_group
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_media_features",
    oracle="""
-- From-first-principles replay of the fake-codec corpus (VERDICT r12
-- #7): pixel byte 16*b+j of item i = byte j of md5(i || ':' || b) (the
-- house engine-portable scheme), dims are pure functions of the id, so
-- the oracle regenerates every pixel WITHOUT the codec and recomputes
-- the integer moments the Arrow stage emits.  mean/std are exact-int
-- sums followed by the same IEEE ops as the engine -> bit-identical.
WITH items AS (
  SELECT i AS media_id,
         CASE WHEN i % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
         (16 + (i % 5) * 8) * (16 + (i % 7) * 8)
           * (CASE WHEN i % 3 = 0 THEN 8 ELSE 1 END) AS npx
  FROM generate_series(0, 199) t(i)
),
blocks AS (
  SELECT it.media_id, it.npx, s.b AS blk,
         md5(CAST(it.media_id AS VARCHAR) || ':' || CAST(s.b AS VARCHAR)) AS hx
  FROM items it JOIN generate_series(0, 1535) s(b) ON s.b * 16 < it.npx
),
bytes AS (
  SELECT media_id,
         CAST(('0x' || substr(hx, j.j * 2 + 1, 2)) AS BIGINT) AS v
  FROM blocks JOIN generate_series(0, 15) j(j) ON blk * 16 + j.j < npx
),
moments AS (
  SELECT media_id, sum(v) AS s1, sum(v * v) AS s2, count(*) AS n
  FROM bytes GROUP BY media_id
)
SELECT it.media_id, it.kind,
       CAST(m.s1 AS DOUBLE) / m.n AS mean_px,
       sqrt(greatest(
         CAST(m.s2 AS DOUBLE) / m.n
           - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n),
         0.0)) AS std_px,
       16 + it.npx AS n_bytes
FROM items it JOIN moments m USING (media_id)
""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode fake-codec media and extract per-item pixel stats through
    mapInPandas (the feature-extraction pipeline shape).  Oracle-exact
    since r13: the md5 pixel scheme lets DuckDB regenerate the corpus
    and replay the exact-integer-moment stats (operators/multimodal.py
    FakeImageCodec docstring)."""
    media = M.fake_media_table(spark, n=200)
    return M.extract_features(media)


@register(
    "q_media_pipeline",
    oracle="""
-- Replays the WHOLE preprocessing chain from first principles: sampled
-- frame g' = original frame 4*g' (sample_frames every=4; images pass
-- through), resized pixel (r',c') = original (2r', 2c') (stride
-- downsample; all dims even), original pixel p of item i = byte p%16
-- of md5(i || ':' || p//16).  The engine's sample -> resize -> decode
-- -> stats byte path must agree value-exactly with this direct map.
WITH items AS (
  SELECT i AS media_id,
         CASE WHEN i % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
         16 + (i % 5) * 8 AS h,
         16 + (i % 7) * 8 AS w
  FROM generate_series(0, 149) t(i)
),
dims AS (
  SELECT media_id, kind, h, w,
         CASE WHEN kind = 'video' THEN 2 ELSE 1 END AS f2,
         h // 2 AS h2, w // 2 AS w2
  FROM items
),
pos AS (
  SELECT d.media_id,
         (g.g * 4) * (d.h * d.w) + (r.r * 2) * d.w + (c.c * 2) AS p
  FROM dims d
  JOIN generate_series(0, 1) g(g) ON g.g < d.f2
  JOIN generate_series(0, 23) r(r) ON r.r < d.h2
  JOIN generate_series(0, 31) c(c) ON c.c < d.w2
),
vals AS (
  SELECT media_id,
         CAST(('0x' || substr(
           md5(CAST(media_id AS VARCHAR) || ':' || CAST(p // 16 AS VARCHAR)),
           (p % 16) * 2 + 1, 2)) AS BIGINT) AS v
  FROM pos
),
moments AS (
  SELECT media_id, sum(v) AS s1, count(*) AS n FROM vals GROUP BY media_id
)
SELECT d.media_id, d.kind,
       CAST(m.s1 AS DOUBLE) / m.n AS mean_px,
       16 + d.f2 * d.h2 * d.w2 AS n_bytes,
       doc.lang, doc.source
FROM dims d
JOIN moments m USING (media_id)
JOIN documents doc ON d.media_id = doc.doc_id
""",
)
def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame-sample → resize → feature-extract → join doc metadata:
    the full multimodal preprocessing chain, nothing on the driver.
    Oracle-exact since r13 (md5 pixel scheme — see q_media_features)."""
    media = M.fake_media_table(spark, n=150)
    processed = M.resize_half(M.sample_frames(media, every=4))
    feats = M.extract_features(processed)
    docs = load_table(spark, sf_dir, "documents")
    return feats.join(docs, feats.media_id == docs.doc_id).select(
        "media_id", "kind", "mean_px", "n_bytes", "lang", "source"
    )


@register(
    "q_audio_features",
    oracle="""
-- Regenerates the PCM stream from first principles: resampled sample
-- p of clip i = original sample 2p (stride-2 decimation, 16 kHz -> 8
-- kHz); original sample = ±16384 square tone (integer phase
-- accumulator) + md5 dither (FakeAudioCodec docstring).  rms replays
-- the exact integer sum-of-squares -> one division -> sqrt -> 2^-15
-- scale; crossings are sign flips of consecutive resampled samples.
WITH clips AS (
  SELECT i AS media_id, 200 + (i % 20) * 50 AS freq
  FROM generate_series(0, 99) t(i)
),
samples AS (
  SELECT c.media_id, s.p AS p,
         (CASE WHEN (((s.p * 2) * 2 * c.freq) // 16000) % 2 = 0
               THEN 1 ELSE -1 END) * 16384
         + (CAST(('0x' || substr(
              md5(CAST(c.media_id + 7000000 AS VARCHAR) || ':'
                  || CAST((s.p * 2) // 16 AS VARCHAR)),
              ((s.p * 2) % 16) * 2 + 1, 2)) AS BIGINT) - 128) * 8 AS v
  FROM clips c, generate_series(0, 1999) s(p)
),
paired AS (
  SELECT media_id, p, v,
         lead(v) OVER (PARTITION BY media_id ORDER BY p) AS vn
  FROM samples
)
SELECT media_id,
       CAST(count(*) AS DOUBLE) / 8000 AS duration_s,
       sqrt(CAST(CAST(sum(v * v) AS BIGINT) AS DOUBLE) / count(*)) / 32768.0 AS rms,
       CAST(sum(CASE WHEN v * vn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM paired GROUP BY media_id
""",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality: resample to 8 kHz then loudness/zero-crossing
    features — the audio twin of q_media_pipeline (decode verified
    against numpy in tests).  Oracle-exact since r13: integer square
    tone + md5 dither is SQL-replayable sample by sample."""
    audio = M.fake_audio_table(spark, n=100)
    return M.audio_features(M.resample_audio(audio, 8000))


@register(
    "q_grouped_median",
    oracle="""
SELECT event_type, median(value) AS median
FROM events GROUP BY event_type
""",
)
def q_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50 — exact per-group median via grouped-agg pandas UDF. DuckDB's
    median() on doubles is the exact same statistic, making this the one
    pandas-UDF operator with a value-exact oracle."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return median_by_group(ev, "event_type", "value")


@register(
    "q_zscore_normalize",
    oracle="""
SELECT event_id, user_id, value,
       ROUND((value - avg(value) OVER (PARTITION BY user_id)) /
             (CASE WHEN stddev_samp(value) OVER (PARTITION BY user_id) > 0
                   THEN stddev_samp(value) OVER (PARTITION BY user_id)
                   ELSE 1.0 END), 6) + 0.0 AS zscore
FROM events
""",
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49 — per-user z-score normalization via applyInPandas.
    Oracle-backed (was rows-only through r9): pandas' groupwise
    mean/std(ddof=1) and DuckDB's windowed avg/stddev_samp are the same
    statistic up to summation order (measured max divergence 2.7e-15 at
    sf0.001/sf0.01), so the registered query rounds the score to 6
    decimals — 9 orders of magnitude of margin — making the comparison
    engine-stable while the full-precision operator
    (operators/pandas_udfs.zscore_per_group) stays untouched.  The
    single-row/zero-variance guard (divide by 1.0) is mirrored in the
    CASE."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # + 0.0 on both sides: scores that round to zero from below must
    # not hash-mismatch on IEEE zero sign (-0.0 + 0.0 = +0.0)
    return zscore_per_group(ev, "user_id", "value").withColumn(
        "zscore", F.round(F.col("zscore"), 6) + F.lit(0.0)
    )
