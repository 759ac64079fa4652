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


@register("q_media_features")  # no oracle: binary corpus is engine-generated
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode fake-codec media and extract per-item pixel stats through
    mapInPandas (the feature-extraction pipeline shape)."""
    media = M.fake_media_table(spark, n=200)
    return M.extract_features(media)


@register("q_media_pipeline")  # no oracle: binary corpus is engine-generated
def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame-sample → resize → feature-extract → join doc metadata:
    the full multimodal preprocessing chain, nothing on the driver."""
    media = M.fake_media_table(spark, n=150)
    processed = M.resize_half(M.sample_frames(media, every=4))
    feats = M.extract_features(processed)
    docs = load_table(spark, sf_dir, "documents")
    return feats.join(docs, feats.media_id == docs.doc_id).select(
        "media_id", "kind", "mean_px", "n_bytes", "lang", "source"
    )


@register("q_audio_features")  # no oracle: binary corpus is engine-generated
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality: resample to 8 kHz then loudness/zero-crossing
    features — the audio twin of q_media_pipeline (decode verified
    against numpy in tests)."""
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
