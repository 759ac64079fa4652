"""Multimodal pipeline tests (B54): codec roundtrip, mapInPandas stage
shapes, pandas-UDF tier (B48-B50)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators import multimodal as M
from cdc_demo_spark.operators.pandas_udfs import vowel_ratio, zscore_per_group
from cdc_demo_spark.sources.tables import load_table


def test_codec_roundtrip():
    payload = M.FakeImageCodec.encode(42, width=24, height=16, n_frames=3)
    px = M.FakeImageCodec.decode(payload)
    assert px.shape == (3, 16, 24)
    # deterministic: same id -> same bytes
    assert payload == M.FakeImageCodec.encode(42, 24, 16, 3)


def test_real_decode_is_gated():
    with pytest.raises((NotImplementedError, Exception)):
        M.decode_real_image(b"\xff\xd8\xff")  # no PIL in this container


def test_fake_media_table_distributed(spark):
    media = M.fake_media_table(spark, n=60)
    rows = media.collect()
    assert len(rows) == 60
    for r in rows[:5]:
        px = M.FakeImageCodec.decode(bytes(r["payload"]))
        assert px.shape == (r["n_frames"], r["height"], r["width"])
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "video"}


def test_extract_features_matches_numpy(spark):
    media = M.fake_media_table(spark, n=30)
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert len(feats) == 30
    for mid in (0, 7, 13):
        px = M.FakeImageCodec.decode(
            bytes(media.filter(F.col("media_id") == mid).collect()[0]["payload"])
        )
        assert abs(feats[mid]["mean_px"] - float(px.mean())) < 1e-9
        assert abs(feats[mid]["std_px"] - float(px.std())) < 1e-9


def test_resize_halves_dims(spark):
    media = M.fake_media_table(spark, n=20)
    orig = {r["media_id"]: r for r in media.collect()}
    small = {r["media_id"]: r for r in M.resize_half(media).collect()}
    for mid, r in small.items():
        assert r["width"] == (orig[mid]["width"] + 1) // 2
        assert r["height"] == (orig[mid]["height"] + 1) // 2
        px = M.FakeImageCodec.decode(bytes(r["payload"]))
        assert px.shape == (r["n_frames"], r["height"], r["width"])


def test_sample_frames(spark):
    media = M.fake_media_table(spark, n=21, frames_for_video=8)
    sampled = M.sample_frames(media, every=4)
    for r in sampled.collect():
        assert r["n_frames"] == (2 if r["kind"] == "video" else 1)


def test_multimodal_join_keeps_payload_opaque(spark, sf_dir):
    media = M.fake_media_table(spark, n=50)
    docs = load_table(spark, sf_dir, "documents")
    joined = M.media_with_doc_metadata(media, docs)
    assert joined.count() == 50
    assert "payload" not in joined.columns  # metadata-only projection


# --- pandas-UDF tier -------------------------------------------------------


def test_scalar_pandas_udf_matches_expression(spark, sf_dir):
    """B48: the Arrow-batched UDF must agree with the pure-JVM expression."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    both = docs.select(
        vowel_ratio("text").alias("py"),
        (
            (F.length("text") - F.length(F.regexp_replace(F.lower("text"), "[aeiou]", "")))
            / F.length("text")
        ).alias("jvm"),
    ).collect()
    for r in both:
        assert abs(r["py"] - r["jvm"]) < 1e-12


def test_zscore_per_group_properties(spark):
    df = spark.createDataFrame(
        [(i, i % 3, float(i) * 2 + (i % 5)) for i in range(90)], "id long, k int, v double"
    )
    out = zscore_per_group(df, "k", "v").toPandas()
    assert len(out) == 90
    g = out.groupby("k")["zscore"]
    assert (g.mean().abs() < 1e-9).all()
    assert ((g.std(ddof=1) - 1).abs() < 1e-9).all()


# --- audio modality --------------------------------------------------------


def test_audio_codec_roundtrip():
    payload = M.FakeAudioCodec.encode(5, sample_rate=16000, seconds=0.25)
    rate, samples = M.FakeAudioCodec.decode(payload)
    assert rate == 16000 and len(samples) == 4000
    assert payload == M.FakeAudioCodec.encode(5, 16000, 0.25)


def test_audio_features_match_numpy(spark):
    import numpy as np

    audio = M.fake_audio_table(spark, n=20)
    feats = {r["media_id"]: r for r in M.audio_features(audio).collect()}
    assert len(feats) == 20
    rate, s = M.FakeAudioCodec.decode(M.FakeAudioCodec.encode(3))
    x = s.astype(np.float64) / 32768.0
    assert abs(feats[3]["rms"] - float(np.sqrt((x ** 2).mean()))) < 1e-12
    assert feats[3]["duration_s"] == len(s) / rate
    # a ~350 Hz tone over 0.25 s crosses zero ~2*350*0.25 times
    assert 100 < feats[3]["zero_crossings"] < 300


def test_audio_resample_halves_rate(spark):
    audio = M.fake_audio_table(spark, n=10)
    small = {r["media_id"]: r for r in M.resample_audio(audio, 8000).collect()}
    for r in small.values():
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == 2000
        rate, s = M.FakeAudioCodec.decode(bytes(r["payload"]))
        assert rate == 8000 and len(s) == 2000


def test_bilinear_resize_math(spark):
    """Bilinear properties: a constant frame stays constant at any size;
    a linear ramp stays (approximately) linear; output dims honored."""
    import numpy as np

    from cdc_demo_spark.operators.multimodal import _bilinear

    const = np.full((20, 12), 77, dtype=np.uint8)
    out = _bilinear(const, 9, 17)
    assert out.shape == (9, 17) and set(out.ravel()) == {77}

    ramp = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (8, 1))  # 8x24 ramp
    up = _bilinear(ramp, 8, 48).astype(float)
    diffs = np.diff(up[0])
    assert (diffs >= 0).all()  # monotone along the ramp
    assert abs(up[0, 0] - ramp[0, 0]) <= 10 and abs(up[0, -1] - ramp[0, -1]) <= 10


def test_patch_embeddings_feed_similarity(spark):
    """media -> patch embedding -> cosine top-k: the embedding column
    has the declared shape, is normalized, and an identical payload
    (same media_id content) is its own nearest neighbor."""
    from cdc_demo_spark.operators.multimodal import fake_media_table, patch_embeddings
    from cdc_demo_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    media = fake_media_table(spark, n=40)
    emb = patch_embeddings(media, side=16, patch=4).cache()
    rows = emb.limit(5).collect()
    assert all(len(r["embedding"]) == 16 for r in rows)  # (16/4)^2 patches
    import numpy as np

    v = np.array(rows[0]["embedding"])
    assert abs(v.mean()) < 1e-6 and abs(v.std() - 1.0) < 1e-5  # normalized

    q = emb.filter(F.col("media_id") < 3).select(
        F.col("media_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top1 = brute_force_topk(
        emb.select(F.col("media_id").alias("vec_id"), "embedding"), q, k=1
    )
    for r in top1.collect():
        assert r["vec_id"] == r["query_id"] and abs(r["cos_sim"] - 1.0) < 1e-6
