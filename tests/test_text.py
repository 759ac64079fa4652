"""Text-analysis operator tests (B53)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.operators import text as T
from cdc_demo_spark.sources.tables import load_table


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "a bb ccc dddd eeeee")], "id long, text string")
    row = df.select(
        T.token_count("text").alias("n"),
        T.bpe_ish_token_count("text").alias("bpe"),
    ).collect()[0]
    assert row["n"] == 5
    # ceil(len/4): 1,1,1,1,2 -> 6
    assert row["bpe"] == 6


def test_quality_features_ranges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = T.with_text_features(docs.limit(50))
    for r in feats.collect():
        assert 0 <= r["punct_ratio"] <= 1
        assert 0 <= r["alpha_ratio"] <= 1
        assert 0 <= r["stopword_ratio"] <= 1
        assert r["n_tokens"] > 0
        assert len(r["fingerprint"]) == 32


def test_predict_lang_prefers_stopword_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it was the best"),
            (2, "el perro y la casa de los gatos en un dia"),
            (3, "le chat et le chien dans les maisons des gens"),
            (4, "der hund und die katze ist von den leuten im haus"),
            (5, "qqq www zzz xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lg"] for r in df.select("id", T.predict_lang("text").alias("lg")).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_rolling_hash_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "abcdefghijklmnop"), (2, "abcdefghijklmnop")],
                               "id long, text string")
    vals = [r["f"] for r in df.select(T.rolling_hash_fingerprint("text").alias("f")).collect()]
    assert vals[0] == vals[1] and vals[0] is not None


def test_lang_id_query_runs_deterministically(spark, sf_dir):
    from cdc_demo_spark.queries import QUERIES

    a = sorted(map(tuple, QUERIES["q_lang_id"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["q_lang_id"](spark, sf_dir).collect()))
    assert a == b
