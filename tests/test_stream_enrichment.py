"""Stream-static join: enrich a live event stream with a dimension
table (the replica tables the CDC pipeline maintains are exactly such
dimensions — this closes the loop: silver feeds live enrichment)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.sources.tables import load_table
from tests.test_streaming_windows import SCHEMA, make_events, write_events


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    land = str(tmp_path / "events")
    write_events(land, make_events(100))
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    stream = spark.readStream.schema(SCHEMA).json(land)
    enriched = stream.join(F.broadcast(customers), "user_id", "left").groupBy(
        "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))

    q = (
        enriched.writeStream.format("memory").queryName("enriched")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r["c_mktsegment"]: r["n"] for r in spark.sql("SELECT * FROM enriched").collect()}
    batch = spark.read.schema(SCHEMA).json(land).join(F.broadcast(customers), "user_id", "left")
    want = {r["c_mktsegment"]: r["n"] for r in
            batch.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and sum(got.values()) == 100
