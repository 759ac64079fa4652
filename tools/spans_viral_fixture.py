"""Viral-boilerplate fixture for the spans operator (VERDICT r10 #5).

Two skew shapes over ~65-110k docs:

- ``mild``: 50k docs share a 5-token boilerplate unit repeated 20× —
  five viral grams at ~1M sites each (≈6× an average shuffle
  partition).  Both classic plans stay healthy here (r11 measured
  window 5.1 s / join 10.1 s).
- ``viral`` (default): 5k docs are ONE token repeated 5000× — every
  5-gram is the SAME gram, ~25M sites in one gram partition (~30× an
  average partition).  The padding-spam / boilerplate-wall shape that
  an adversarial or scraped corpus actually contains.

Usage:
    python tools/spans_viral_fixture.py [gram|window|join|hybrid]...

Each argument times one pass (the gram pass alone, or
duplicated_positions under that plan) and prints one line; run the
same plan twice for a steady-state number.

r11 history (viral shape, quiet host, min-of-2): BEFORE the
ngram_positions O(tokens²) fix, gram pass ~310 s and window/join/
hybrid = 334.8/625.8/909.7 s — the "degradation" the r10 verdict
asked this fixture to expose was the gram pass re-tokenizing per
position, not the window.  AFTER the fix: gram 11.5 s, window 24.5 s,
join 29.0 s, hybrid 35.2 s — the window plan wins even at one gram =
25M sites (~30× an average partition), because one task sorting 25M
hashed longs (~13 s) costs less than the hybrid's two extra map
passes.  The hybrid remains the documented knob for the regime where
one gram's sites exceed what a single task can sort+spill (cluster-
scale boilerplate walls); full analysis in SCALE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from cdc_demo_spark.operators.spans import (  # noqa: E402
    duplicated_positions,
    ngram_positions,
)
from cdc_demo_spark.session import get_spark  # noqa: E402


def build_fixture(spark, shape: str = "viral"):
    cold = spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"), F.conv(F.xxhash64(F.col("id") * 100 + i), 10, 16)
                ),
            ),
        ).alias("text"),
    )
    if shape == "viral":
        hot = spark.range(5_000).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.lit("vb"), 5000)).alias("text"),
        )
    else:  # mild
        unit = "vb_alpha vb_beta vb_gamma vb_delta vb_epsilon"
        hot = spark.range(50_000).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.lit(unit), 20)).alias("text"),
        )
    return cold.unionByName(hot).repartition(32).localCheckpoint(eager=True)


def main() -> None:
    modes = sys.argv[1:] or ["gram", "gram", "hybrid", "hybrid"]
    shape = "viral"
    spark = get_spark("spans-viral-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_fixture(spark, shape)
    print(f"shape={shape} docs={docs.count()}", flush=True)
    for mode in modes:
        t0 = time.perf_counter()
        if mode == "gram":
            n = ngram_positions(docs, "doc_id", "text", n=5, hashed=True).count()
        else:
            n = duplicated_positions(
                docs, "doc_id", "text", n=5, hashed=True, plan=mode
            ).count()
        print(f"{mode}: {time.perf_counter() - t0:.2f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
