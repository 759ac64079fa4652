"""Entity-resolution blocking: edit-distance-1 pair generation that is
PROVABLY lossless via pigeonhole segment blocking, replacing the
single-prefix block whose recall depended on the name format.

The scheme (the segment idea behind PassJoin, Li et al., and q-gram
prefix blocking): emit TWO block keys per record —

    P-pass: first k characters            (covers edits at position > k)
    S-pass: last  k characters            (covers edits at position <= len-k)

For strings of length >= 2k, any single edit (substitution, insert,
delete) lies at some position p; p > k leaves the first k characters
intact, and p <= len-k leaves the last k characters — as a STRING —
intact even when an indel shifts their offsets. len >= 2k makes the two
intervals cover every p, so every qualifying pair shares at least one
block key: the union of the two passes is lossless, not heuristic.
(The old 15-char prefix block missed any pair edited in the first 15
characters.)

Scale shape is unchanged: block key = shuffle key, per-block fan-out
bounded by block size, two slim passes instead of one, dedup on the
pair id. Levenshtein evaluates only inside blocks. A skew guard on
block cardinality slots in exactly like the LSH max_bucket guard."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    k: int = 8,
    max_dist: int = 1,
) -> DataFrame:
    """(id_a, id_b, edit_dist) for all pairs within ``max_dist`` edits
    — lossless for ``max_dist=1`` when every string has len >= 2k
    (shorter corpora: pick k <= min_len/2).

    Two blocking passes (prefix-k, suffix-k) unioned before exact
    Levenshtein verification; pairs sharing both keys dedup on the id
    pair."""
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    passes = []
    for key in (
        F.substring("name", 1, k),
        F.substring(F.col("name"), -k, k),
    ):
        blocked = base.withColumn("blk", key)
        a = blocked.select(
            F.col("id").alias("id_a"), F.col("name").alias("name_a"), "blk"
        )
        b = blocked.select(
            F.col("id").alias("id_b"), F.col("name").alias("name_b"), "blk"
        )
        passes.append(
            a.join(b, "blk").filter(F.col("id_a") < F.col("id_b")).drop("blk")
        )
    cand = passes[0].unionByName(passes[1]).dropDuplicates(["id_a", "id_b"])
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.filter(dist <= max_dist)
        .select("id_a", "id_b", dist.cast("long").alias("edit_dist"))
    )
