"""As-of join (SURVEY.md §2 B19): latest right-side row at or before each
left-side timestamp, per key — CDC time travel ("row image as of t",
the batch form of the reference's merge semantics,
/root/reference/README.md:205).

Two implementations with very different scale profiles:

- ``asof_join`` (union + window): tag both sides, union, one window per
  key ordered by time, ``last(right_cols, ignorenulls=True)`` carries
  the most recent right row forward onto each left row.  Cost: ONE
  shuffle of |L|+|R| rows and a per-key sort — no pair blowup, no
  range-condition nested loop.  This is the 100 TB path.
- ``asof_join_via_range`` (join + row_number): the naive formulation —
  equi-join on key + range predicate, then keep rank 1.  Materializes
  every (left, right-before-it) pair before pruning; kept as the
  readable reference implementation and for differential testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_seq: str | None = None,
) -> DataFrame:
    """Scalable as-of left join.

    Output: all columns of `left` plus `right_cols` (NULL when no right
    row at-or-before the left timestamp exists for that key).

    Tie rule: a right row with right_ts == left_ts IS visible (at-or-
    before); among right rows with equal right_ts, the highest
    ``right_seq`` wins (pass a unique column for determinism — the CDC
    envelope's ``seq`` is exactly this, SURVEY.md §1.3).
    """
    lcols = left.columns
    # Carry the right row as ONE struct: per-column last() could stitch
    # together values from different right rows when a column is NULL.
    r_struct = F.struct(*[F.col(c) for c in right_cols]).alias("_rrow")
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(right.select(r_struct).schema["_rrow"].dataType).alias("_rrow"),
        F.lit(None).cast(right.schema[right_seq].dataType if right_seq else "long").alias("_seq"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        r_struct,
        (F.col(right_seq) if right_seq else F.lit(None).cast("long")).alias("_seq"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left", F.col("_seq").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_lrow",
        "_is_left",
        F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col("_rrow")[c].alias(c) for c in right_cols],
    )


def asof_join_via_range(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Naive as-of (equi-join + range filter + rank-1). Quadratic in
    rows-per-key; exists as the differential oracle for ``asof_join``."""
    lcols = left.columns
    r = right.select(
        F.col(on).alias("_rk"), F.col(right_ts).alias("_rt"),
        *[F.col(c) for c in right_cols],
    )
    joined = left.join(
        r, (F.col(on) == F.col("_rk")) & (F.col("_rt") <= F.col(left_ts)), "left"
    )
    order = [F.desc("_rt")] + ([F.desc(tie_break)] if tie_break else [])
    w = Window.partitionBy(*lcols).orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*lcols, *right_cols)
    )
