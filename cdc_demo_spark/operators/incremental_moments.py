"""Incremental moment-sum state — the distribution-drift ledger.

Fourth AdditiveLedger member (operators/additive_ledger.py), and the
one that exercises the base's multi-column SUM merge: per group it
keeps (n, Σy, Σy²) where y = round(value × scale) is an INTEGER-scaled
copy of the monitored metric, summed as DECIMAL(38,0).  That scaling
is what buys exactness: double addition does not commute bit-for-bit
across partitionings, so raw Σx/Σx² state could never satisfy the
family's incremental == one-shot contract, while integer sums are
associative exactly — any batch split of the corpus merges to the
bit-identical state, and mean/stddev derived from it are
deterministic doubles a SQL oracle reproduces token-for-token
(the same portability argument as q_moment_stats, queries/stats.py).

Operational use at 100 TB: per-crawl quality/length/score drift
monitoring — each crawl appends one grid of per-group sums (shuffles
≤ |groups| rows, never the corpus), the merged ledger answers "has
the mean/σ of group g moved" across ANY range of crawls, and the
superseding-checkpoint compaction keeps read cost flat.  Erasing a
document does not require unseeing its contribution to corpus-level
moments; where it ever did, rebuild from the surviving corpus (one
pass) — the same erasure stance as the Bloom ledger.

``scale`` is frozen into ``_meta.json``: sums recorded under
different scales are different units, so mixing raises.  Values are
dropped (never counted) when NULL/NaN/±Infinity/uncastable, the
family's junk policy.  Exactness bounds, explicit: |y| must stay
within 2^53 (y = round(value·scale) is computed as a double before
the decimal cast) and n·y² inside DECIMAL(38,0) — the caller picks
scale from domain knowledge, same as histogram bounds.  The square
itself is decimal×decimal, so the 2^53 bound is the rounding's, not
a double-multiplication artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators.additive_ledger import AdditiveLedger
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    CommitBackend,
    ConcurrentAppendError,
)

_DEC0 = "decimal(38,0)"


class MomentsIndex(AdditiveLedger):
    _TABLE = "moments"
    _SCHEMA = f"grp string, n long, s1 {_DEC0}, s2 {_DEC0}"
    _KEYS = ("grp",)
    _VALUES = ("n", "s1", "s2")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        scale: int = 100,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        if scale < 1:
            raise ValueError(f"scale must be a positive integer, got {scale}")
        super().__init__(spark, path, backend)
        self._freeze_meta({"kind": "moments", "scale": int(scale)})
        self.scale = int(scale)

    def moments(self) -> DataFrame:
        """The merged sums: (grp, n, s1, s2) — bit-identical to a
        one-shot aggregation of the union of all admitted batches."""
        return self.state()

    def append_batch(
        self,
        df: DataFrame,
        group_col: str,
        value_col: str,
        batch_id: int | None = None,
    ) -> bool:
        """Admit one batch's per-group moment sums.  NOT idempotent in
        content (sums add); ``batch_id`` keys the commit to a
        caller-owned stream epoch for exactly-once feeding; ownership
        and adoption rules are the base protocol's (see
        CountMinIndex.append_batch).  Returns True iff THIS call
        committed."""
        if not self._accepts(batch_id):
            return False  # epoch already committed — skip before the build
        v = F.col(value_col).try_cast("double")
        y = F.round(v * F.lit(self.scale))
        # ±Infinity is junk like NaN: counted-but-NULL-summed rows
        # would skew mean/stddev silently (inf casts to NULL decimal
        # under non-ANSI, F.sum skips it, F.count would not)
        finite = (
            F.col("v").isNotNull()
            & ~F.isnan("v")
            & (F.abs(F.col("v")) != F.lit(float("inf")))
        )
        # the square is DECIMAL×DECIMAL, not double×double: y is exact
        # as a double up to 2^53, but y·y in doubles is exact only to
        # y ≤ 2^26.5 ≈ 9.4e7 — squaring in decimal(19,0) (product
        # precision 38) carries the bit-exact contract all the way to
        # the 2^53 bound the rounding itself imposes
        y19 = F.col("y").cast("decimal(19,0)")
        state = (
            df.select(F.col(group_col).cast("string").alias("grp"), v.alias("v"), y.alias("y"))
            .filter(finite)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("y").cast(_DEC0)).alias("s1"),
                F.sum((y19 * y19).cast(_DEC0)).alias("s2"),
            )
        )
        return self._append_state(state, batch_id)

    def stats(self) -> DataFrame:
        """(grp, n, mean, stddev) from the merged sums — sample
        stddev via n·Σy² − (Σy)², every double op in a fixed order so
        a SQL oracle reproduces the values bit-for-bit.  Groups with
        n = 1 report NULL stddev (the n−1 denominator), never a
        divide-by-zero."""
        m = self.moments()
        nd = F.col("n").cast("double")
        s1 = F.col("s1").cast("double")
        s2 = F.col("s2").cast("double")
        mean = s1 / nd / F.lit(float(self.scale))
        var = (nd * s2 - s1 * s1) / (nd * (nd - F.lit(1.0)))
        std = F.sqrt(var) / F.lit(float(self.scale))
        return m.select(
            "grp",
            "n",
            mean.alias("mean"),
            F.when(F.col("n") > 1, std).alias("stddev"),
        )


def moments_sink(index: MomentsIndex, group_col: str, value_col: str):
    """foreachBatch adapter: ``.writeStream.foreachBatch(moments_sink(
    idx, "lang", "quality"))`` maintains the drift ledger from a
    stream with exactly-once sums."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(batch_df, group_col, value_col, batch_id=int(batch_id))

    return process
