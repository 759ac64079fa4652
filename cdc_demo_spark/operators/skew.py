"""Hot-key skew mitigation: salted joins, the manual technique AQE's
skew-join covers only partially.

AQE splits skewed SORT-MERGE partitions at runtime
(spark.sql.adaptive.skewJoin.*), but it cannot split a skewed
BROADCAST-probe build, and it reacts after a straggler materializes.
Salting fixes the layout up front: replicate the small side N ways,
scatter the big side's rows across the N copies, and the hot key's
probe work spreads over N tasks by construction.  The join RESULT is
provably unchanged — salting only refines the partition function; each
big-side row still meets exactly one copy of its dimension row
(q_skew_salted_join's oracle is the plain unsalted join, so the
driver's value-exact gate is the equality proof; the balance property
is pytest-asserted).

Cost model (when to salt): the small side's shuffle/broadcast volume
multiplies by n_salt, so salt when  skew_factor = hot_key_rows /
avg_partition_rows  exceeds n_salt's replication overhead — at 100 TB a
single hot key holding 5% of a fact table serializes 5% of the cluster
behind one task, and n_salt=32 turns that into 0.16% per task for a
32x-replicated (still tiny) dimension.

Reference anchor: the menagerie data model itself is skew-prone — pet
name is the de-facto join key (/root/reference/menagerie-db/pet.txt vs
event.txt) with no uniqueness constraint, so one popular pet owns an
unbounded share of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    scatter_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key probe work
    scattered across ``n_salt`` sub-partitions per key.

    - ``small`` is replicated n_salt ways (explode over 0..n_salt-1);
    - ``big`` rows pick ONE salt deterministically:
      pmod(xxhash64(scatter_col), n_salt) — any roughly-unique column
      works (a row id, an event id); with None, xxhash64 over ALL big
      columns (always correct, costs a row serialization).
    - join key becomes (key, salt); each big row meets exactly one
      replica of its dimension row, so the result multiset equals the
      unsalted join for inner/left joins (right/full would over-count
      unmatched SMALL rows n_salt times — rejected loudly).

    Scale shape: shuffle currency grows by one int column; the small
    side's volume multiplies by n_salt (see module docstring for the
    when-to-salt cost model)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left (got {how!r}): unmatched "
            "small-side rows would appear once per replica in right/full"
        )
    scatter = (
        F.xxhash64(F.col(scatter_col))
        if scatter_col
        else F.xxhash64(*[F.col(c) for c in big.columns])
    )
    b = big.withColumn("__salt", F.pmod(scatter, F.lit(n_salt)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
