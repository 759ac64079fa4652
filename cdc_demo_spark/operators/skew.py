"""Skew-aware join (the 100 TB escape hatch when AQE isn't enough).

AQE's skew-join splitting (enabled in session.py) subdivides oversized
SORT-MERGE shuffle partitions, but it cannot split a skewed probe
against a broadcast build, and it reacts only after the straggler
materializes. Salting is the explicit fallback for the pathological
case: ONE join key so hot that a single task would still process it
(think `user_id = NULL`-like sentinel keys or a viral entity at 10⁹
rows).

``salted_join`` replicates the build side R times and scatters the
probe side across the R salt values, turning one hot partition into R
even ones. Semantics-preserving for inner/left equi-joins (each probe
row meets each matching build row exactly once — on its own salt);
right/full are rejected loudly because unmatched BUILD rows would
surface once per replica. Two driver queries prove the invariant
through the oracle gate: q_salted_skew_join (natural orders⋈customer)
and q_hot_key_salted_join (a deliberate 50%-hot key); balance is
pytest-asserted in tests/test_skew.py.

Cost model (when to salt): the build side's shuffle/broadcast volume
multiplies by `salt`, so salt when hot_key_rows / avg_partition_rows
exceeds that replication overhead — at 100 TB a single key holding 5%
of a fact table serializes 5% of the cluster behind one task, and
salt=32 turns it into 0.16% per task for a 32x-replicated (still
tiny) build side.

Reference anchor: the menagerie data model itself is skew-prone — pet
name is the de-facto join key (/root/reference/menagerie-db/pet.txt vs
event.txt) with no uniqueness constraint, so one popular pet owns an
unbounded share of events."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    scatter_col: str | None = None,
) -> DataFrame:
    """Equi-join `probe ⋈ build ON probe[on] == build[on]` with the hot
    probe side salted across `salt` sub-keys.

    build is replicated salt× (cheap when build << probe — the usual
    skew shape); probe rows get a deterministic salt from
    xxhash64(scatter_col) when given (a row id — cheapest), else from
    their whole-row content hash (always correct, costs a row
    serialization)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left equi-joins (got {how!r}): "
            "unmatched build rows would appear once per replica in right/full"
        )
    scatter = (
        F.xxhash64(F.col(scatter_col))
        if scatter_col
        else F.xxhash64(*probe.columns)
    )
    salted_probe = probe.withColumn(
        "_salt", F.pmod(scatter, F.lit(salt)).cast("int")
    )
    replicas = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_probe.join(replicas, [on, "_salt"], how)
    return out.drop("_salt")
