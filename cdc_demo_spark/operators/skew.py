"""Skew-aware join (the 100 TB escape hatch when AQE isn't enough).

AQE's skew-join splitting (enabled in session.py) handles most skew by
subdividing oversized shuffle partitions. Salting is the explicit
fallback for the pathological case AQE can't fix: ONE join key so hot
that a single task would still process it (think `user_id = NULL`-like
sentinel keys or a viral entity at 10⁹ rows).

``salted_join`` replicates the build side R times and scatters the
probe side across the R salt values, turning one hot partition into R
even ones. Semantics-preserving for inner equi-joins (each probe row
meets each matching build row exactly once — on its own salt)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe ⋈ build ON probe[on] == build[on]` with the hot
    probe side salted across `salt` sub-keys.

    build is replicated salt× (cheap when build << probe — the usual
    skew shape); probe rows get a deterministic salt from their row
    content hash, spreading any single key across salt partitions."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe.columns), F.lit(salt)).cast("int")
    )
    replicas = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_probe.join(replicas, [on, "_salt"], how)
    return out.drop("_salt")
