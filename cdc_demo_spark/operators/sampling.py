"""Deterministic weighted sampling (Efraimidis–Spirakis A-ES) for
corpus curation.

Quality-weighted subsampling — "keep 100k documents, preferring high
quality scores" — is a standard corpus-construction step.  The A-ES
scheme draws u ~ Uniform(0,1) per item and ranks by u^(1/w): the top-k
by that key is a weighted sample without replacement with inclusion
probabilities proportional to the weights of the race.  We replace the
random u with the engine's reproducibility primitive (textops/
corpusops idiom): u is derived from the first 15 hex digits of
md5(salt || id) — 60 uniform bits, exact in a double — so the sample
is identical across runs, engines, and cluster sizes, and a salt
change redraws it.

Ranking by u^(1/w) is order-equivalent to ranking by ln(u)/w
(both monotone transforms); we use the log form for numerical range.
Top-k uses orderBy+limit, which Spark plans as TakeOrderedAndProject —
per-partition heaps of size k, no global sort, no driver collect of
the corpus.  Not DuckDB-oracle-checkable (transcendental libm calls
may differ in the last ulp across engines), so the registered query is
rows-only and the semantics are pytest-proven (tests/test_sampling.py):
uniform weights degenerate to the unweighted md5 sample, raising a
member's weight never evicts it, non-positive weights never sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2**60 as a double divisor: 15 hex digits -> uniform in [0, 1)
_U_BITS = 15
_U_DIV = float(1 << (4 * _U_BITS))


def uniform_from_id(id_col: Column, salt: str) -> Column:
    """Deterministic u ~ Uniform(0,1) from md5(salt || id); strictly
    inside (0,1) so ln(u) is finite (the +1 offset avoids u=0)."""
    hx = F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, _U_BITS)
    return (F.conv(hx, 16, 10).cast("double") + F.lit(1.0)) / F.lit(_U_DIV + 2.0)


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = "s0"
) -> DataFrame:
    """Weighted sample without replacement of ``k`` rows; rows with
    non-positive weight are excluded.  Adds the race key as ``_key``
    (ties impossible in practice: 60 hash bits)."""
    w = F.col(weight_col).cast("double")
    u = uniform_from_id(F.col(id_col), salt)
    key = F.log(u) / w  # maximizing u^(1/w) == maximizing ln(u)/w (w>0)
    return (
        df.filter(w > 0)
        .withColumn("_key", key)
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(int(k))
    )
