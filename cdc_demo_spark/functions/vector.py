"""Vector math over ``array<float>`` columns as pure Catalyst expressions.

Everything here compiles to JVM higher-order functions (``zip_with``,
``aggregate``, ``transform``) — no Python crossing, no UDF. At 100 TB
this is the difference between a columnar scan feeding codegen and an
Arrow round-trip per batch; the Pandas-UDF route is kept only as a
benchmark comparison point in tests.

Floating-point note: ``aggregate`` folds the array left-to-right, the
same order DuckDB's ``list_sum``/``list_transform`` use, so results are
bit-identical across the engines — which is what lets the similarity
queries carry full-precision oracles (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays, accumulated in double."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def normalize(a: Column | str) -> Column:
    """Unit-normalize a float array (stays array<double>). Pre-normalizing
    a corpus once turns every cosine into a plain dot product — the right
    trade at scale (one pass now, cheaper similarity forever)."""
    a = F.col(a) if isinstance(a, str) else a
    n = F.nullif(l2_norm(a), F.lit(0.0))
    return F.transform(a, lambda x: x.cast("double") / n)
