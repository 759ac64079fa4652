"""Pandas-UDF tier (B48-B50): the Arrow-vectorized escape hatch.

Rule of thumb enforced across this engine: hot-path operators are JVM
expressions (see functions/vector.py, operators/text.py); Python enters
only where expressions genuinely cannot express the logic (exact
per-group quantiles, learned models, codec libraries). When it does,
it enters through Arrow batches — scalar ``pandas_udf``, grouped-agg
``pandas_udf``, or ``applyInPandas`` — never row-at-a-time Python UDFs
(10-100× slower; the benchmark comparison lives in the tests).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# --- B48: scalar (series -> series), Arrow-batched -------------------------


@pandas_udf(DoubleType())
def vowel_ratio(text: pd.Series) -> pd.Series:
    """Fraction of vowels per string — a stand-in for 'python-only'
    per-value logic; each call receives a whole Arrow batch."""
    low = text.str.lower()
    return low.str.count("[aeiou]") / low.str.len().replace(0, pd.NA).astype("Float64")


# --- B50: grouped-agg (series -> scalar) -----------------------------------


@pandas_udf(DoubleType())
def exact_median(v: pd.Series) -> float:
    """Exact median — quantiles don't decompose into partial aggregates,
    so this is a genuine pandas-UDF use case (Spark's builtin is the
    approximate percentile_approx)."""
    return float(v.median())


# --- B49: grouped-map (DataFrame per group -> DataFrame) -------------------


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key z-score normalization via applyInPandas. Each key's rows
    must fit one worker's memory — acceptable for per-user/per-entity
    groups; for giant keys use the expression form:
    (x - avg) / stddev over a Window."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", zscore double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value].std(ddof=1)
        pdf = pdf.copy()
        pdf["zscore"] = (pdf[value] - pdf[value].mean()) / (sd if sd and sd > 0 else 1.0)
        return pdf

    return df.groupBy(key).applyInPandas(norm, schema=out_schema)


def median_by_group(df: DataFrame, key: str, value: str) -> DataFrame:
    return df.groupBy(key).agg(exact_median(F.col(value)).alias("median"))
