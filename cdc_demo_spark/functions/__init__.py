"""Column-level helper functions (pure expressions, no UDFs)."""

from cdc_demo_spark.functions.vector import (  # noqa: F401
    dot,
    l2_norm,
    cosine,
    normalize,
)
