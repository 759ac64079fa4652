"""Batch + streaming sources and sinks (SURVEY.md §2 B1-B8)."""

from cdc_demo_spark.sources.tables import load_table, load_all, register_views  # noqa: F401
from cdc_demo_spark.sources.menagerie import read_tsv, load_menagerie  # noqa: F401
