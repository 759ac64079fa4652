"""Plan introspection helpers (SURVEY.md §4: verify, don't reimplement)."""

from cdc_demo_spark.plans.inspect import (  # noqa: F401
    physical_plan,
    pushed_filters,
    scan_columns,
    has_broadcast_join,
    shuffle_count,
    assert_no_cartesian,
    unpartitioned_window_specs,
)
