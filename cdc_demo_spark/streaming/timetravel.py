"""CDC time travel: reconstruct a table's state as of any past instant
from the immutable bronze change log (A11 is append-only precisely so
this is possible; B19's as-of semantics applied to the whole table).

This is what the staging dataset buys the reference architecture — the
replica shows *now*, the log shows *any time* — and it falls out of the
same latest-image primitive as the merge.

Two complementary time-travel flavors (Delta offers the same pair):
this module reconstructs state AS OF AN EVENT TIME from the bronze
log (any instant, one log scan); merge.read_silver(version=N) reads a
COMMIT SNAPSHOT byte-identically from retained manifests (bounded
window, zero reconstruction).  Use the log for arbitrary instants and
audits; use snapshot versions for reproducible reads and the
changefeed."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_asof(bronze: DataFrame, at, table: str | None = None) -> DataFrame:
    """Row images as of time `at` (inclusive): for each key, the winning
    event with ts <= at; keys whose winner is a delete are absent.

    Cost: one filtered scan of the log (ts pushdown / partition pruning
    on a date-partitioned bronze) + one latest-per-key window — no state
    table needed."""
    ev = bronze.filter(F.col("ts") <= F.lit(at))
    if table is not None:
        ev = ev.filter(F.col("table") == table)
    w = Window.partitionBy("table", "key").orderBy(F.desc("ts"), F.desc("seq"))
    latest = ev.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return latest.filter(F.col("op") != "d").select("after.*")
