"""Loader canonicalization (SURVEY.md §2 B1).

Pins the contract VERDICT r4 flagged: whatever dtype the runtime's
parquet reader produces for the events fixture's timestamp[us]
(isAdjustedToUTC=false) column — int64 nanos under legacy 3.x confs,
TIMESTAMP_NTZ on Spark 4.x — ``load_table`` must hand downstream code
a plain ``TimestampType``.  The r4 regression (q_ohlc_bars /
q_session_window / q_range_frame_sum all erring on ``unix_micros(ntz)``)
fails HERE first on the next runtime drift.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from cdc_demo_spark import schemas
from cdc_demo_spark.sources.tables import load_table


def test_events_ts_is_canonical_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)


def test_events_ts_instants_match_raw_ntz_micros(spark, sf_dir):
    """The canonical ts must denote the SAME microsecond instants the file
    stores (UTC session zone => NTZ->TIMESTAMP is a relabel, not a shift)."""
    import os

    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw_dt = raw.schema["ts"].dataType
    if not isinstance(raw_dt, TimestampNTZType):
        return  # legacy scan path; covered by the nanos branch + oracles
    got = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .select(F.unix_micros("ts").alias("us"))
        .limit(5)
        .collect()
    )
    want = (
        raw.orderBy("event_id")
        .select(
            # NTZ has no unix_micros; epoch diff in µs via raw interval math
            (F.col("ts").cast("timestamp_ntz") - F.lit(datetime.datetime(1970, 1, 1)))
            .cast("interval day to second")
            .alias("iv")
        )
        .limit(5)
        .collect()
    )
    # exact integer micros — int(total_seconds()*1e6) truncates 1µs low
    # for ~1.3% of values (float rounds twice)
    want_us = [r.iv // datetime.timedelta(microseconds=1) for r in want]
    assert [r.us for r in got] == want_us


def test_all_tables_load_with_registry_schema(spark, sf_dir):
    for name in schemas.TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.limit(1).count() >= 0, name
