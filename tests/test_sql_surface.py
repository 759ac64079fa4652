"""The interactive SQL surface (SURVEY.md §3.2 + A1/A2/A4/A5): DDL/DML
through spark.sql against bootstrap-created tables, mirroring the
reference's mysql-client session (README.md:62-119)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.bootstrap import bootstrap, teardown
from cdc_demo_spark.sources.formats import read_json
from cdc_demo_spark.sources.tables import register_views
from cdc_demo_spark.schemas import EVENTS


@pytest.fixture()
def db(spark, tmp_path):
    bootstrap(spark, str(tmp_path), db="t_menagerie")
    yield "t_menagerie"
    teardown(spark, db="t_menagerie")


def test_bootstrap_create_insert_truncate_drop(spark, db):
    # A1: tables exist with the registry schema
    cols = [r["col_name"] for r in spark.sql(f"DESCRIBE {db}.pet").collect()]
    assert cols[:6] == ["name", "owner", "species", "sex", "birth", "death"]
    # A4: literal INSERT
    spark.sql(
        f"INSERT INTO {db}.pet VALUES "
        "('Puffball','Diane','hamster','f',DATE'1999-03-30',NULL)"
    )
    assert spark.sql(f"SELECT count(*) c FROM {db}.pet").collect()[0]["c"] == 1
    # A5: full-table delete (load_pet_tbl.sql:2 `DELETE FROM pet`) —
    # overwrite from an empty literal select (external tables disallow
    # TRUNCATE, and overwrite-from-self is circular)
    spark.sql(
        f"INSERT OVERWRITE {db}.pet "
        "SELECT CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING), "
        "CAST(NULL AS STRING), CAST(NULL AS DATE), CAST(NULL AS DATE) WHERE false"
    )
    assert spark.sql(f"SELECT count(*) c FROM {db}.pet").collect()[0]["c"] == 0
    # A2: idempotent re-bootstrap is a no-op, not an error
    bootstrap(spark, "/tmp/ignored-rebootstrap", db=db)


def test_bootstrap_idempotent(spark, tmp_path):
    bootstrap(spark, str(tmp_path), db="t_idem")
    bootstrap(spark, str(tmp_path), db="t_idem")
    teardown(spark, db="t_idem")
    teardown(spark, db="t_idem")  # double-destroy is fine too


def test_sql_over_registered_views(spark, sf_dir):
    """§3.2 — the full SQL lifecycle over the analytic tables."""
    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 5
        """
    ).collect()
    assert len(out) == 5 and out[0]["n"] >= out[-1]["n"]


def test_batch_json_corrupt_capture(spark, tmp_path):
    """B3 + batch DLQ: malformed JSON rows surface in _corrupt."""
    path = str(tmp_path / "events.json")
    with open(path, "w") as f:
        f.write('{"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 2, '
                '"event_type": "a", "value": 1.5, "props": "{}"}\n')
        f.write("this is not json\n")
    # cache first: Spark disallows queries touching ONLY the corrupt
    # column against raw JSON (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    # RECORD_COLUMN) — same reason the streaming pipeline caches batches
    df = read_json(spark, path, EVENTS).cache()
    assert df.count() == 2
    assert df.filter(F.col("_corrupt").isNotNull()).count() == 1
    assert df.filter(F.col("_corrupt").isNull()).collect()[0]["event_id"] == 1


def test_avro_fallback_active_without_jar(spark, tmp_path):
    """Without the spark-avro jar the pure-Python codec serves reads —
    an empty dir is a loud FileNotFoundError, not a NotImplementedError
    stub (full roundtrip coverage lives in tests/test_avro.py)."""
    from cdc_demo_spark.sources.formats import avro_available, read_avro

    if avro_available(spark):  # pragma: no cover - jar present in some envs
        pytest.skip("avro module present; fallback not exercised")
    with pytest.raises(FileNotFoundError, match="no .avro files"):
        read_avro(spark, str(tmp_path))


def test_jdbc_reader_configured(spark):
    from cdc_demo_spark.sources.formats import jdbc_snapshot_reader

    reader = jdbc_snapshot_reader(
        spark, "jdbc:mysql://example/menagerie", "pet",
        partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=4,
    )
    assert reader is not None  # connection itself needs a live DB
