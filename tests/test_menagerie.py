"""Golden-fixture tests against the reference's own menagerie data
(SURVEY.md §5: pet.txt/event.txt with MySQL LOAD DATA conventions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.sources.menagerie import (
    load_menagerie,
    load_menagerie_with_deltas,
)


def test_pet_loads_with_null_conventions(spark):
    pet = load_menagerie(spark)["pet"]
    rows = {r["name"]: r for r in pet.collect()}
    assert len(rows) == 8  # pet.txt:1-8
    # explicit \N nulls (pet.txt:4-8 death; pet.txt:7 sex)
    assert rows["Fang"]["death"] is None
    assert rows["Whistler"]["sex"] is None
    assert str(rows["Fluffy"]["death"]) == "2015-01-09"
    assert str(rows["Buffy"]["birth"]) == "2009-05-13"


def test_event_ragged_rows_pad_null(spark):
    ev = load_menagerie(spark)["event"]
    assert ev.count() == 10  # event.txt:1-10
    # kennel rows carry only 3 of 4 fields -> remark NULL (event.txt:6-7)
    kennel = ev.filter(F.col("type") == "kennel").collect()
    assert len(kennel) == 2 and all(r["remark"] is None for r in kennel)


def test_insert_values_and_puffball(spark):
    pet = load_menagerie_with_deltas(spark)["pet"]
    assert pet.count() == 8 + 6
    puff = pet.filter(F.col("name") == "Puffball").collect()
    assert len(puff) == 1
    assert puff[0]["species"] == "hamster"
    assert str(puff[0]["birth"]) == "1999-03-30"  # cast string->date worked


def test_clyde_dangling_reference_survives_joins(spark):
    """README.md:100 inserts pet 'Cyde'; README.md:108 events reference
    'Clyde'. Anti/outer joins must surface the orphan (B14/B15)."""
    t = load_menagerie_with_deltas(spark)
    orphans = (
        t["event"].join(t["pet"], t["event"]["name"] == t["pet"]["name"], "left_anti")
    )
    names = {r["name"] for r in orphans.collect()}
    assert names == {"Clyde"}
    # and the outer join NULL-extends rather than dropping
    outer = t["event"].alias("e").join(
        t["pet"].alias("p"), F.col("e.name") == F.col("p.name"), "left"
    )
    clyde = outer.filter(F.col("e.name") == "Clyde").collect()
    assert len(clyde) == 2 and all(r["species"] is None for r in clyde)
