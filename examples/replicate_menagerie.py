#!/usr/bin/env python
"""End-to-end demo: the reference pipeline, working, in one process.

    python examples/replicate_menagerie.py [workdir]

1. bootstrap the environment (the `terraform apply` analog)
2. initial snapshot of the menagerie pet table -> 'r' envelope events
3. scripted binlog deltas (the reference's "Changing Data" inserts,
   /root/reference/README.md:212-224) + one delete, landed as JSON
   change files
4. streaming pipeline drains them: DLQ / bronze append / silver merge
5. query the replica (the reporting surface) + time-travel the log
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdc_demo_spark.bootstrap import bootstrap
from cdc_demo_spark.session import get_spark
from cdc_demo_spark.sources.menagerie import PET_DELTAS, load_menagerie
from cdc_demo_spark.streaming.envelope import snapshot_as_events
from cdc_demo_spark.streaming.merge import read_silver
from cdc_demo_spark.streaming.pipeline import CdcPipeline
from cdc_demo_spark.streaming.timetravel import state_asof
from pyspark.sql.types import StringType, StructField, StructType

PAYLOAD = StructType(
    [StructField(c, StringType(), True)
     for c in ("name", "owner", "species", "sex", "birth", "death")]
)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="menagerie-")
    spark = get_spark("menagerie-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== bootstrap ({base})")
    bootstrap(spark, base)
    pipe = CdcPipeline(spark, base, {"pet": PAYLOAD})
    land = os.path.join(pipe.landing_dir, "pet")
    os.makedirs(land, exist_ok=True)

    print("== 1. snapshot: 8 pets -> 'r' events")
    pet = load_menagerie(spark)["pet"]
    snap = snapshot_as_events(
        pet.select(*[F.col(c).cast("string") for c in pet.columns]),
        "pet", key_cols=["name"], start_seq=0,
    )
    with open(os.path.join(land, "00-snapshot.json"), "w") as f:
        for r in snap.toJSON().collect():
            f.write(r + "\n")

    print("== 2. binlog deltas: 6 scripted inserts + 1 delete")
    evs = []
    for i, (name, owner, species, sex, birth, death) in enumerate(PET_DELTAS):
        evs.append({"op": "c", "ts": f"2021-08-01T12:00:{i:02d}", "seq": 100 + i,
                    "table": "pet", "key": name, "before": None,
                    "after": {"name": name, "owner": owner, "species": species,
                              "sex": sex, "birth": birth, "death": death}})
    evs.append({"op": "d", "ts": "2021-09-01T00:00:00", "seq": 200, "table": "pet",
                "key": "Puffball", "before": None, "after": None})
    with open(os.path.join(land, "01-deltas.json"), "w") as f:
        for e in evs:
            f.write(json.dumps(e) + "\n")

    print("== 3. drain the stream (bronze + silver merge)")
    pipe.run_available_now("pet")

    replica = read_silver(spark, pipe.silver_dir("pet"))
    print(f"== replica: {replica.count()} pets (8 + 6 - 1 deleted)")
    replica.orderBy("name").show(20, truncate=False)

    print("== 4. report: pets per species (the BigQuery-dataset role)")
    replica.groupBy("species").count().orderBy(F.desc("count")).show()

    print("== 5. time travel: state before the delete")
    bronze = spark.read.parquet(os.path.join(pipe.bronze_dir, "pet"))
    before = state_asof(bronze, datetime(2021, 8, 15), "pet")
    print(f"   as-of 2021-08-15: {before.count()} pets (Puffball still alive)")


if __name__ == "__main__":
    main()
