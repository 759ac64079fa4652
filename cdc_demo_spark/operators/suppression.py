"""Suppression ledger — the GDPR-complete arm of pair-index erasure.

``erase()`` on the pair indexes (MinHashIndex / SemanticIndex /
IvfIndex) removes an id's bytes from state and output, but by itself
it cannot stop the id from RE-ENTERING as legitimate new data in a
later batch — the indexes documented that gap since the erasure work
landed.  Silver closed the same gap with a per-table erased-key ledger
(streaming/erasure.py: record_erased_key + every pipeline write path
re-filters against it).  This module is the pair-index mirror:

- ``erase(ids, suppress=True)`` records the ids here FIRST, then runs
  the superseding-checkpoint erase.  Ordering matters: an append that
  starts after the record observes the ledger and drops the ids, so
  the erase's own verify pass converges instead of chasing racing
  re-admissions forever.
- Every ``append_batch`` anti-joins its input against the ledger
  before shingling / quantizing / assigning — a suppressed id never
  reaches probe state, tiles, or the pairs log again.

Storage is the commit-metadata idiom (storage.py): one immutable JSON
object per ``record()`` call, content-hash named so a replayed record
is a no-op, published with put-if-absent — portable to object stores
like every other marker.  The ledger is TAKEDOWN-scale metadata (court
orders, GDPR requests: thousands of ids, not corpus-scale), read
driver-side and applied as one broadcast anti-join per append (no
shuffle of the batch); a loud cap refuses silent degradation if a
caller abuses it as a corpus-scale filter.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_demo_spark.storage import DEFAULT_BACKEND, CommitBackend

SUPPRESSED_DIR = "_suppressed"

# Past this the broadcast-literal plan stops being the right physical
# strategy (the ledger would need to live as a parquet side of a real
# join); refuse loudly rather than degrade silently.
MAX_LEDGER_IDS = 2_000_000


class SuppressionLedger:
    """Append-only set of suppressed ids under ``<index>/_suppressed``."""

    def __init__(self, index_path: str, backend: CommitBackend = DEFAULT_BACKEND):
        self.dir = os.path.join(index_path, SUPPRESSED_DIR)
        self.backend = backend

    def record(self, ids) -> None:
        """Durably add ids (idempotent: the entry name is the content
        hash, so replaying the same takedown publishes nothing new)."""
        ids = sorted({int(i) for i in ids})
        if not ids:
            return
        payload = json.dumps(ids).encode()
        name = "sup-" + hashlib.md5(payload).hexdigest()[:16] + ".json"
        self.backend.put_if_absent(os.path.join(self.dir, name), payload)

    def ids(self) -> set[int]:
        out: set[int] = set()
        for name in self.backend.list_dir(self.dir):
            if name.startswith("sup-") and name.endswith(".json"):
                out.update(
                    json.loads(self.backend.read(os.path.join(self.dir, name)))
                )
        if len(out) > MAX_LEDGER_IDS:
            raise RuntimeError(
                f"suppression ledger at {self.dir} holds {len(out)} ids — "
                f"past the broadcast bound ({MAX_LEDGER_IDS}); this ledger "
                "is takedown-scale metadata, not a corpus-scale filter"
            )
        return out

    def filter_batch(self, df: DataFrame, id_col: str) -> DataFrame:
        """Drop suppressed ids from an incoming batch: one broadcast
        anti-join, map-side, no shuffle of the batch.  No-op (the same
        df back) when the ledger is empty."""
        sup = self.ids()
        if not sup:
            return df
        ledger = df.sparkSession.createDataFrame(
            [(i,) for i in sorted(sup)], "__suppressed_id long"
        )
        return df.join(
            F.broadcast(ledger),
            df[id_col] == F.col("__suppressed_id"),
            "left_anti",
        )
