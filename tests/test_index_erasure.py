"""Right-to-be-forgotten on the incremental pair indexes (the twin of
streaming/erasure.py's silver erasure): erase() must remove every
trace of the ids from probe state AND the pairs output log, survive
gc with the bytes physically gone from the filesystem, stay erased
under stream-epoch replay, keep working for later appends, and be
idempotent.  The in-place pairs rewrite must recover a crashed swap."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cdc_demo_spark.operators.compaction import recover_erase_swaps
from cdc_demo_spark.operators.incremental_ann import IvfIndex
from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
from cdc_demo_spark.sources.tables import load_table


def _ids_in_parquet(root: str, col: str) -> set[int]:
    """Every value of ``col`` in ANY parquet file under root — the
    physical-bytes check an erasure guarantee is actually about."""
    out: set[int] = set()
    for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        if col in t.column_names:
            out.update(x for x in t.column(col).to_pylist() if x is not None)
    return out


def test_minhash_erase_full_footprint(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12)
    idx.append_batch(docs.filter(F.col("doc_id") < 250), persist_pairs=True).count()
    p2 = idx.append_batch(
        docs.filter(F.col("doc_id") >= 250), persist_pairs=True
    )
    victims = sorted({r["id_a"] for r in p2.limit(2).collect()})
    assert victims, "fixture must produce pairs"

    idx.erase(victims)
    # probe state: no shingles, no buckets for the victims
    assert not {
        r["id"] for r in idx.stored_shingles(victims).collect()
    }
    # pairs log cleansed on BOTH columns
    rest = idx.stored_pairs()
    assert rest.filter(
        F.col("id_a").isin(victims) | F.col("id_b").isin(victims)
    ).count() == 0
    # physical bytes: after gc, no parquet file under the index names them
    idx.gc()
    left = _ids_in_parquet(str(tmp_path / "mh"), "id") | {
        i
        for c in ("id_a", "id_b")
        for i in _ids_in_parquet(str(tmp_path / "mh"), c)
    }
    assert not (set(victims) & left), "erased ids survive on disk"
    # erasure is idempotent and later appends still work
    idx.erase(victims)
    again = idx.append_batch(docs.filter(F.col("doc_id").isin(victims)))
    assert again.count() >= 0  # re-admission is legitimate new data


def test_semantic_erase_arrow_tiles(spark, tmp_path):
    from cdc_demo_spark.sources.synth_vectors import synth_embeddings

    emb = synth_embeddings(spark, 400)
    idx = SemanticIndex(
        spark, str(tmp_path / "sem"), t_num=4, t_den=5, n_buckets=8, probes=2,
        arrow=True,
    )
    idx.build(emb.filter(F.col("vec_id") < 300))
    idx.append_batch(emb.filter(F.col("vec_id") >= 300), persist_pairs=True)
    victims = [0, 1, 350]
    idx.erase(victims)
    assert idx._read("members", "id long, centroid_id long").filter(
        F.col("id").isin(victims)
    ).count() == 0
    assert idx.stored_pairs().filter(
        F.col("id_a").isin(victims) | F.col("id_b").isin(victims)
    ).count() == 0
    idx.gc()
    left = _ids_in_parquet(str(tmp_path / "sem"), "id")
    assert not (set(victims) & left), "erased ids survive in tiles/members"
    # a later append still works: re-admission is legitimate new data,
    # and re-admitted ids can only pair against CURRENT members
    probe = idx.append_batch(emb.filter(F.col("vec_id").isin(victims)))
    assert probe.count() >= 0
    readmitted = (
        idx._read("members", "id long, centroid_id long")
        .filter(F.col("id").isin(victims))
        .select("id")
        .distinct()
        .count()
    )  # membership is multi-probe: rows per id = probes, ids = victims
    assert readmitted == len(victims)


def test_ivf_erase_and_replay_cannot_resurrect(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8, nprobe=3)
    idx.freeze_centroids(_train_cents(spark, emb))
    assert idx.append_batch(emb.filter(F.col("vec_id") < 300), batch_id=0) is True
    assert idx.append_batch(emb.filter(F.col("vec_id") >= 300), batch_id=1) is True
    victims = [5, 6, 7]
    idx.erase(victims)
    q = emb.filter(F.col("vec_id").isin(victims)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = {r["vec_id"] for r in idx.topk(q, k=10).collect()}
    assert not (set(victims) & hits), "erased vectors still retrievable"
    # a replayed stream epoch that originally carried the victims is
    # SKIPPED (marker survives erasure) — replay cannot resurrect
    assert idx.append_batch(emb.filter(F.col("vec_id") < 300), batch_id=0) is False
    hits2 = {r["vec_id"] for r in idx.topk(q, k=10).collect()}
    assert not (set(victims) & hits2)
    idx.gc()
    assert not (set(victims) & _ids_in_parquet(str(tmp_path / "ivf"), "vec_id"))


def _train_cents(spark, emb):
    from cdc_demo_spark.operators.similarity import choose_centroids, refine_centroids

    return refine_centroids(emb, choose_centroids(emb, 8), iterations=2)


def test_pairs_cleanse_recovers_crashed_swap(spark, sf_dir, tmp_path):
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12)
    idx.append_batch(docs, persist_pairs=True).count()
    (pairs_dir,) = glob.glob(str(tmp_path / "mh" / "pairs" / "batch=*"))
    before = idx.stored_pairs().count()
    assert before > 0

    # simulate a crash BETWEEN the two renames: live dir gone, old left
    os.rename(pairs_dir, pairs_dir + ".erase-old")
    recover_erase_swaps(os.path.dirname(pairs_dir))
    assert os.path.isdir(pairs_dir) and not os.path.isdir(pairs_dir + ".erase-old")
    assert idx.stored_pairs().count() == before

    # simulate a crash AFTER the stage, before any rename: tmp left
    shutil.copytree(pairs_dir, pairs_dir + ".erase-tmp")
    recover_erase_swaps(os.path.dirname(pairs_dir))
    assert not os.path.isdir(pairs_dir + ".erase-tmp")
    assert idx.stored_pairs().count() == before

    # simulate a crash after BOTH renames, old not yet dropped
    shutil.copytree(pairs_dir, pairs_dir + ".erase-old")
    recover_erase_swaps(os.path.dirname(pairs_dir))
    assert not os.path.isdir(pairs_dir + ".erase-old")
    assert idx.stored_pairs().count() == before
