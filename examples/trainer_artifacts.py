#!/usr/bin/env python
"""The TRAINER-ARTIFACT story end-to-end, on one page: from raw docs to
the files and metadata a training job actually consumes, then the
compliance path that mutates them surgically.

    documents
      1. build_corpus(..., emit_segments=True, bpe_merges=10)
           -> blocks with per-block SEGMENT LAYOUTS (block-diagonal
              attention masks / position-id resets) and a token-id
              frame at chunk grain (model-ready ids)
      2. write_token_shards    one parquet file per (split, shard) dir,
                               manifest with per-shard censuses
      3. read_token_shards     partition-pruned read of one worker's
                               shard — a trainer's actual access path
      3b. assemble_training_blocks
                               the worker zips its shard's block index
                               with its token rows into ASSEMBLED
                               batches and iterates them as a collator
                               would: input_ids consumed in order,
                               seg_id_lens consumed as the
                               block-diagonal attention mask /
                               position-id resets
      4. erase_docs_from_token_shards
                               RTBF: only the dirs the pure-function
                               shard key maps the targets to are
                               rewritten; everything else stays
                               byte-identical

Run: python examples/trainer_artifacts.py [work_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_demo_spark.operators.corpus_pipeline import (
    append_token_shards,
    assemble_training_blocks,
    assert_corpus_invariants,
    build_corpus,
    compact_token_shards,
    erase_docs_from_token_shards,
    read_block_index,
    read_token_shards,
    write_block_index,
    write_token_shards,
)
from cdc_demo_spark.session import get_spark
from cdc_demo_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
RULES = {"min_tokens": 25, "mean_token_len": (4.0, 5.0), "min_distinct_ratio": 0.35}


def main(work_dir: str) -> None:
    spark = get_spark("trainer-artifacts-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. corpus construction ending at model-ready artifacts
    res = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        emit_segments=True, bpe_merges=10,
    )
    assert_corpus_invariants(res)
    led = res["ledger"]
    print(
        f"corpus: {led['input']['docs']} docs -> {led['span_removal']['docs']} "
        f"surviving -> {led['pack']['blocks']} blocks "
        f"(fill {led['pack']['efficiency']}) -> "
        f"{led['tokens']['bpe_tokens']} BPE token ids"
    )
    # a block's segment layout is what the trainer's collator consumes
    blk = res["blocks"].filter(F.col("n_chunks") > 1).limit(1).collect()[0]
    print(
        f"sample block {blk['group']}/{blk['block_id']}: "
        f"{blk['n_chunks']} segments, offsets {blk['seg_offsets']}, "
        f"lengths {blk['seg_tokens']} (sum={blk['total_tokens']})"
    )
    assert blk["seg_offsets"][-1] + blk["seg_tokens"][-1] == blk["total_tokens"]

    # 2. bytes on disk: one file per (split, shard), manifest censuses
    #    — base half first, then the rest as an exactly-once APPEND
    #    batch (the incremental-corpus path), then compaction
    shards_dir = os.path.join(work_dir, "shards")
    toks = res["tokens"]
    ids = sorted(r["doc_id"] for r in toks.select("doc_id").distinct().collect())
    cut = ids[len(ids) // 2]
    # n_shards/salt left at defaults so the shard key MATCHES the pack
    # stage's (write_block_index verifies this agreement at write time)
    write_token_shards(toks.filter(F.col("doc_id") < cut), shards_dir)
    rep = append_token_shards(
        toks.filter(F.col("doc_id") >= cut), shards_dir, batch_id="delta-1"
    )
    replay = append_token_shards(
        toks.filter(F.col("doc_id") >= cut), shards_dir, batch_id="delta-1"
    )
    assert replay["replayed"] and replay["appended_chunks"] == 0
    comp = compact_token_shards(spark, shards_dir, max_files=1)
    manifest = json.load(open(os.path.join(shards_dir, "_manifest.json")))
    total = sum(s["bpe_tokens"] for s in manifest["shards"].values())
    assert total == led["tokens"]["bpe_tokens"], "manifest != ledger"
    print(
        f"shards: {len(manifest['shards'])} dirs (append touched "
        f"{rep['dirs_touched']}, replay no-op, compaction rewrote "
        f"{comp['dirs_compacted']}), manifest sums to {total} ids"
    )

    # 2b. persist the block composition (segment layouts) next to the
    #     rows — write-time checked against the shard censuses
    idx = write_block_index(res["blocks"], shards_dir)
    print(f"block index: {sum(v['blocks'] for v in idx.values())} blocks across "
          f"{len(idx)} dirs (chunk censuses verified against the shards)")

    # 3. a trainer worker reads ONLY its shard (partition-pruned) —
    #    token rows AND its block layout
    worker = read_token_shards(spark, shards_dir, split="train", shards=[0])
    want = manifest["shards"].get("train/00", {}).get("chunks", 0)
    assert worker.count() == want
    blocks0 = read_block_index(spark, shards_dir, split="train", shards=[0])
    assert blocks0.count() == idx.get("train/00", {}).get("blocks", 0)
    print(f"worker read train/00: {want} chunks + {blocks0.count()} block layouts "
          "(both partition-pruned)")

    # 3b. the worker ASSEMBLES its own shard into training batches —
    #     block index + token rows, both pruned to the same dir, zero
    #     cross-shard traffic — and iterates them exactly as a
    #     collator would: input_ids consumed in order, seg_id_lens
    #     turned into position-id resets (the block-diagonal attention
    #     mask at segment boundaries)
    assembled = assemble_training_blocks(
        spark, shards_dir, split="train", shards=[0]
    ).orderBy("block_id")
    n_batches, n_ids_seen, n_segs_seen = 0, 0, 0
    for b in assembled.toLocalIterator():  # the trainer's batch loop
        lens = b["seg_id_lens"]
        assert sum(lens) == b["n_ids"] == len(b["input_ids"])
        assert len(lens) == b["n_chunks"]
        # position ids reset at every segment boundary — what a
        # collator derives from seg_id_lens
        position_ids = [p for ln in lens for p in range(ln)]
        assert len(position_ids) == b["n_ids"]
        off = 0
        for ln in lens:
            assert position_ids[off] == 0  # fresh segment, fresh positions
            off += ln
        n_batches += 1
        n_ids_seen += b["n_ids"]
        n_segs_seen += len(lens)
    assert n_batches == blocks0.count(), "worker iterated every block"
    assert n_segs_seen == idx.get("train/00", {}).get("chunks", 0)
    print(
        f"worker assembled train/00: {n_batches} batches, {n_ids_seen} ids, "
        f"{n_segs_seen} segments — seg_id_lens consumed as attention-mask "
        "layout (position ids reset at every boundary)"
    )

    # 4. RTBF: erase two documents; untouched dirs never rewritten
    victims = [
        r["doc_id"]
        for r in read_token_shards(spark, shards_dir)
        .select("doc_id").distinct().limit(2).collect()
    ]
    report = erase_docs_from_token_shards(spark, shards_dir, victims)
    print(f"rtbf erase {victims}: {report}")
    left = read_token_shards(spark, shards_dir).filter(
        F.col("doc_id").isin(victims)
    ).count()
    assert left == 0, "erased docs still readable"
    m2 = json.load(open(os.path.join(shards_dir, "_manifest.json")))
    got = {
        f"{r['split']}/{int(r['shard']):02d}": int(r["c"])
        for r in read_token_shards(spark, shards_dir)
        .groupBy("split", "shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["chunks"] for k, v in m2["shards"].items()} == got
    print("manifest == reader censuses after erase — trainer artifacts consistent")


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="trainer_ex_")
    main(wd)
    print("OK")
