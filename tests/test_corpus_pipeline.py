"""Composite corpus-construction pipeline (VERDICT r12 #1): the
cross-stage invariants no per-operator test can see — split safety
across the dedup/split stages, token conservation through chunk+pack,
block provenance, and ledger coherence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.corpus_pipeline import (
    assert_corpus_invariants,
    build_corpus,
    quality_keep_expr,
)
from cdc_demo_spark.sources.tables import load_table

RULES = {"min_tokens": 25, "mean_token_len": (4.0, 5.0), "min_distinct_ratio": 0.35}


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return build_corpus(docs, rules=RULES, minhash_threshold=0.3)


def test_invariants(result):
    assert_corpus_invariants(result)


def test_quality_stage_matches_q_quality_filter(spark, sf_dir, result):
    # stage 1 must implement exactly the registered (oracle-backed)
    # rule cascade — same keep set, no drift between the composite and
    # the standalone query
    from cdc_demo_spark.queries.registry import QUERIES

    expected = {
        r["doc_id"]
        for r in QUERIES["q_quality_filter"](spark, sf_dir)
        .filter("keep")
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]
        for r in docs.filter(quality_keep_expr("text", RULES)).select("doc_id").collect()
    }
    assert got == expected
    assert result["ledger"]["quality"]["docs"] == len(expected)


def test_split_assignment_is_cluster_pure_function(result):
    # same cluster -> same split, and the hash matches the house md5
    # scheme (the q_leakage_safe_split contract)
    rows = result["splits"].collect()
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_cluster.values())
    import hashlib

    for r in rows[:50]:
        h = int(hashlib.md5(str(r["cluster_id"]).encode()).hexdigest()[:15], 16) % 100
        want = "train" if h < 80 else ("val" if h < 90 else "test")
        assert r["split"] == want


def test_ledger_funnel_and_conservation(result):
    led = result["ledger"]
    assert led["input"]["docs"] > 0
    assert 0 < led["quality"]["docs"] <= led["input"]["docs"]
    assert led["pack"]["tokens"] == led["span_removal"]["tokens"]
    assert led["pack"]["blocks"] > 0
    # split census covers exactly the final docs
    assert sum(led["split"].values()) == led["span_removal"]["docs"]


def test_blocks_respect_budget_and_order(result):
    # no block exceeds the budget unless it is a single oversized chunk
    bad = result["blocks"].filter(
        (F.col("total_tokens") > 256) & (F.col("n_chunks") > 1)
    ).count()
    assert bad == 0
    # block_ids are dense per group
    dense = (
        result["blocks"]
        .groupBy("group")
        .agg(F.count(F.lit(1)).alias("n"), F.max("block_id").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert dense == 0


def test_overlapping_stride_breaks_conservation_visibly(spark, sf_dir):
    # stride < chunk_tokens duplicates window overlap into blocks; the
    # ledger must REPORT that (packed > surviving) rather than hide it
    docs = load_table(spark, sf_dir, "documents").limit(120)
    res = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3, chunk_tokens=64, stride=48
    )
    assert res["ledger"]["pack"]["tokens"] > res["ledger"]["span_removal"]["tokens"]


def test_split_safety_catches_a_planted_straddle(spark, sf_dir):
    # adversarial harness check: corrupt the split map and confirm the
    # invariant assert actually fires (a checker that cannot fail is
    # not a checker)
    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3)
    if res["pairs"].count() == 0:
        pytest.skip("no near-dup pairs at this sf")
    pair = res["pairs"].select("id_a", "id_b").limit(1).collect()[0]
    cur = {
        r["doc_id"]: r["split"]
        for r in res["splits"].filter(
            F.col("doc_id").isin([pair["id_a"], pair["id_b"]])
        ).collect()
    }
    # both ends currently agree (that's the invariant); flip id_a to a
    # split its partner does NOT have
    flipped = "train" if cur[pair["id_b"]] != "train" else "val"
    broken = dict(res)
    broken["splits"] = res["splits"].withColumn(
        "split",
        F.when(F.col("doc_id") == pair["id_a"], F.lit(flipped)).otherwise(
            F.col("split")
        ),
    ).localCheckpoint(eager=True)
    with pytest.raises(AssertionError, match="straddle"):
        assert_corpus_invariants(broken)


@pytest.mark.parametrize("normalize_whitespace", [False, True])
def test_whitespace_normalization_preserves_invariants(spark, normalize_whitespace):
    """r13 review finding #1: consecutive / non-space whitespace used
    to break token conservation (quality and span stages split on a
    literal space, chunking on \\s+).  Since r13 every stage splits on
    the same literal space, so the invariants hold with the
    normalization OFF (empty tokens count consistently everywhere)
    AND with it ON (runs of whitespace collapse before any stage) —
    parametrized over both because the r13 version of this test never
    actually exercised the flag it was named for (r13 ADVICE)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        assert_corpus_invariants,
        build_corpus,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4
    rows = []
    for i in range(12):
        text = base + f"tail{i}"
        if i % 3 == 0:
            text = text.replace("bravo charlie", "bravo  charlie", 1)  # double space
        if i % 4 == 0:
            text = text.replace("echo", "echo\tfoxtrot", 1)  # tab
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = build_corpus(
        docs,
        rules={"min_tokens": 5, "mean_token_len": (1.0, 99.0),
               "min_distinct_ratio": 0.0},
        minhash_threshold=0.99,
        chunk_tokens=8,
        block_tokens=32,
        n_shards=2,
        normalize_whitespace=normalize_whitespace,
    )
    assert_corpus_invariants(res)
    assert res["ledger"]["pack"]["tokens"] == res["ledger"]["span_removal"]["tokens"]
    if normalize_whitespace:
        # collapsed runs mean strictly fewer token slots than the raw
        # literal-space census of the same text would count
        raw = build_corpus(
            docs,
            rules={"min_tokens": 5, "mean_token_len": (1.0, 99.0),
                   "min_distinct_ratio": 0.0},
            minhash_threshold=0.99, chunk_tokens=8, block_tokens=32,
            n_shards=2, normalize_whitespace=False,
        )
        assert (res["ledger"]["input"]["tokens"]
                < raw["ledger"]["input"]["tokens"])


def test_build_corpus_rejects_non_integral_id(spark):
    """r13 review finding #2: a non-integral id column must fail at
    entry, not inside the pack UDF after the expensive stages."""
    import pytest

    from cdc_demo_spark.operators.corpus_pipeline import build_corpus

    docs = spark.createDataFrame(
        [("a", "some text here ok")], "name string, text string"
    )
    with pytest.raises(ValueError, match="integral id column"):
        build_corpus(docs, id_col="name")


def test_build_corpus_renames_custom_id(spark):
    """id_col != doc_id is honored: renamed internally, outputs carry
    doc_id (the pack schema's declared id)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        assert_corpus_invariants,
        build_corpus,
    )

    docs = spark.createDataFrame(
        [(i, "alpha bravo charlie delta echo foxtrot golf hotel " * 3 + f"t{i}")
         for i in range(8)],
        "my_id long, text string",
    )
    res = build_corpus(
        docs, id_col="my_id",
        rules={"min_tokens": 5, "mean_token_len": (1.0, 99.0),
               "min_distinct_ratio": 0.0},
        minhash_threshold=0.99, chunk_tokens=8, block_tokens=32, n_shards=2,
    )
    assert_corpus_invariants(res)
    assert "doc_id" in res["final_docs"].columns


def test_build_corpus_rejects_preexisting_doc_id_collision(spark):
    """r13 ADVICE: id_col != doc_id on a frame that ALSO carries a
    distinct doc_id column must fail at entry — the rename would
    otherwise leave two doc_id columns and surface later as an
    ambiguous-column error deep in the stages."""
    docs = spark.createDataFrame(
        [(1, 99, "some text here ok")], "my_id long, doc_id long, text string"
    )
    with pytest.raises(ValueError, match="already has a 'doc_id'"):
        build_corpus(docs, id_col="my_id")


def test_token_stage_invariants_and_census(spark, sf_dir):
    """r13 VERDICT #1: with bpe_merges set, the composite ends at
    model-ready token ids and the encoded slot census equals the
    packed ledger's token total EXACTLY (every packed word slot is
    accounted for by exactly one encoded chunk row)."""
    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3, bpe_merges=8)
    assert_corpus_invariants(res)
    tl = res["ledger"]["tokens"]
    assert tl["slots"] == res["ledger"]["pack"]["tokens"]
    assert tl["n_merges"] == 8 and len(res["bpe_merges"]) == 8
    toks = res["tokens"]
    assert toks.count() == tl["chunks"] > 0
    # split column rides along and matches the final doc map
    mismatch = toks.join(
        res["final_docs"].select("doc_id", F.col("split").alias("ds")), "doc_id"
    ).filter(F.col("split") != F.col("ds")).count()
    assert mismatch == 0
    # ids are dense non-negative ints
    bad = toks.filter(
        (F.col("n_bpe_tokens") > 0)
        & (F.array_min("token_ids") < 0)
    ).count()
    assert bad == 0


def test_token_stage_accepts_shipped_merge_list(spark):
    """A pre-trained merge list (the shipped-vocabulary path) is
    honored verbatim — no retraining, stage still conserves slots."""
    docs = spark.createDataFrame(
        [(i, "alpha bravo alpha bravo charlie delta echo foxtrot " * 3 + f"t{i}")
         for i in range(10)],
        "doc_id long, text string",
    )
    res = build_corpus(
        docs,
        rules={"min_tokens": 5, "mean_token_len": (1.0, 99.0),
               "min_distinct_ratio": 0.0},
        minhash_threshold=0.99, chunk_tokens=8, block_tokens=32, n_shards=2,
        bpe_merges=[("a", "l"), ("al", "p"), ("alp", "h"), ("alph", "a")],
    )
    assert_corpus_invariants(res)
    assert res["bpe_merges"] == [("a", "l"), ("al", "p"), ("alp", "h"), ("alph", "a")]
    # 'alpha' must encode to ONE token wherever it appears
    inv_hit = res["tokens"].filter(F.array_contains("token_ids", -1)).count()
    assert inv_hit == 0


def test_token_stage_absent_by_default(result):
    assert result["tokens"] is None and "tokens" not in result["ledger"]


def test_streaming_twin_equals_batch_composite(spark, sf_dir, tmp_path):
    """r13 VERDICT #8 (stretch): the corpus pipeline's incremental
    stages driven as ONE real Structured Streaming query — file source
    -> foreachBatch(corpus_stream_sink) in two availableNow waves
    under one checkpoint, the shared quality predicate feeding BOTH
    the MinHash near-dup index and the vocabulary ledger per epoch.
    The composite streaming state must equal the batch composite:
    stored verified pairs == one-shot minhash_near_duplicates over the
    quality survivors, and the token ledger == one-shot word counts
    over the same."""
    import os

    from cdc_demo_spark.operators.corpus_pipeline import corpus_stream_sink
    from cdc_demo_spark.operators.dedup import minhash_near_duplicates
    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
    from cdc_demo_spark.operators.incremental_tokens import TokenCountIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    os.makedirs(land)
    mh = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12)
    tk = TokenCountIndex(spark, str(tmp_path / "tk"))
    sink = corpus_stream_sink(mh, tk, rules=RULES)

    def run_wave(pred, prefix):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{prefix}")
        )
        for i, name in enumerate(
            f for f in os.listdir(tmp_path / f"stage_{prefix}")
            if f.endswith(".parquet")
        ):
            os.rename(
                tmp_path / f"stage_{prefix}" / name, f"{land}/{prefix}-{i}.parquet"
            )
        finished = (
            spark.readStream.schema(docs.schema)
            .parquet(land)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )
        # a timed-out wave still running would collide with the next
        # wave's query on the same checkpoint and mask the real cause
        assert finished, f"wave {prefix} did not terminate within 180s"

    mid = 250
    run_wave(F.col("doc_id") < mid, "w1")
    run_wave(F.col("doc_id") >= mid, "w2")

    kept = docs.filter(quality_keep_expr("text", RULES))
    got_pairs = {
        (r["id_a"], r["id_b"]) for r in mh.stored_pairs().collect()
    }
    want_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            kept, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
        ).collect()
    }
    assert got_pairs == want_pairs
    got_counts = {(r["token"], r["cnt"]) for r in tk.counts().collect()}
    want_counts = {
        (r["token"], r["cnt"])
        for r in kept.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("token")
        ).groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_counts == want_counts


def test_write_token_shards_roundtrip_manifest_and_pruning(spark, sf_dir, tmp_path):
    """The ledger-to-bytes hop: shard files round-trip exactly, the
    manifest censuses sum to the ledger's token stage, every
    (split, shard) directory holds exactly ONE data file, and a
    shard-subset read prunes at the PARTITION level (a trainer worker
    reads only its own bytes)."""
    import glob
    import json
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        read_token_shards,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3, bpe_merges=6,
                       n_shards=4)
    out = str(tmp_path / "shards")
    manifest = write_token_shards(res["tokens"], out, n_shards=4)

    # manifest sums == ledger token stage
    tl = res["ledger"]["tokens"]
    sums = {k: sum(s[k] for s in manifest["shards"].values())
            for k in ("chunks", "words", "bpe_tokens")}
    assert sums == {"chunks": tl["chunks"], "words": tl["words"],
                    "bpe_tokens": tl["bpe_tokens"]}
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk["shards"] == manifest["shards"]

    # exactly one data file per (split, shard) directory
    for d in glob.glob(os.path.join(out, "split=*", "shard=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    # round-trip: same rows (ids compared as sorted tuples per chunk)
    back = read_token_shards(spark, out)
    assert back.count() == tl["chunks"]
    key = lambda r: (r["doc_id"], r["chunk_id"])
    want = {key(r): (r["split"], r["n_words"], list(r["token_ids"]))
            for r in res["tokens"].collect()}
    got = {key(r): (r["split"], r["n_words"], list(r["token_ids"]))
           for r in back.collect()}
    assert got == want

    # shard-subset read prunes partitions: the scan's partition filters
    # must mention shard, and the row count matches the manifest
    pruned = read_token_shards(spark, out, split="train", shards=[1])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    want_chunks = manifest["shards"].get("train/01", {}).get("chunks", 0)
    assert pruned.count() == want_chunks


def test_nfd_packing_conserves_and_improves_efficiency(spark, sf_dir):
    """strategy='nfd' (next-fit decreasing) must conserve tokens and
    never split chunks — same censuses as greedy (HARD guarantees) —
    and on THIS fixture's chunking-shaped size distribution (many
    equal full-size chunks + short tails from chunk_documents) its
    fill rate is at least greedy's.  The efficiency inequality is a
    property of the shape, not of NFD in general — next-fit never
    reopens a block, so decreasing order can lose when the budget sits
    near the chunk size (test_nfd_can_pack_worse_than_greedy pins the
    counter-example)."""
    docs = load_table(spark, sf_dir, "documents")
    greedy = build_corpus(docs, rules=RULES, minhash_threshold=0.3)
    nfd = build_corpus(docs, rules=RULES, minhash_threshold=0.3,
                       pack_strategy="nfd")
    assert_corpus_invariants(nfd)
    g, n = greedy["ledger"]["pack"], nfd["ledger"]["pack"]
    assert n["tokens"] == g["tokens"]          # conservation unchanged
    assert n["efficiency"] >= g["efficiency"], (g, n)
    assert n["blocks"] <= g["blocks"]
    # budget still respected (single oversized chunks aside)
    bad = nfd["blocks"].filter(
        (F.col("total_tokens") > 256) & (F.col("n_chunks") > 1)
    ).count()
    assert bad == 0
    # determinism: a second nfd run packs identically
    nfd2 = build_corpus(docs, rules=RULES, minhash_threshold=0.3,
                        pack_strategy="nfd")
    key = lambda df: sorted(
        (r["group"], r["block_id"], r["total_tokens"], tuple(r["doc_ids"]))
        for r in df.collect()
    )
    assert key(nfd["blocks"]) == key(nfd2["blocks"])


def test_nfd_can_pack_worse_than_greedy(spark):
    """ADVICE r14: NFD is NOT universally >= greedy — next-fit never
    reopens a block, so with budget 10 and in-order chunks [5,5,6,4]
    greedy packs 2 blocks ([5,5],[6,4]) while NFD's decreasing order
    [6,5,5,4] packs 3 ([6],[5,5],[4]).  This pins the documented
    limitation so the fixture-shaped efficiency assertion above can't
    be mistaken for a general theorem.  Conservation still holds."""
    from cdc_demo_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(
        [("g", 1, 0, 5), ("g", 1, 1, 5), ("g", 2, 0, 6), ("g", 2, 1, 4)],
        "group string, doc_id long, chunk_id long, n_tokens long",
    )
    greedy = pack_chunks(df, block_tokens=10).collect()
    nfd = pack_chunks(df, block_tokens=10, strategy="nfd").collect()
    assert len(greedy) == 2 and len(nfd) == 3
    assert sum(r["total_tokens"] for r in greedy) == 20
    assert sum(r["total_tokens"] for r in nfd) == 20


def test_pack_chunks_rejects_unknown_strategy(spark):
    from cdc_demo_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(
        [("g", 1, 0, 10)], "group string, doc_id long, chunk_id long, n_tokens long"
    )
    with pytest.raises(ValueError, match="strategy"):
        pack_chunks(df, strategy="best")


def test_survivor_longest_keeps_best_per_cluster(spark, sf_dir):
    """survivor='longest' (the q_dedup_keep_best policy) keeps exactly
    one doc per near-dup cluster — the longest, id tiebreak — and the
    funnel/ split invariants hold unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3,
                       survivor="longest")
    assert_corpus_invariants(res)
    base = build_corpus(docs, rules=RULES, minhash_threshold=0.3)
    # same cluster structure => same number of survivors
    assert (res["ledger"]["neardup_dedup"]["docs"]
            == base["ledger"]["neardup_dedup"]["docs"])
    # in every multi-doc cluster, the kept doc is at least as long as
    # every dropped doc (verify on the split map + original lengths)
    lengths = {r["doc_id"]: r["n"] for r in
               docs.select("doc_id", F.length("text").alias("n")).collect()}
    kept = {r["doc_id"] for r in res["final_docs"].select("doc_id").collect()}
    by_cluster = {}
    for r in res["splits"].collect():
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    checked = 0
    for cid, members in by_cluster.items():
        if len(members) < 2:
            continue
        kept_members = [m for m in members if m in kept]
        if not kept_members:
            continue  # survivor may have been emptied by span removal
        (k,) = kept_members
        assert all(lengths[k] >= lengths[m] for m in members), (cid, members)
        checked += 1
    assert checked > 0, "fixture produced no multi-doc clusters"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="survivor"):
        build_corpus(docs, rules=RULES, survivor="newest")


def test_pipeline_segments_cover_token_stage(spark, sf_dir):
    """build_corpus(emit_segments=True, bpe_merges=...) must hand a
    trainer a CONSISTENT pair of artifacts: the blocks' segment layout
    and the token-id frame describe the same chunks — (doc, chunk)
    cover is exactly-once in both directions, per-segment lengths
    equal the token frame's slot counts, and offsets tile each block.
    This is the cross-stage invariant no per-operator test sees: a
    drifting chunk grain between pack and encode would silently feed
    wrong attention boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        emit_segments=True, bpe_merges=5,
    )
    assert_corpus_invariants(res)
    blocks = res["blocks"]
    segs = blocks.select(
        F.col("split"),
        F.explode(F.arrays_zip("seg_doc_ids", "seg_chunk_ids", "seg_tokens")).alias("s"),
    ).select(
        "split",
        F.col("s.seg_doc_ids").alias("doc_id"),
        F.col("s.seg_chunk_ids").alias("chunk_id"),
        F.col("s.seg_tokens").alias("n_tokens"),
    )
    toks = res["tokens"].select("doc_id", "chunk_id", "n_tokens", "split")
    # exactly-once both ways + identical lengths and split labels
    mismatch = (
        segs.join(toks, ["doc_id", "chunk_id"], "full_outer")
        .filter(
            segs["n_tokens"].isNull()
            | toks["n_tokens"].isNull()
            | (segs["n_tokens"] != toks["n_tokens"])
            | (segs["split"] != toks["split"])
        )
        .count()
    )
    assert mismatch == 0
    assert segs.count() == toks.count()  # no duplicate coverage either side
    assert segs.groupBy("doc_id", "chunk_id").count().filter("count > 1").count() == 0
    # offsets tile every block exactly (vectorized check)
    bad = blocks.filter(
        (F.element_at("seg_offsets", -1) + F.element_at("seg_tokens", -1)
         != F.col("total_tokens"))
        | (F.element_at("seg_offsets", 1) != 0)
    ).count()
    assert bad == 0


def test_rtbf_erase_token_shards(spark, sf_dir, tmp_path):
    """RTBF at the trainer-artifact level (r15): erase must touch ONLY
    the shard dirs the pure-function key maps the targets to —
    untouched files stay byte-identical — while reads, manifest, and
    censuses agree afterwards; a fully-erased dir disappears with its
    manifest key; a second erase is a no-op."""
    import hashlib
    import json
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        erase_docs_from_token_shards,
        read_token_shards,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3, bpe_merges=5)
    out = str(tmp_path / "shards")
    write_token_shards(res["tokens"], out, n_shards=4)

    def file_state():
        state = {}
        for root, _, files in os.walk(out):
            for fn in files:
                if fn.endswith(".parquet"):
                    p = os.path.join(root, fn)
                    state[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return state

    before_files = file_state()
    before = read_token_shards(spark, out)
    before_total = before.count()
    # targets: two docs from different shards
    two = sorted(
        r["doc_id"] for r in before.select("doc_id").distinct().limit(2).collect()
    )
    salt_shard = lambda d: int(
        hashlib.md5(f"epoch0|{d}".encode()).hexdigest()[:15], 16
    ) % 4
    touched = {salt_shard(d) for d in two}
    gone_rows = before.filter(F.col("doc_id").isin(two)).count()
    assert gone_rows > 0

    report = erase_docs_from_token_shards(spark, out, two)
    assert report["erased_chunks"] == gone_rows
    after = read_token_shards(spark, out)
    assert after.filter(F.col("doc_id").isin(two)).count() == 0
    assert after.count() == before_total - gone_rows
    # manifest == reader, shard by shard
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    got = {
        f"{r['split']}/{int(r['shard']):02d}": int(r["c"])
        for r in after.groupBy("split", "shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["chunks"] for k, v in manifest["shards"].items()} == got
    # untouched shard files byte-identical (never read, never written)
    after_files = file_state()
    for p, h in before_files.items():
        shard_id = int(p.split("shard=")[1].split(os.sep)[0])
        if shard_id not in touched:
            assert after_files.get(p) == h, f"untouched file changed: {p}"
    # idempotent
    again = erase_docs_from_token_shards(spark, out, two)
    assert again == {"erased_chunks": 0, "erased_words": 0,
                     "erased_bpe_tokens": 0, "dirs_rewritten": 0,
                     "dirs_removed": 0, "block_index_dropped": 0}
    assert file_state() == after_files

    # full-dir erase: remove every doc of one (split, shard)
    key, info = sorted(manifest["shards"].items())[0]
    split_v, shard_v = key.split("/")[0], int(key.split("/")[1])
    all_docs = [
        r["doc_id"]
        for r in read_token_shards(spark, out, split=split_v, shards=[shard_v])
        .select("doc_id").distinct().collect()
    ]
    # a doc lives in exactly one (split, shard) — erasing every doc of
    # this dir removes exactly this dir and exactly its chunk census
    rep2 = erase_docs_from_token_shards(spark, out, all_docs)
    assert rep2["dirs_removed"] == 1 and rep2["dirs_rewritten"] == 0
    assert rep2["erased_chunks"] == info["chunks"]
    m2 = json.load(open(os.path.join(out, "_manifest.json")))
    assert key not in m2["shards"]
    assert not os.path.exists(os.path.join(out, f"split={split_v}", f"shard={shard_v}"))
    # survivors still readable and census-consistent
    final = read_token_shards(spark, out)
    got2 = {
        f"{r['split']}/{int(r['shard']):02d}": int(r["c"])
        for r in final.groupBy("split", "shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["chunks"] for k, v in m2["shards"].items()} == got2


def test_mixture_stage_rebalances_and_conserves(spark, sf_dir):
    """build_corpus(mixture_alpha=0.5) (r15): the optional temperature
    stage must (a) shrink the corpus toward the target fraction with
    the dominant lang cut HARDEST (rate flattening — same policy the
    oracle-exact q_mixture_temperature pins), (b) keep every invariant
    green with pack/token censuses now equal to the MIXED corpus, and
    (c) fail loudly when the stratum column is absent."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        mixture_alpha=0.5, bpe_merges=5,
    )
    assert_corpus_invariants(mixed)
    led = mixed["ledger"]
    assert "mixture" in led
    assert led["mixture"]["docs"] < led["span_removal"]["docs"]
    assert led["pack"]["tokens"] == led["mixture"]["tokens"]
    assert sum(led["split"].values()) == led["mixture"]["docs"]
    # rate flattening: en keeps a smaller fraction than every tail lang
    pre = {
        r["lang"]: r["n"]
        for r in docs.join(
            mixed["final_docs"].select("doc_id"), "doc_id", "left_semi"
        ).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rate = {g: pre[g] / base[g] for g in pre}
    assert rate["en"] == min(rate.values())
    # missing stratum column fails at entry
    import pytest

    bare = docs.select("doc_id", "text")
    with pytest.raises(ValueError, match="mixture_stratum"):
        build_corpus(bare, rules=RULES, minhash_threshold=0.3, mixture_alpha=0.5)


def test_append_and_compact_token_shards(spark, sf_dir, tmp_path):
    """Incremental shard lifecycle (r15): append lands a delta as one
    new file per touched dir with manifest censuses SUM-merged and
    exactly-once batch ids (replay no-ops); reads after append equal
    base ∪ delta; compaction rewrites ONLY crowded dirs back to one
    file with content unchanged; erase still works on the grown
    layout."""
    import json
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        append_token_shards,
        compact_token_shards,
        erase_docs_from_token_shards,
        read_token_shards,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3, bpe_merges=5)
    toks = res["tokens"]
    ids = sorted(r["doc_id"] for r in toks.select("doc_id").distinct().collect())
    base_ids, delta_ids = ids[: len(ids) // 2], ids[len(ids) // 2:]
    base = toks.filter(F.col("doc_id").isin(base_ids))
    delta = toks.filter(F.col("doc_id").isin(delta_ids))

    out = str(tmp_path / "shards")
    write_token_shards(base, out, n_shards=4)
    n_base = read_token_shards(spark, out).count()

    rep = append_token_shards(delta, out, batch_id="b1")
    assert rep["replayed"] is False and rep["appended_chunks"] == delta.count()
    after = read_token_shards(spark, out)
    assert after.count() == n_base + rep["appended_chunks"]
    # base ∪ delta at (doc, chunk) identity
    got = sorted(
        (r["doc_id"], r["chunk_id"]) for r in after.select("doc_id", "chunk_id").collect()
    )
    want = sorted(
        (r["doc_id"], r["chunk_id"]) for r in toks.select("doc_id", "chunk_id").collect()
    )
    assert got == want
    # manifest == reader, and the batch is recorded
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    assert manifest["applied_batches"] == ["b1"]
    reader_census = {
        f"{r['split']}/{int(r['shard']):02d}": int(r["c"])
        for r in after.groupBy("split", "shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["chunks"] for k, v in manifest["shards"].items()} == reader_census
    # exactly-once: replaying the same batch id no-ops
    rep2 = append_token_shards(delta, out, batch_id="b1")
    assert rep2 == {"appended_chunks": 0, "dirs_touched": 0, "replayed": True}
    assert read_token_shards(spark, out).count() == n_base + rep["appended_chunks"]

    # compaction: touched dirs now hold 2 files; threshold 1 compacts
    # them to one with identical content
    two_file_dirs = [
        (s, d)
        for s in os.listdir(out) if s.startswith("split=")
        for d in os.listdir(os.path.join(out, s)) if d.startswith("shard=")
        if len([f for f in os.listdir(os.path.join(out, s, d))
                if f.endswith(".parquet")]) > 1
    ]
    assert two_file_dirs, "append should have produced multi-file dirs"
    crep = compact_token_shards(spark, out, max_files=1)
    assert crep["dirs_compacted"] == len(two_file_dirs)
    assert crep["files_removed"] >= len(two_file_dirs)
    for s, d in two_file_dirs:
        files = [f for f in os.listdir(os.path.join(out, s, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (s, d, files)
    after_compact = read_token_shards(spark, out)
    got2 = sorted(
        (r["doc_id"], r["chunk_id"])
        for r in after_compact.select("doc_id", "chunk_id").collect()
    )
    assert got2 == want  # content unchanged
    # idempotent: nothing left over threshold
    assert compact_token_shards(spark, out, max_files=1) == {
        "dirs_compacted": 0, "files_removed": 0
    }

    # erase still consistent on the appended+compacted layout
    victim = delta_ids[0]
    erase_docs_from_token_shards(spark, out, [victim])
    final = read_token_shards(spark, out)
    assert final.filter(F.col("doc_id") == victim).count() == 0
    m2 = json.load(open(os.path.join(out, "_manifest.json")))
    got3 = {
        f"{r['split']}/{int(r['shard']):02d}": int(r["c"])
        for r in final.groupBy("split", "shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["chunks"] for k, v in m2["shards"].items()} == got3


def test_block_index_roundtrip_consistency_and_erase(spark, sf_dir, tmp_path):
    """Block index on disk (r15): the persisted block composition must
    agree with the token shards chunk-for-chunk (checked at write
    time AND re-proven here at identity grain), prune reads at the
    partition level, refuse a layout written under a different shard
    key, and drop exactly the touched shards' index dirs on RTBF
    erase (derived data — composition can't be locally patched)."""
    import json
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        erase_docs_from_token_shards,
        read_block_index,
        read_token_shards,
        write_block_index,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        emit_segments=True, bpe_merges=5,
    )
    out = str(tmp_path / "shards")
    write_token_shards(res["tokens"], out)  # defaults match build_corpus
    idx = write_block_index(res["blocks"], out)
    assert idx and all(v["blocks"] > 0 for v in idx.values())

    # identity-grain consistency: exploded segments == token rows
    bi = read_block_index(spark, out)
    segs = bi.select(
        "split", "shard",
        F.explode(F.arrays_zip("seg_doc_ids", "seg_chunk_ids")).alias("s"),
    ).select(
        "split", "shard",
        F.col("s.seg_doc_ids").alias("doc_id"),
        F.col("s.seg_chunk_ids").alias("chunk_id"),
    )
    toks = read_token_shards(spark, out).select("split", "shard", "doc_id", "chunk_id")
    assert segs.exceptAll(toks).count() == 0
    assert toks.exceptAll(segs).count() == 0

    # pruned read
    one = read_block_index(spark, out, split="train", shards=[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan

    # a layout under a DIFFERENT shard key must be refused loudly
    out2 = str(tmp_path / "shards4")
    write_token_shards(res["tokens"], out2, n_shards=4)
    with pytest.raises(ValueError, match="disagrees"):
        write_block_index(res["blocks"], out2)

    # RTBF drops exactly the touched shards' index dirs
    victim = res["tokens"].select("doc_id").distinct().limit(1).collect()[0][0]
    before_dirs = {
        (s, d)
        for s in os.listdir(os.path.join(out, "_blocks")) if s.startswith("split=")
        for d in os.listdir(os.path.join(out, "_blocks", s)) if d.startswith("shard=")
    }
    rep = erase_docs_from_token_shards(spark, out, [victim])
    assert rep["block_index_dropped"] == rep["dirs_rewritten"] + rep["dirs_removed"] >= 1
    after_dirs = {
        (s, d)
        for s in os.listdir(os.path.join(out, "_blocks")) if s.startswith("split=")
        for d in os.listdir(os.path.join(out, "_blocks", s)) if d.startswith("shard=")
    }
    assert len(before_dirs - after_dirs) == rep["block_index_dropped"]
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    for s, d in before_dirs - after_dirs:
        key = f"{s.split('=')[1]}/{int(d.split('=')[1]):02d}"
        assert key not in manifest["blocks"]
    for s, d in after_dirs:
        key = f"{s.split('=')[1]}/{int(d.split('=')[1]):02d}"
        assert key in manifest["blocks"]


def test_streaming_mixture_twin_equals_batch(spark, sf_dir, tmp_path):
    """Frozen-threshold mixture in the streaming sink (r15): two
    availableNow waves with thresholds derived ONCE from the full
    corpus must leave exactly the state the batch path leaves with the
    same thresholds — the keep is a pure function of (id, stratum), so
    wave boundaries can't change the kept set.  Also pins the
    unseen-stratum policy: a lang absent from the frozen dict
    contributes nothing."""
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        corpus_stream_sink,
        mixture_keep_expr,
        temperature_thresholds,
    )
    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
    from cdc_demo_spark.operators.incremental_tokens import TokenCountIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    docs = docs.localCheckpoint(eager=True)
    counts = sorted(
        (r["lang"], r["n"])
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # drop one stratum from the frozen dict to pin the unseen policy
    frozen = temperature_thresholds(counts, 0.5, 0.5)
    dropped = sorted(frozen)[0]
    frozen.pop(dropped)

    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    os.makedirs(land)
    mh = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12)
    tk = TokenCountIndex(spark, str(tmp_path / "tk"))
    sink = corpus_stream_sink(mh, tk, rules=RULES, mixture_thresholds=frozen)

    def run_wave(pred, prefix):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{prefix}")
        )
        for i, name in enumerate(
            f for f in os.listdir(tmp_path / f"stage_{prefix}")
            if f.endswith(".parquet")
        ):
            os.rename(
                tmp_path / f"stage_{prefix}" / name, f"{land}/{prefix}-{i}.parquet"
            )
        finished = (
            spark.readStream.schema(docs.schema)
            .parquet(land)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )
        assert finished, f"wave {prefix} did not terminate within 180s"

    mid = 250
    run_wave(F.col("doc_id") < mid, "w1")
    run_wave(F.col("doc_id") >= mid, "w2")

    kept = docs.filter(
        quality_keep_expr("text", RULES) & mixture_keep_expr("lang", frozen)
    )
    assert kept.filter(F.col("lang") == dropped).count() == 0  # unseen drops
    assert 0 < kept.count() < docs.count()
    got_counts = {(r["token"], r["cnt"]) for r in tk.counts().collect()}
    want_counts = {
        (r["token"], r["cnt"])
        for r in kept.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("token")
        ).groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_counts == want_counts
    from cdc_demo_spark.operators.dedup import minhash_near_duplicates

    got_pairs = {(r["id_a"], r["id_b"]) for r in mh.stored_pairs().collect()}
    want_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            kept, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
        ).collect()
    }
    assert got_pairs == want_pairs


def test_assemble_training_blocks(spark, sf_dir, tmp_path):
    """Read-side assembly (r15): zipping the on-disk block index with
    the on-disk token rows must reproduce, per block, exactly the
    concatenation of its chunks' BPE ids in pack order — n_ids equals
    the sum of the member chunks' n_bpe_tokens, seg_id_lens tiles
    input_ids, every indexed block assembles, and a spot block's ids
    equal the manual per-chunk concatenation."""
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        assemble_training_blocks,
        read_block_index,
        write_block_index,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        emit_segments=True, bpe_merges=5,
    )
    out = str(tmp_path / "shards")
    write_token_shards(res["tokens"], out)
    write_block_index(res["blocks"], out)

    blocks = assemble_training_blocks(spark, out).localCheckpoint(eager=True)
    assert blocks.count() == read_block_index(spark, out).count()
    # seg_id_lens tiles input_ids exactly
    bad = blocks.filter(
        F.aggregate("seg_id_lens", F.lit(0), lambda a, x: a + x) != F.col("n_ids")
    ).count()
    assert bad == 0
    assert blocks.filter(F.size("seg_id_lens") != F.col("n_chunks")).count() == 0
    # per-block n_ids == sum of member chunks' n_bpe_tokens (via the
    # token frame, independent path)
    seg = read_block_index(spark, out).select(
        "split", "shard", "block_id",
        F.explode(F.arrays_zip("seg_doc_ids", "seg_chunk_ids")).alias("s"),
    ).select(
        "split", "shard", "block_id",
        F.col("s.seg_doc_ids").alias("doc_id"),
        F.col("s.seg_chunk_ids").alias("chunk_id"),
    )
    want = (
        seg.join(
            res["tokens"].select("doc_id", "chunk_id", "n_bpe_tokens"),
            ["doc_id", "chunk_id"],
        )
        .groupBy("split", "shard", "block_id")
        .agg(F.sum("n_bpe_tokens").alias("want_ids"))
    )
    mism = (
        blocks.join(want, ["split", "shard", "block_id"])
        .filter(F.col("n_ids") != F.col("want_ids"))
        .count()
    )
    assert mism == 0
    # spot check: one multi-chunk block's ids == manual concatenation
    spot = blocks.filter(F.col("n_chunks") > 1).limit(1).collect()[0]
    layout = read_block_index(
        spark, out, split=spot["split"], shards=[spot["shard"]]
    ).filter(F.col("block_id") == spot["block_id"]).collect()[0]
    tok_map = {
        (r["doc_id"], r["chunk_id"]): r["token_ids"]
        for r in res["tokens"].filter(
            F.col("doc_id").isin(list(set(layout["seg_doc_ids"])))
        ).collect()
    }
    manual = []
    for d, c in zip(layout["seg_doc_ids"], layout["seg_chunk_ids"]):
        manual.extend(tok_map[(d, c)])
    assert spot["input_ids"] == manual
    # pruned single-shard assembly matches the full assembly's subset
    one = assemble_training_blocks(
        spark, out, split=spot["split"], shards=[spot["shard"]]
    )
    assert one.count() == blocks.filter(
        (F.col("split") == spot["split"]) & (F.col("shard") == spot["shard"])
    ).count()


def test_append_validate_new_catches_resent_docs(spark, sf_dir, tmp_path):
    """validate_new=True (r15 self-review): re-sending EXISTING docs
    under a fresh batch_id must raise (silent doubling is the caller
    bug batch_id can't see); a genuinely-new delta passes the same
    check, and the default stays cheap (no probe)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        append_token_shards,
        read_token_shards,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3, bpe_merges=5)
    toks = res["tokens"]
    ids = sorted(r["doc_id"] for r in toks.select("doc_id").distinct().collect())
    cut = ids[len(ids) // 2]
    out = str(tmp_path / "shards")
    write_token_shards(toks.filter(F.col("doc_id") < cut), out, n_shards=4)

    resent = toks.filter(F.col("doc_id") < cut).limit(50)
    with pytest.raises(ValueError, match="re-sends existing doc_ids"):
        append_token_shards(resent, out, batch_id="bad", validate_new=True)
    # the refused batch must not have landed anything
    import json
    import os

    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    assert "bad" not in manifest.get("applied_batches", [])
    n_before = read_token_shards(spark, out).count()

    fresh = toks.filter(F.col("doc_id") >= cut)
    rep = append_token_shards(fresh, out, batch_id="good", validate_new=True)
    assert rep["replayed"] is False and rep["appended_chunks"] == fresh.count()
    assert read_token_shards(spark, out).count() == n_before + fresh.count()


def test_dsir_stage_selects_target_like_and_conserves(spark, sf_dir):
    """build_corpus(dsir_target=...) (late r15): stage 4c must (a) cut
    the corpus to ceil-ish keep_frac via the Gumbel-max race, (b)
    enrich the kept set toward the target domain relative to the
    pre-stage corpus (the DSIR property), (c) keep every invariant
    green with pack/token censuses equal to the SELECTED corpus, and
    (d) reject a nonsense keep_frac at entry."""
    docs = load_table(spark, sf_dir, "documents")
    base = build_corpus(docs, rules=RULES, minhash_threshold=0.3)
    sel = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        dsir_target=F.col("lang") == "en", dsir_keep_frac=0.5,
        dsir_buckets=512, bpe_merges=5,
    )
    assert_corpus_invariants(sel)
    led = sel["ledger"]
    assert "dsir" in led
    n_before = led["span_removal"]["docs"]
    assert led["dsir"]["docs"] == max(1, int(n_before * 0.5))
    assert led["pack"]["tokens"] == led["dsir"]["tokens"]
    assert sum(led["split"].values()) == led["dsir"]["docs"]

    def en_frac(fd):
        kept = docs.join(fd.select("doc_id"), "doc_id", "left_semi")
        n = kept.count()
        return kept.filter(F.col("lang") == "en").count() / n

    assert en_frac(sel["final_docs"]) > en_frac(base["final_docs"])

    with pytest.raises(ValueError, match="dsir_keep_frac"):
        build_corpus(
            docs, rules=RULES, minhash_threshold=0.3,
            dsir_target=F.col("lang") == "en", dsir_keep_frac=0.0,
        )


def test_streaming_dsir_twin_equals_batch(spark, sf_dir, tmp_path):
    """Frozen-model DSIR in the streaming sink (late r15): two
    availableNow waves with (lam, threshold) derived ONCE from the
    full snapshot must leave exactly the state the batch path leaves
    with the same frozen pair — the keep is a pure function of
    (id, text) folded through a λ array literal, so wave boundaries
    and redelivery cannot change the kept set."""
    import os

    from cdc_demo_spark.operators.corpus_pipeline import corpus_stream_sink
    from cdc_demo_spark.operators.importance import (
        dsir_keep_expr,
        dsir_score_expr,
        freeze_dsir_ratios,
    )
    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
    from cdc_demo_spark.operators.incremental_tokens import TokenCountIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    docs = docs.localCheckpoint(eager=True)
    snapshot = docs.filter(quality_keep_expr("text", RULES))
    lam = freeze_dsir_ratios(
        snapshot, "text", "doc_id", F.col("lang") == "en", n_buckets=512
    )
    # threshold = the snapshot's median race key (the rank-k cutoff an
    # epoch would freeze alongside the model)
    keys = sorted(
        r["k"]
        for r in snapshot.select(
            dsir_score_expr(lam, "text", "doc_id").alias("k")
        ).collect()
    )
    threshold = keys[len(keys) // 2]

    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    os.makedirs(land)
    mh = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12)
    tk = TokenCountIndex(spark, str(tmp_path / "tk"))
    sink = corpus_stream_sink(mh, tk, rules=RULES, dsir_model=(lam, threshold))

    def run_wave(pred, prefix):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{prefix}")
        )
        for i, name in enumerate(
            f for f in os.listdir(tmp_path / f"stage_{prefix}")
            if f.endswith(".parquet")
        ):
            os.rename(
                tmp_path / f"stage_{prefix}" / name, f"{land}/{prefix}-{i}.parquet"
            )
        finished = (
            spark.readStream.schema(docs.schema)
            .parquet(land)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )
        assert finished, f"wave {prefix} did not terminate within 180s"

    mid = 250
    run_wave(F.col("doc_id") < mid, "w1")
    run_wave(F.col("doc_id") >= mid, "w2")

    kept = docs.filter(
        quality_keep_expr("text", RULES)
        & dsir_keep_expr(lam, threshold, "text", "doc_id")
    )
    n_kept = kept.count()
    assert 0 < n_kept < snapshot.count()  # the threshold actually cuts
    got_counts = {(r["token"], r["cnt"]) for r in tk.counts().collect()}
    want_counts = {
        (r["token"], r["cnt"])
        for r in kept.select(
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("token")
        ).groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_counts == want_counts
    from cdc_demo_spark.operators.dedup import minhash_near_duplicates

    got_pairs = {(r["id_a"], r["id_b"]) for r in mh.stored_pairs().collect()}
    want_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            kept, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
        ).collect()
    }
    assert got_pairs == want_pairs


def test_append_crash_recovery_and_staging_invisibility(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Write-ahead append protocol (r16, ADVICE): a crash between the
    manifest claim and the file moves must leave NOTHING reader-visible
    (the delta is staged in a hidden dir), and replaying the SAME
    batch_id must finish the moves instead of doubling rows; after
    recovery reader == manifest.  Also: a leftover staging dir from a
    pre-claim crash is discarded and re-staged, not double-counted."""
    import json
    import os

    from cdc_demo_spark.operators import corpus_pipeline as cp

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(docs, rules=RULES, minhash_threshold=0.3, bpe_merges=5)
    toks = res["tokens"]
    ids = sorted(r["doc_id"] for r in toks.select("doc_id").distinct().collect())
    base_ids, delta_ids = ids[: len(ids) // 2], ids[len(ids) // 2:]
    base = toks.filter(F.col("doc_id").isin(base_ids))
    delta = toks.filter(F.col("doc_id").isin(delta_ids))

    out = str(tmp_path / "shards")
    cp.write_token_shards(base, out, n_shards=4)
    n_base = cp.read_token_shards(spark, out).count()
    n_delta = delta.count()

    # simulate a crash immediately after the manifest claim: the move
    # half never runs
    real_finish = cp._finish_pending_append

    def _boom(path, manifest, batch_id):
        raise RuntimeError("simulated crash before file moves")

    monkeypatch.setattr(cp, "_finish_pending_append", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cp.append_token_shards(delta, out, batch_id="b1")
    monkeypatch.setattr(cp, "_finish_pending_append", real_finish)

    # crashed state: batch claimed + pending, rows NOT reader-visible
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    assert manifest["applied_batches"] == ["b1"]
    assert "b1" in manifest["pending_appends"]
    assert cp.read_token_shards(spark, out).count() == n_base

    # replaying the same batch recovers: moves finish, marker clears,
    # rows appear EXACTLY once, manifest == reader
    rep = cp.append_token_shards(delta, out, batch_id="b1")
    assert rep["replayed"] is True and rep.get("recovered") is True
    after = cp.read_token_shards(spark, out)
    assert after.count() == n_base + n_delta
    m2 = json.load(open(os.path.join(out, "_manifest.json")))
    assert "pending_appends" not in m2
    reader_census = {
        f"{r['split']}/{int(r['shard']):02d}": int(r["c"])
        for r in after.groupBy("split", "shard")
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["chunks"] for k, v in m2["shards"].items()} == reader_census
    # a further replay is a pure no-op
    rep3 = cp.append_token_shards(delta, out, batch_id="b1")
    assert rep3 == {"appended_chunks": 0, "dirs_touched": 0, "replayed": True}
    assert cp.read_token_shards(spark, out).count() == n_base + n_delta

    # pre-claim crash leftovers: a junk staging dir for a NEW batch id
    # is discarded and re-staged — content lands exactly once
    import hashlib

    junk = os.path.join(
        out, "_append_staging", hashlib.md5(b"b2").hexdigest()[:16]
    )
    os.makedirs(os.path.join(junk, "split=train", "shard=0"), exist_ok=True)
    with open(os.path.join(junk, "split=train", "shard=0", "junk.parquet"), "w") as f:
        f.write("not parquet")
    fresh = toks.filter(F.col("doc_id").isin(base_ids))  # content irrelevant here
    # re-sending base under a fresh id is the caller-bug vector; we only
    # need the staging-reset path, so erase base rows first
    cp.erase_docs_from_token_shards(spark, out, base_ids)
    rep4 = cp.append_token_shards(fresh, out, batch_id="b2")
    assert rep4["replayed"] is False and rep4["appended_chunks"] == fresh.count()
    assert cp.read_token_shards(spark, out).count() == n_delta + fresh.count()


def test_block_index_failed_write_leaves_no_orphan(spark, sf_dir, tmp_path):
    """write_block_index (r16, ADVICE): validation runs BEFORE anything
    lands on disk — a census mismatch raises with no _blocks dir (or
    staging leftovers) created, and a corrected re-run succeeds instead
    of tripping over an orphan."""
    import os

    from cdc_demo_spark.operators.corpus_pipeline import (
        write_block_index,
        write_token_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    res = build_corpus(
        docs, rules=RULES, minhash_threshold=0.3,
        emit_segments=True, bpe_merges=5,
    )
    out = str(tmp_path / "shards4")
    write_token_shards(res["tokens"], out, n_shards=4)  # != blocks' key
    with pytest.raises(ValueError, match="disagrees"):
        write_block_index(res["blocks"], out)
    assert not os.path.exists(os.path.join(out, "_blocks"))
    assert not os.path.exists(os.path.join(out, "_blocks_staging"))

    # corrected layout: same call now succeeds (no orphan in the way)
    out2 = str(tmp_path / "shards_ok")
    write_token_shards(res["tokens"], out2)
    idx = write_block_index(res["blocks"], out2)
    assert idx and os.path.isdir(os.path.join(out2, "_blocks"))
    with pytest.raises(ValueError, match="already exists"):
        write_block_index(res["blocks"], out2)


def test_swap_in_dir_is_recoverable_and_cleans_leftovers(tmp_path):
    """_swap_in_dir (r16, ADVICE): the live dir is renamed aside to a
    HIDDEN sibling before the staged dir moves in (every intermediate
    state keeps the rows reachable), and a leftover _old_ dir from a
    prior crash is cleaned up on the next swap."""
    import os

    from cdc_demo_spark.operators.corpus_pipeline import _swap_in_dir

    target = tmp_path / "shard=3"
    staged = tmp_path / "staging" / "shard=3"
    target.mkdir()
    staged.mkdir(parents=True)
    (target / "old.parquet").write_text("old")
    (staged / "new.parquet").write_text("new")
    # plant a leftover aside dir from a simulated prior crash
    leftover = tmp_path / "_old_shard=3"
    leftover.mkdir()
    (leftover / "stale.parquet").write_text("stale")

    _swap_in_dir(str(staged), str(target))
    assert sorted(os.listdir(target)) == ["new.parquet"]
    assert not leftover.exists()
    assert not staged.exists()


def test_blocklist_rule_in_quality_stage(spark, sf_dir):
    """quality_keep_expr blocklist (r16): with a blocklist + cap in the
    rules, the quality stage additionally drops docs whose blocked
    fraction exceeds the cap; the predicate stays a pure expression so
    build_corpus' ledger census equals a direct filter count; without
    the keys, behavior is byte-identical to the old rules."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(quality_keep_expr("text", RULES))
    bl_rules = {**RULES, "blocklist": ["slow", "dup"], "max_blocked_frac": 0.02}
    kept = docs.filter(quality_keep_expr("text", bl_rules))
    n_base, n_kept = base.count(), kept.count()
    assert n_kept < n_base, "blocklist rule should cut something"
    # every survivor honors the cap; every base-survivor over it is gone
    # (raw split, matching the rule's own tokenization)
    toks = F.split(F.col("text"), " ")
    frac = (
        F.size(F.filter(F.col("__toks"), lambda w: w.isin("slow", "dup")))
        / F.size("__toks")
    )
    over = (
        kept.select("doc_id", toks.alias("__toks"))
        .filter(frac > 0.02).count()
    )
    assert over == 0
    # composed: the pipeline's quality ledger matches the direct filter
    res = build_corpus(docs, rules=bl_rules, minhash_threshold=0.3)
    assert res["ledger"]["quality"]["docs"] == n_kept
