"""Text-analysis operator tests (B53)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.operators import text as T
from cdc_demo_spark.sources.tables import load_table


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "a bb ccc dddd eeeee")], "id long, text string")
    row = df.select(
        T.token_count("text").alias("n"),
        T.bpe_ish_token_count("text").alias("bpe"),
    ).collect()[0]
    assert row["n"] == 5
    # ceil(len/4): 1,1,1,1,2 -> 6
    assert row["bpe"] == 6


def test_quality_features_ranges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = T.with_text_features(docs.limit(50))
    for r in feats.collect():
        assert 0 <= r["punct_ratio"] <= 1
        assert 0 <= r["alpha_ratio"] <= 1
        assert 0 <= r["stopword_ratio"] <= 1
        assert r["n_tokens"] > 0
        assert len(r["fingerprint"]) == 32


def test_predict_lang_prefers_stopword_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it was the best"),
            (2, "el perro y la casa de los gatos en un dia"),
            (3, "le chat et le chien dans les maisons des gens"),
            (4, "der hund und die katze ist von den leuten im haus"),
            (5, "qqq www zzz xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lg"] for r in df.select("id", T.predict_lang("text").alias("lg")).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_rolling_hash_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "abcdefghijklmnop"), (2, "abcdefghijklmnop")],
                               "id long, text string")
    vals = [r["f"] for r in df.select(T.rolling_hash_fingerprint("text").alias("f")).collect()]
    assert vals[0] == vals[1] and vals[0] is not None


def test_lang_id_query_runs_deterministically(spark, sf_dir):
    from cdc_demo_spark.queries import QUERIES

    a = sorted(map(tuple, QUERIES["q_lang_id"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["q_lang_id"](spark, sf_dir).collect()))
    assert a == b


def test_chunking_covers_all_tokens(spark):
    from cdc_demo_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))), (2, "a b c")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts at 0,48,96 -> 3 chunks; last has 150-96=54 tokens
    assert len(by_doc[1]) == 3
    assert [r["n_tokens"] for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])] == [64, 64, 54]
    # overlap: chunk k starts with the last 16 tokens of chunk k-1
    c = {r["chunk_id"]: r["chunk_text"].split() for r in by_doc[1]}
    assert c[0][48:] == c[1][:16]
    # short doc: one chunk, whole text
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"


def test_packing_invariants(spark):
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", " ".join(f"w{j}" for j in range(40 + (i * 13) % 90)))
         for i in range(30)],
        "doc_id long, group string, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", "group"), "doc_id"
    )
    blocks = pack_chunks(chunks, "group", block_tokens=256).collect()
    total_chunks = chunks.count()
    assert sum(r["n_chunks"] for r in blocks) == total_chunks  # nothing lost
    for r in blocks:
        assert r["total_tokens"] <= 256 or r["n_chunks"] == 1  # budget kept
    # deterministic across runs
    again = pack_chunks(chunks, "group", block_tokens=256).collect()
    key = lambda r: (r["group"], r["block_id"])  # noqa: E731
    assert sorted(map(tuple, blocks), key=lambda t: (t[0], t[1])) == \
           sorted(map(tuple, again), key=lambda t: (t[0], t[1]))


def test_packing_segment_layout_invariants(spark):
    """emit_segments=True (r15): per-block segment arrays must (a) have
    n_chunks entries each, (b) sum seg_tokens to total_tokens, (c) be
    exact exclusive prefix sums in seg_offsets (offset 0 first, last
    offset + last length == total_tokens), (d) cover the chunk set
    exactly once across all blocks — the same conservation as the
    census, now at (doc, chunk) identity grain — and (e) hold under
    strategy='nfd' too (pack order differs, invariants don't)."""
    from cdc_demo_spark.operators.chunking import chunk_documents
    from cdc_demo_spark.operators.packing import pack_chunks

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", " ".join(f"w{j}" for j in range(40 + (i * 13) % 90)))
         for i in range(30)],
        "doc_id long, group string, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48).join(
        docs.select("doc_id", "group"), "doc_id"
    )
    all_chunks = sorted(
        (r["doc_id"], r["chunk_id"]) for r in chunks.select("doc_id", "chunk_id").collect()
    )
    for strategy in ("greedy", "nfd"):
        rows = pack_chunks(
            chunks, "group", block_tokens=256, strategy=strategy,
            emit_segments=True,
        ).collect()
        seen = []
        for r in rows:
            n = r["n_chunks"]
            assert len(r["seg_doc_ids"]) == len(r["seg_chunk_ids"]) == n
            assert len(r["seg_tokens"]) == len(r["seg_offsets"]) == n
            assert sum(r["seg_tokens"]) == r["total_tokens"]
            assert r["seg_offsets"][0] == 0
            for i in range(1, n):
                assert (
                    r["seg_offsets"][i]
                    == r["seg_offsets"][i - 1] + r["seg_tokens"][i - 1]
                )
            assert r["seg_offsets"][-1] + r["seg_tokens"][-1] == r["total_tokens"]
            assert sorted(set(r["seg_doc_ids"])) == r["doc_ids"]
            seen.extend(zip(r["seg_doc_ids"], r["seg_chunk_ids"]))
        assert sorted(seen) == all_chunks, strategy  # exactly-once cover


def test_packing_property_matches_sequential_fold(spark):
    """Property: the cumsum/searchsorted packer must block exactly like
    the obvious sequential greedy fold, across random chunk mixes
    including oversized chunks."""
    import random

    def reference_fold(tokens, budget):
        blocks, cur, cur_tokens = [], [], 0
        for t in tokens:
            if cur_tokens + t > budget and cur:
                blocks.append((len(cur), cur_tokens))
                cur, cur_tokens = [], 0
            cur.append(t)
            cur_tokens += t
            if cur_tokens >= budget:
                blocks.append((len(cur), cur_tokens))
                cur, cur_tokens = [], 0
        if cur:
            blocks.append((len(cur), cur_tokens))
        return blocks

    from cdc_demo_spark.operators.packing import pack_chunks

    rng = random.Random(17)
    for trial in range(6):
        budget = rng.choice([64, 100, 256])
        sizes = [
            rng.choice([1, 5, 17, 40, 63, 64, 65, budget, budget + 50])
            for _ in range(rng.randrange(1, 60))
        ]
        chunks = spark.createDataFrame(
            [(0, i, "g", s) for i, s in enumerate(sizes)],
            "doc_id long, chunk_id long, group string, n_tokens long",
        )
        got = sorted(
            (r["block_id"], r["n_chunks"], r["total_tokens"])
            for r in pack_chunks(chunks, "group", block_tokens=budget).collect()
        )
        want = [(i, n, t) for i, (n, t) in enumerate(reference_fold(sizes, budget))]
        assert got == want, f"trial {trial}: budget={budget} sizes={sizes}"


def test_kneser_ney_perplexity_model_and_separation(spark, sf_dir):
    """kneser_ney_perplexity (r16): (1) on a hand-computable corpus
    the per-bigram probabilities match an independent pure-Python
    replay of the interpolated-KN formula exactly; (2) at fixture
    scale, the English slice the model was fit on scores itself lower
    (mean ppl) than the rest of the pool — the separation the CCNet
    filter exists for; (3) sub-2-token docs drop out."""
    import math

    rows = [
        (1, "a b a c", True),
        (2, "a b b", True),
        (3, "c a b", False),   # pool-only: unseen bigram (c,a) hits backoff
        (4, "x", False),       # 1 token -> no bigrams -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in T.kneser_ney_perplexity(df, F.col("is_t")).collect()
    }
    assert set(got) == {1, 2, 3}

    # pure-python replay of the model fit on docs 1-2
    target = ["a b a c".split(), "a b b".split()]
    c2: dict = {}
    for t in target:
        for x, y in zip(t, t[1:]):
            c2[(x, y)] = c2.get((x, y), 0) + 1
    ctx = {}
    n_after = {}
    n_before = {}
    for (x, y), c in c2.items():
        ctx[x] = ctx.get(x, 0) + c
        n_after[x] = n_after.get(x, 0) + 1
        n_before[y] = n_before.get(y, 0) + 1
    N = float(len(c2))
    V = float(len({w for t in target for w in t}))
    D = 0.75

    def prob(x, y):
        pc = (n_before.get(y, 0) + 1) / (N + V)
        if x in ctx:
            return (
                max(c2.get((x, y), 0) - D, 0.0) / ctx[x]
                + (D * n_after[x] / ctx[x]) * pc
            )
        return pc

    for doc_id, text, _ in rows:
        toks = text.split()
        if len(toks) < 2:
            assert doc_id not in got
            continue
        ps = [prob(x, y) for x, y in zip(toks, toks[1:])]
        want_ppl = math.exp(-sum(math.log(p) for p in ps) / len(ps))
        n, ppl = got[doc_id]
        assert n == len(ps)
        assert abs(ppl - want_ppl) < 1e-9, (doc_id, ppl, want_ppl)

    # fixture-scale separation: the slice the model is fit on scores
    # itself lower than the pool
    docs = load_table(spark, sf_dir, "documents")
    sep = {
        bool(r["is_en"]): r["m"]
        for r in T.kneser_ney_perplexity(docs, F.col("lang") == "en")
        .join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    assert sep[True] < sep[False], sep
