"""BPE trainer: exact merge-list equality with a pure-Python
Sennrich-style reference, fold-semantics unit cases, and tokenizer
invariants.  (The third verification layer — the unrolled-SQL DuckDB
oracle — lives on q_bpe_train in queries/corpusops.py.)"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_demo_spark.operators.bpe import bpe_tokenize, train_bpe, word_frequencies
from cdc_demo_spark.sources.tables import load_table


def ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sennrich et al. (ACL 2016) reference: greedy non-overlapping
    left-to-right merge application, argmax = count desc then (lhs,
    rhs) lexicographic."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, toks in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += word_freqs[w]
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == lhs and toks[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges


def ref_apply(word: str, merges) -> list[str]:
    toks = list(word)
    for _, lhs, rhs, _, _ in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == lhs and toks[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def _corpus_word_freqs(spark, sf_dir) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    return {
        r["word"]: r["freq"]
        for r in word_frequencies(docs).collect()
    }


def test_train_bpe_equals_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["cnt"])
        for r in train_bpe(docs, n_merges=20).collect()
    ]
    want = [
        (r, l, rt, m, c) for r, l, rt, m, c in
        ref_bpe(_corpus_word_freqs(spark, sf_dir), 20)
    ]
    assert got == want


def test_merge_fold_unit_cases(spark):
    # overlapping run: greedy left-to-right takes alternate positions
    cases = [
        ("aaa", ("a", "a"), ["aa", "a"]),
        ("aaaa", ("a", "a"), ["aa", "aa"]),
        ("abab", ("a", "b"), ["ab", "ab"]),
        ("aab", ("a", "b"), ["a", "ab"]),
        ("xyz", ("p", "q"), ["x", "y", "z"]),  # no match: unchanged
    ]
    df = spark.createDataFrame([(w,) for w, _, _ in cases], "text string")
    for word, (lhs, rhs), want in cases:
        got = (
            bpe_tokenize(
                spark.createDataFrame([(word,)], "text string"),
                "text",
                [(lhs, rhs)],
            )
            .collect()[0]["tokens"]
        )
        assert got == want, (word, lhs, rhs, got, want)


def test_tokenize_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = [
        (r["lhs"], r["rhs"]) for r in train_bpe(docs, n_merges=8).collect()
    ]
    out = bpe_tokenize(docs, "text", merges).select("doc_id", "text", "tokens")
    for r in out.collect():
        # lossless: concatenated tokens reconstruct the text minus spaces
        assert "".join(r["tokens"]) == r["text"].replace(" ", "")
        # reference agreement per word
        want = []
        for w in r["text"].split(" "):
            if w:
                want.extend(
                    ref_apply(w, [(0, l, rt, l + rt, 0) for l, rt in merges])
                )
        assert r["tokens"] == want


def test_early_stop_when_pairs_exhaust(spark):
    # single-char words have no adjacent pairs at all: zero merges
    df = spark.createDataFrame([("a b c a",)], "text string")
    assert train_bpe(df, n_merges=5).count() == 0
    # two-char vocabulary exhausts after one merge per word shape
    df2 = spark.createDataFrame([("ab ab cd",)], "text string")
    got = train_bpe(df2, n_merges=5).collect()
    assert [(r["rank"], r["merged"], r["cnt"]) for r in got] == [
        (1, "ab", 2),
        (2, "cd", 1),
    ]


def test_no_python_in_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from cdc_demo_spark.operators.bpe import _merge_fold, _pair_counts

    words = word_frequencies(docs).select(
        "word", "freq", F.split("word", "").alias("toks")
    )
    plan = _pair_counts(words)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan2 = (
        words.select(_merge_fold(F.col("toks"), "a", "b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_auto_vocab_partitions_sizing():
    """r12 ADVICE #4: the fixed default of 8 was a scalability cliff;
    "auto" sizes one partition per ~50k vocabulary words, clamped to
    [8, shuffle.partitions]."""
    from cdc_demo_spark.operators.bpe import auto_vocab_partitions

    assert auto_vocab_partitions(1, 32) == 8           # floor
    assert auto_vocab_partitions(50_000, 32) == 8      # bench-scale vocab
    assert auto_vocab_partitions(500_000, 32) == 10    # 10 x 50k chunks
    assert auto_vocab_partitions(10_000_000, 32) == 32   # clamped to shuffle
    assert auto_vocab_partitions(100_000_000, 2048) == 2000  # web scale, roomy cap
    assert auto_vocab_partitions(10, 4) == 8           # cap never below floor


def test_train_bpe_auto_matches_pinned(spark, sf_dir):
    """The auto default must be a pure physical-layout choice: merges
    bit-identical to both the r12 pinned-8 path and the no-coalesce
    path."""
    docs = load_table(spark, sf_dir, "documents")

    def merge_list(vp):
        return [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["cnt"])
            for r in train_bpe(docs, n_merges=10, vocab_partitions=vp).collect()
        ]

    auto = merge_list("auto")
    assert auto == merge_list(8) == merge_list(None)
    assert len(auto) == 10


def test_train_bpe_distributed_path_equals_driver(spark, sf_dir):
    """r16 ADVICE (medium): driver_vocab_cap=500k routes every fixture
    to the driver replica, leaving the distributed merge loop — the
    production path above the cap — untested.  Force it with
    driver_vocab_cap=0 and pin merge-table equality with the driver
    path so future edits to either side can't silently diverge."""
    docs = load_table(spark, sf_dir, "documents")

    def merge_list(cap):
        return [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["cnt"])
            for r in train_bpe(
                docs, n_merges=8, driver_vocab_cap=cap
            ).collect()
        ]

    distributed = merge_list(0)
    driver = merge_list(500_000)
    assert distributed == driver
    assert len(driver) == 8


def test_word_cache_tokenize_equals_inline(spark, sf_dir):
    """The r13 vocabulary-grain encode path (distinct words -> join
    back -> positional reassembly) must equal the per-occurrence fold
    chain token-for-token, under BOTH vocab encoders."""
    from cdc_demo_spark.operators.bpe import encode_words

    docs = load_table(spark, sf_dir, "documents").limit(80)
    merges = [
        (r["lhs"], r["rhs"]) for r in train_bpe(docs, n_merges=10).collect()
    ]
    want = {
        r["doc_id"]: r["tokens"]
        for r in bpe_tokenize(docs, "text", merges).select("doc_id", "tokens").collect()
    }
    for impl in ("fold", "rank"):
        got = {
            r["doc_id"]: r["tokens"]
            for r in bpe_tokenize(
                docs, "text", merges, id_col="doc_id", impl=impl
            ).select("doc_id", "tokens").collect()
        }
        assert got == want, f"impl={impl}"


def test_rank_encoder_equals_fold_on_trained_merges(spark, sf_dir):
    """Priority (lowest-rank-present) encoding == sequential fold for
    a trainer-produced merge list — the born-symbol argument made
    testable (encode_words docstring)."""
    from cdc_demo_spark.operators.bpe import encode_words

    docs = load_table(spark, sf_dir, "documents").limit(120)
    merges = [
        (r["lhs"], r["rhs"]) for r in train_bpe(docs, n_merges=16).collect()
    ]
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    fold = {r["word"]: r["toks"] for r in encode_words(vocab, merges, impl="fold").collect()}
    rank = {r["word"]: r["toks"] for r in encode_words(vocab, merges, impl="rank").collect()}
    assert fold == rank
    # and both reconstruct every word losslessly
    for w, toks in fold.items():
        assert "".join(toks) == w


def test_word_cache_tokenize_empty_text(spark):
    """Docs whose text has no words regroup to NO row in the word-cache
    path; the left join + coalesce must hand back the inline path's
    empty array, not NULL."""
    df = spark.createDataFrame(
        [(1, "ab ab"), (2, ""), (3, "   ")], "id long, text string"
    )
    out = {
        r["id"]: r["tokens"]
        for r in bpe_tokenize(df, "text", [("a", "b")], id_col="id").collect()
    }
    assert out[1] == ["ab", "ab"]
    assert out[2] == [] and out[3] == []


def test_priority_hazard_detection_and_sequential_fallback(spark):
    """r13 review finding #4: a merge list where an operand string is
    also producible by a LATER merge can make priority encoding
    diverge from the fold reference.  The hazard detector must flag
    such lists and the rank impl must then match fold exactly."""
    from cdc_demo_spark.operators.bpe import _priority_hazard, encode_words

    # operand use of 'abab' at rank 1, production of 'abab' at rank 2:
    # a token 'abab' born via rank 2 would trigger the rank-1 merge
    # under priority order, which the sequential fold never applies
    hazardous = [("a", "b"), ("x", "abab"), ("ab", "ab")]
    assert _priority_hazard(hazardous)
    clean = [("a", "b"), ("ab", "c"), ("abc", "d")]
    assert not _priority_hazard(clean)

    # the divergence word: 'xabab' — fold applies (a,b) twice, never
    # (x,abab) (born later); naive priority WOULD apply it.  With the
    # fallback, rank must equal fold.
    vocab = spark.createDataFrame([("xabab",), ("abab",)], "word string")
    fold = {r["word"]: r["toks"] for r in encode_words(vocab, hazardous, impl="fold").collect()}
    rank = {r["word"]: r["toks"] for r in encode_words(vocab, hazardous, impl="rank").collect()}
    assert fold == rank, (fold, rank)


def test_duplicate_pair_rank_is_first_occurrence(spark):
    """r13 ADVICE (medium): a merge list containing a DUPLICATE pair
    must not let the duplicate's later rank steal priority.  For
    [(a,b),(b,c),(a,b)] the fold encodes 'abc' to ['ab','c'] (the
    first (a,b) wins; the duplicate is a no-op); a last-wins rank
    dict gave (a,b) rank 2 so priority picked (b,c) first and
    produced ['a','bc'].  Ranks are now first-occurrence-wins, and
    duplicates in non-hazard lists are provably no-ops (no 'a'/'b'
    token is ever born after the first pass — that birth shape IS
    the _priority_hazard route)."""
    from cdc_demo_spark.operators.bpe import _priority_hazard, encode_words

    dup = [("a", "b"), ("b", "c"), ("a", "b")]
    assert not _priority_hazard(dup)  # no operand string is produced later

    vocab = spark.createDataFrame([("abc",), ("ababc",), ("bcbc",)], "word string")
    fold = {r["word"]: r["toks"] for r in encode_words(vocab, dup, impl="fold").collect()}
    rank = {r["word"]: r["toks"] for r in encode_words(vocab, dup, impl="rank").collect()}
    assert fold["abc"] == ["ab", "c"]
    assert fold == rank, (fold, rank)

    # duplicate inside a hazard-bearing list still routes sequential
    dup_hazard = [("a", "b"), ("x", "ab"), ("a", "b")]
    assert _priority_hazard(dup_hazard)
    vocab2 = spark.createDataFrame([("xab",), ("xabab",)], "word string")
    f2 = {r["word"]: r["toks"] for r in encode_words(vocab2, dup_hazard, impl="fold").collect()}
    r2 = {r["word"]: r["toks"] for r in encode_words(vocab2, dup_hazard, impl="rank").collect()}
    assert f2 == r2, (f2, r2)


def test_token_id_map_scheme(spark):
    """Base chars sorted get 0..C-1; distinct merged strings get C, C+1
    in first-occurrence order; two merges producing the same STRING
    share one id (the map is keyed by what the encoder emits)."""
    from cdc_demo_spark.operators.bpe import token_id_map

    vocab = spark.createDataFrame([("cab",), ("abc",)], "word string")
    merges = [("a", "b"), ("ab", "c"), ("a", "bc"), ("a", "b")]
    m = {r["tok"]: r["tok_id"] for r in token_id_map(vocab, merges).collect()}
    assert m == {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}  # 'abc' deduped, (a,b) dup no-op


def test_encode_corpus_ids_roundtrip_and_coverage(spark, sf_dir):
    """Every emitted id decodes back to its token string and the
    decoded stream re-concatenates to the original non-empty words —
    i.e. the id map covers everything the encoder can emit (the inner
    join drops nothing) and positional order survives the regroup."""
    from cdc_demo_spark.operators.bpe import (
        encode_corpus_ids, token_id_map, train_bpe,
    )
    from cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    merges = [
        (r["lhs"], r["rhs"]) for r in train_bpe(docs, "text", n_merges=8).collect()
    ]
    out = encode_corpus_ids(docs, "text", merges, key_cols=["doc_id"])
    assert out.count() == docs.count()
    nonempty = F.filter(F.split("text", " "), lambda w: w != "")
    vocab = docs.select(F.explode(nonempty).alias("word")).distinct()
    inv = {r["tok_id"]: r["tok"] for r in token_id_map(vocab, merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    checked = 0
    for r in out.collect():
        expect = "".join(w for w in texts[r["doc_id"]].split(" ") if w != "")
        got = "".join(inv[i] for i in r["token_ids"])
        assert got == expect, r["doc_id"]
        assert r["n_bpe_tokens"] == len(r["token_ids"])
        assert r["n_words"] == sum(1 for w in texts[r["doc_id"]].split(" ") if w)
        checked += 1
    assert checked == 60


def test_encode_corpus_ids_composite_key_and_empty_rows(spark):
    from cdc_demo_spark.operators.bpe import encode_corpus_ids

    df = spark.createDataFrame(
        [(1, 0, "ab ab c"), (1, 1, ""), (2, 0, "   "), (2, 1, "b a")],
        "doc_id long, chunk_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in encode_corpus_ids(
            df, "text", [("a", "b")], key_cols=["doc_id", "chunk_id"]
        ).collect()
    }
    assert len(out) == 4
    # ids: chars sorted -> a=0, b=1, c=2; merge ab=3
    assert out[(1, 0)]["token_ids"] == [3, 3, 2]
    assert out[(1, 1)]["token_ids"] == [] and out[(2, 0)]["token_ids"] == []
    assert out[(2, 1)]["token_ids"] == [1, 0]  # 'b a' never merges
    assert out[(2, 1)]["n_words"] == 2 and out[(1, 1)]["n_words"] == 0


def test_encode_corpus_ids_rejects_reserved_key_cols(spark):
    """ADVICE r14: a key_cols entry colliding with the encoder's
    internal column names ('word', '_pos', '_ids', 'n_words',
    'n_bpe_tokens') or with out_col would make the posexplode select /
    word→ids join ambiguous — must fail loudly up front, not
    misbehave downstream."""
    import pytest

    from cdc_demo_spark.operators.bpe import encode_corpus_ids

    df = spark.createDataFrame(
        [(1, "w", "ab")], "doc_id long, word string, text string"
    )
    for bad in (["word"], ["doc_id", "word"], ["n_words"], ["token_ids"]):
        with pytest.raises(ValueError, match="collide"):
            encode_corpus_ids(df, "text", [("a", "b")], key_cols=bad)
    # out_col participates in the reserved set too
    with pytest.raises(ValueError, match="collide"):
        encode_corpus_ids(
            df, "text", [("a", "b")], key_cols=["doc_id"], out_col="doc_id"
        )
    # a clean key next to a column NAMED like a reserved word that is
    # NOT in key_cols is fine (only key_cols are selected)
    ok = encode_corpus_ids(df, "text", [("a", "b")], key_cols=["doc_id"])
    assert ok.collect()[0]["token_ids"] == [2]  # a=0,b=1,ab=2


def test_encode_chunked_equals_chunk_then_encode(spark):
    """encode_chunked_corpus_ids (encode at DOC grain, slice per-word
    id arrays on the shared chunk_starts boundaries) must equal the
    reference composition chunk_documents -> encode_corpus_ids at
    chunk grain — including on text with EMPTY slots (runs of spaces)
    and with an OVERLAPPING stride.  BPE merges never cross word
    boundaries, so the slice is exact, not approximate."""
    from cdc_demo_spark.operators.bpe import (
        encode_chunked_corpus_ids, encode_corpus_ids,
    )
    from cdc_demo_spark.operators.chunking import chunk_documents

    rows = []
    for i in range(30):
        words = [f"w{j % 7}ab" for j in range(5 + (i * 3) % 23)]
        if i % 4 == 0:
            words[2] = ""  # double space -> empty slot
        if i % 9 == 0:
            words.append("")
        rows.append((i, " ".join(words)))
    rows.append((97, ""))     # empty doc: one chunk, one empty slot
    rows.append((98, "   "))  # only separators
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [("a", "b"), ("w", "1"), ("w1", "ab")]

    for ct, st in [(6, 6), (6, 4)]:
        fast = {
            (r["doc_id"], r["chunk_id"]): (
                r["n_tokens"], r["n_words"], r["n_bpe_tokens"], r["token_ids"]
            )
            for r in encode_chunked_corpus_ids(
                df, "text", merges, "doc_id", chunk_tokens=ct, stride=st
            ).collect()
        }
        chunks = chunk_documents(df, "doc_id", "text", chunk_tokens=ct, stride=st)
        enc = encode_corpus_ids(
            chunks, "chunk_text", merges, key_cols=["doc_id", "chunk_id"]
        )
        ref = {
            (r["doc_id"], r["chunk_id"]): (
                r["n_tokens"], r["n_words"], r["n_bpe_tokens"], r["token_ids"]
            )
            for r in chunks.select("doc_id", "chunk_id", "n_tokens")
            .join(enc, ["doc_id", "chunk_id"])
            .collect()
        }
        assert fast == ref, (ct, st)


def test_encode_chunked_arrow_equals_jvm(spark):
    """r17: the zero-shuffle Arrow regroup must equal the JVM
    join+regroup row-for-row — including empty slots, trailing
    separators, empty/whitespace-only docs, NULL text (no rows),
    out-of-vocabulary words (empty ids, still counted in n_words),
    and exact chunk-boundary tiling."""
    from cdc_demo_spark.operators.bpe import encode_chunked_corpus_ids

    rows = []
    for i in range(40):
        words = [f"w{j % 7}ab" for j in range(1 + (i * 5) % 29)]
        if i % 4 == 0:
            words[0] = ""           # leading empty slot
        if i % 9 == 0:
            words.append("")        # trailing separator
        if i % 11 == 0:
            words.insert(min(2, len(words)), "zzunknownzz")  # OOV word
        rows.append((i, " ".join(words)))
    rows += [(97, ""), (98, "   "), (99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [("a", "b"), ("w", "1"), ("w1", "ab")]
    # vocabulary WITHOUT the OOV word: the arrow dict and the JVM left
    # join must both give it empty ids while counting it as a word
    vocab = (
        df.select(F.explode(F.split("text", " ")).alias("word"))
        .filter((F.col("word") != "") & (F.col("word") != "zzunknownzz"))
        .distinct()
    )

    def snap(out):
        return {
            (r["doc_id"], r["chunk_id"]): (
                r["n_tokens"], r["n_words"], r["n_bpe_tokens"], r["token_ids"]
            )
            for r in out.collect()
        }

    for ct in (4, 7, 64):
        jvm = snap(encode_chunked_corpus_ids(
            df, "text", merges, "doc_id", chunk_tokens=ct, regroup="jvm",
            vocab=vocab,
        ))
        arrow = snap(encode_chunked_corpus_ids(
            df, "text", merges, "doc_id", chunk_tokens=ct, regroup="arrow",
            vocab=vocab,
        ))
        assert arrow == jvm, ct
        assert not any(d == 99 for d, _ in arrow)  # NULL text: no rows
    # arrow plan is python-batched but shuffle-free: no Exchange at all
    out = encode_chunked_corpus_ids(
        df, "text", merges, "doc_id", chunk_tokens=8, regroup="arrow",
        vocab=vocab,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the driver word->ids replica must equal the distributed table —
    # non-hazard AND hazard-bearing merge lists
    from cdc_demo_spark.operators.bpe import _word_id_arrays, _word_id_rows_driver

    for ml in (merges, [("a", "bc"), ("b", "c")]):  # second list is a hazard
        dist = {
            r["word"]: list(r["_ids"])
            for r in _word_id_arrays(vocab, ml, "auto").collect()
        }
        drv = dict(_word_id_rows_driver(sorted(dist), ml))
        assert drv == dist, ml

    # guard rails
    import pytest

    with pytest.raises(ValueError, match="stride == chunk_tokens"):
        encode_chunked_corpus_ids(
            df, "text", merges, "doc_id", chunk_tokens=8, stride=4,
            regroup="arrow",
        )
    with pytest.raises(ValueError, match="driver_vocab_cap"):
        encode_chunked_corpus_ids(
            df, "text", merges, "doc_id", chunk_tokens=8, regroup="arrow",
            vocab=vocab, driver_vocab_cap=1,
        )


def test_decode_corpus_ids_literal_equals_join(spark, sf_dir):
    """decode_corpus_ids (r15): the literal strategy (V-row map as one
    plan literal, zero shuffle) and the join strategy (broadcast join
    + positional regroup, the arbitrarily-large-vocabulary path) must
    agree byte-for-byte on a real corpus, and both must satisfy the
    round-trip invariant decoded == text-with-spaces-removed."""
    from cdc_demo_spark.operators.bpe import (
        decode_corpus_ids, encode_corpus_ids, token_id_map, train_bpe,
    )
    from cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    merges = [
        (r["lhs"], r["rhs"]) for r in train_bpe(docs, "text", n_merges=6).collect()
    ]
    enc = encode_corpus_ids(docs, "text", merges, key_cols=["doc_id"])
    nonempty = F.filter(F.split("text", " "), lambda w: w != "")
    vocab = docs.select(F.explode(nonempty).alias("word")).distinct()
    idmap = token_id_map(vocab, merges)

    lit = {
        r["doc_id"]: (r["decoded"], r["n_unknown_ids"])
        for r in decode_corpus_ids(enc, "token_ids", idmap, impl="literal").collect()
    }
    jn = {
        r["doc_id"]: (r["decoded"], r["n_unknown_ids"])
        for r in decode_corpus_ids(
            enc, "token_ids", idmap, key_cols=["doc_id"], impl="join"
        ).collect()
    }
    assert lit == jn and len(lit) == 40
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, (decoded, unk) in lit.items():
        assert unk == 0
        assert decoded == texts[did].replace(" ", "")


def test_decode_corpus_ids_unknowns_and_guards(spark):
    """Unknown ids decode to nothing but are COUNTED (both
    strategies) — including NEGATIVE ids, which the literal path must
    not let try_element_at index from the END of the vocab array
    (-2 -> 'ab' would silently decode an invalid id to a real token);
    empty/NULL arrays decode to ''; a gapped map is rejected by the
    literal path; the join path enforces the same reserved-name
    contract as the encoder."""
    import pytest

    from cdc_demo_spark.operators.bpe import decode_corpus_ids

    idmap = spark.createDataFrame(
        [("a", 0), ("b", 1), ("ab", 2)], "tok string, tok_id int"
    )
    df = spark.createDataFrame(
        [(1, [2, 0, 99]), (2, []), (3, None), (4, [-2, 1, -1])],
        "doc_id long, token_ids array<int>",
    )
    for kwargs in ({"impl": "literal"}, {"impl": "join", "key_cols": ["doc_id"]}):
        got = {
            r["doc_id"]: (r["decoded"], r["n_unknown_ids"])
            for r in decode_corpus_ids(df, "token_ids", idmap, **kwargs).collect()
        }
        assert got == {
            1: ("aba", 1), 2: ("", 0), 3: ("", 0), 4: ("b", 2),
        }, kwargs

    gapped = spark.createDataFrame(
        [("a", 0), ("b", 2)], "tok string, tok_id int"
    )
    with pytest.raises(ValueError, match="dense"):
        decode_corpus_ids(df, "token_ids", gapped, impl="literal")
    with pytest.raises(ValueError, match="requires key_cols"):
        decode_corpus_ids(df, "token_ids", idmap, impl="join")
    bad = df.withColumnRenamed("doc_id", "tok_id")
    with pytest.raises(ValueError, match="collide"):
        decode_corpus_ids(bad, "token_ids", idmap, impl="join", key_cols=["tok_id"])
