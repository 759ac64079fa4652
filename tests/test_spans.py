"""Passage-level dedup (operators/spans.py): duplicated-span detection
and keep-one removal — Lee et al. ACL'22 exact substring dedup as
DataFrame algebra.

Contracts pinned here (the DuckDB oracles pin the fixture behavior;
these pin constructed edge cases the fixture may not contain):
- within-doc repetition counts as duplication (occ >= 2 is site-based,
  not doc-based);
- overlapping/adjacent duplicated positions merge into ONE maximal
  span; a gap > n splits;
- removal keeps exactly the globally-first site's tokens and never
  reorders survivors;
- sub-n documents are untouched and still present in removal output;
- on the planted synthetic corpus, every planted near-dup doc carries
  a duplicated span and removal strips the copy, not the original.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.operators.spans import (
    duplicated_spans,
    remove_duplicated_spans,
)
from cdc_demo_spark.sources.synth_docs import planted_doc_pairs, synth_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_span_detected_and_merged(spark):
    # docs 1 and 2 share tokens p1..p7 (three overlapping 5-grams in
    # each) — must merge to ONE span covering the shared run
    shared = "p1 p2 p3 p4 p5 p6 p7"
    d = _docs(
        spark,
        [
            (1, f"a1 a2 {shared} a3 a4"),
            (2, f"b1 {shared} b2 b3 b4 b5"),
        ],
    )
    spans = {
        (r["id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(d, "doc_id", "text", n=5).collect()
    }
    # doc 1: shared run at token positions 3..9; doc 2: positions 2..8
    assert spans == {(1, 3, 9), (2, 2, 8)}


def test_within_doc_repetition_counts(spark):
    d = _docs(spark, [(1, "x1 x2 x3 x4 x5 mid1 mid2 x1 x2 x3 x4 x5")])
    spans = {
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(d, "doc_id", "text", n=5).collect()
    }
    assert spans == {(1, 5), (8, 12)}


def test_gap_splits_spans(spark):
    shared_a = "s1 s2 s3 s4 s5"
    shared_b = "t1 t2 t3 t4 t5"
    d = _docs(
        spark,
        [
            (1, f"{shared_a} g1 g2 g3 g4 g5 g6 {shared_b}"),
            (2, f"{shared_a} h1 h2 h3 h4 h5 h6 {shared_b}"),
        ],
    )
    per_doc = {}
    for r in duplicated_spans(d, "doc_id", "text", n=5).collect():
        per_doc.setdefault(r["id"], set()).add((r["span_start"], r["span_end"]))
    assert per_doc[1] == {(1, 5), (12, 16)}
    assert per_doc[2] == {(1, 5), (12, 16)}


def test_removal_keeps_first_site_only(spark):
    shared = "c1 c2 c3 c4 c5"
    d = _docs(
        spark,
        [
            (3, f"pre {shared} post"),
            (7, f"{shared} tail1 tail2"),
            (9, f"lead1 lead2 {shared}"),
        ],
    )
    out = {r["id"]: r for r in remove_duplicated_spans(d, "doc_id", "text", n=5).collect()}
    # doc 3 holds the globally-first site (min doc_id): untouched
    assert out[3]["clean_text"] == f"pre {shared} post"
    assert out[3]["n_removed"] == 0
    assert out[7]["clean_text"] == "tail1 tail2"
    assert out[7]["n_removed"] == 5
    assert out[9]["clean_text"] == "lead1 lead2"
    assert out[9]["n_removed"] == 5


def test_short_docs_untouched_and_present(spark):
    d = _docs(spark, [(1, "only four tokens here"), (2, "tiny")])
    out = {r["id"]: r for r in remove_duplicated_spans(d, "doc_id", "text", n=5).collect()}
    assert out[1]["clean_text"] == "only four tokens here"
    assert out[2]["clean_text"] == "tiny"
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
    assert not duplicated_spans(d, "doc_id", "text", n=5).count()


def test_survivor_order_preserved(spark):
    # removal cuts a middle span; remaining tokens must keep original
    # relative order (the array_sort-struct rebuild, not collect_list
    # luck)
    shared = "m1 m2 m3 m4 m5"
    d = _docs(
        spark,
        [
            (1, shared),
            (2, f"z9 z8 {shared} z7 z6 z5"),
        ],
    )
    out = {r["id"]: r["clean_text"] for r in
           remove_duplicated_spans(d, "doc_id", "text", n=5).collect()}
    assert out[2] == "z9 z8 z7 z6 z5"


def test_hashed_path_equals_string_path(spark):
    n = 2000
    docs = synth_documents(spark, n).cache()
    s = {
        tuple(r) for r in duplicated_spans(docs, "doc_id", "text", n=5).collect()
    }
    h = {
        tuple(r)
        for r in duplicated_spans(docs, "doc_id", "text", n=5, hashed=True).collect()
    }
    assert s == h and s


def test_planted_corpus_spans_and_removal(spark):
    n = 3000
    docs = synth_documents(spark, n).cache()
    planted = planted_doc_pairs(n)
    dup_ids = {b for _, b in planted}
    base_ids = {a for a, _ in planted}
    spanned = {
        r["id"] for r in duplicated_spans(docs, "doc_id", "text", n=5)
        .select("id").distinct().collect()
    }
    # every planted pair member carries at least one duplicated span;
    # unrelated docs (50k vocab) essentially never do
    assert (dup_ids | base_ids) <= spanned
    assert len(spanned - dup_ids - base_ids) <= n // 100
    removed = {
        r["id"]: r["n_removed"]
        for r in remove_duplicated_spans(docs, "doc_id", "text", n=5).collect()
    }
    # the copy (higher id) loses most of its tokens; the base keeps
    # all (it is the globally-first site for every shared gram)
    assert all(removed[b] > 0 for b in dup_ids)
    assert all(removed[a] == 0 for a in base_ids)


def test_probe_catches_single_megadoc_viral_gram(spark):
    """r13 review finding #3: a viral gram concentrated in ONE huge doc
    is invisible to a document sample with probability ~(1-p); the
    probe's mega-doc branch must tokenize such docs exactly, so the
    estimate sees the gram at ANY probe fraction."""
    from cdc_demo_spark.operators.spans import probe_max_occ

    hot_occ = 50
    mega_text = " ".join(["a"] * 300)  # one doc, gram (a,a,a,a,a) occ=296
    rows = [(0, mega_text)] + [
        (i, f"u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(1, 400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    est = probe_max_occ(df, "doc_id", "text", 5, False, hot_occ, 0.02)
    assert est >= 296, f"mega-doc gram invisible to probe: est={est}"


def test_probe_fraction_zero_raises(spark):
    import pytest

    from cdc_demo_spark.operators.spans import probe_max_occ

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="probe_fraction"):
        probe_max_occ(df, "doc_id", "text", 5, False, 100, 0.0)


def test_probe_mega_threshold_covers_empty_token_docs(spark):
    """r13 ADVICE (low): ngram_positions splits on literal space and
    keeps empty tokens, so a doc of ~hot_occ consecutive SPACES holds
    ~hot_occ empty-gram sites while being only ~hot_occ chars long —
    under the old 2*hot_occ mega threshold it dodged the exact branch
    AND (w.h.p.) the 2% sample.  The threshold is now hot_occ chars
    (L < hot_occ  =>  at most L+2-n < hot_occ sites), so any doc that
    CAN single-handedly reach hot_occ sites is tokenized exactly."""
    from cdc_demo_spark.operators.spans import probe_max_occ

    hot_occ, n = 20, 5
    space_doc = " " * 30  # 31 empty tokens -> 27 sites of the same gram
    rows = [(0, space_doc)] + [
        (i, f"u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(1, 400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    est = probe_max_occ(df, "doc_id", "text", n, False, hot_occ, 0.02)
    assert est >= 27, f"space mega-doc invisible to probe: est={est}"
