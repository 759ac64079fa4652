"""Python UDTF surface (B.9): the lateral generator path must agree
row-for-row with the JVM array-algebra fast path, at several window
geometries including degenerate ones."""

from __future__ import annotations

import pytest

from cdc_demo_spark.operators.udtfs import window_spans_df, window_spans_udtf
from cdc_demo_spark.sources.tables import load_table


@pytest.mark.parametrize("size,stride", [(64, 32), (16, 16), (8, 3), (1, 1)])
def test_udtf_equals_array_path(spark, sf_dir, size, stride):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = {tuple(r) for r in window_spans_udtf(spark, docs, size, stride).collect()}
    b = {tuple(r) for r in window_spans_df(docs, size, stride).collect()}
    assert a == b
    assert a  # non-empty


def test_udtf_handles_null_and_single_token(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, None), (3, "a b")], "doc_id long, text string"
    )
    rows = window_spans_udtf(spark, df, 4, 2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc  # null text emits nothing
    assert [r["chunk"] for r in by_doc[1]] == ["solo"]
    assert [r["chunk"] for r in by_doc[3]] == ["a b"]
