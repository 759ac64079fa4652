"""The HOF-lambda CSE lint (tools/lint_hof_lambdas.py) — VERDICT r11
#6: the engine-wide O(tokens²) class found in r11 (tokenizer
expressions re-evaluated per array element inside transform/aggregate/
filter lambdas) must not regress silently.  No SparkSession needed:
pure static analysis."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from lint_hof_lambdas import lint_tree, violations  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_seeded_direct_violation_is_caught():
    src = (
        "from pyspark.sql import functions as F\n"
        "def grams(df):\n"
        "    return df.select(F.transform(\n"
        "        F.sequence(F.lit(1), F.size(F.split(F.col('t'), ' '))),\n"
        "        lambda j: F.slice(F.split(F.col('t'), ' '), j, 5),\n"
        "    ))\n"
    )
    probs = violations(src)
    assert len(probs) == 1 and "split() called inside transform()" in probs[0]


def test_seeded_laundered_violation_is_caught():
    # the exact shape of the r11 bug: split bound to a name OUTSIDE the
    # lambda, then sliced per element inside it
    src = (
        "from pyspark.sql import functions as F\n"
        "def grams(df, n):\n"
        "    toks = F.split(F.col('text'), ' ')\n"
        "    return df.select(F.transform(\n"
        "        F.sequence(F.lit(1), F.size(toks) - (n - 1)),\n"
        "        lambda j: F.concat_ws(' ', F.slice(toks, j, n)),\n"
        "    ))\n"
    )
    probs = violations(src)
    assert probs and "closure variable 'toks'" in probs[0]


def test_materialized_column_reference_is_clean():
    # the sanctioned fix: split materialized in its own projection,
    # lambda references the COLUMN
    src = (
        "from pyspark.sql import functions as F\n"
        "def grams(df, n):\n"
        "    base = df.select(F.split(F.col('text'), ' ').alias('__toks'))\n"
        "    toks = F.col('__toks')\n"
        "    return base.select(F.transform(\n"
        "        F.sequence(F.lit(1), F.size(toks) - (n - 1)),\n"
        "        lambda j: F.concat_ws(' ', F.slice(toks, j, n)),\n"
        "    ))\n"
    )
    assert violations(src) == []


def test_lambda_param_shadowing_is_clean():
    # a lambda parameter that shadows a tainted outer name is the
    # lambda's own element, not the tokenizer
    src = (
        "from pyspark.sql import functions as F\n"
        "def f(df):\n"
        "    toks = F.split(F.col('t'), ' ')\n"
        "    sizes = df.select(F.size(toks))\n"
        "    return df.select(F.transform(F.col('arr'), lambda toks: toks + 1))\n"
    )
    assert violations(src) == []


def test_python_list_filter_is_ignored():
    # builtin filter() over Python data is not a Catalyst HOF; keep the
    # lint from firing on driver-side list plumbing
    src = (
        "def f(xs):\n"
        "    ys = [x.split(',') for x in xs]\n"
        "    return list(filter(lambda y: len(y) > 1, ys))\n"
    )
    # the lambda references no tainted name and calls no tokenizer
    assert violations(src) == []


def test_engine_tree_is_clean():
    probs = lint_tree(os.path.join(REPO, "cdc_demo_spark"))
    assert probs == [], "\n".join(probs)
