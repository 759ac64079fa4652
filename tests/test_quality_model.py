"""Quality-classifier trainer: numpy replay equality, training
dynamics (monotone loss, below base-rate entropy — the proof the model
learned signal rather than the majority class), scoring separation,
and plan hygiene.  The third layer — the unrolled-SQL DuckDB oracle —
lives on q_train_quality_classifier (queries/quality.py)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from cdc_demo_spark.operators.quality_model import (
    hashed_presence_features,
    score_documents,
    train_logreg,
)
from cdc_demo_spark.sources.tables import load_table


LR, ITERS, L2 = 0.5, 12, 0.001


def _fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_presence_features(docs)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.array_contains(F.split("text", " "), "spark").cast("double").alias("y"),
    )
    return docs, feats, labels


def _numpy_replay(feats_rows, label_rows):
    ids = sorted({r["id"] for r in label_rows})
    idx = {d: i for i, d in enumerate(ids)}
    buckets = sorted({r["bucket"] for r in feats_rows})
    bidx = {b: j for j, b in enumerate(buckets)}
    M = np.zeros((len(ids), len(buckets)))
    for r in feats_rows:
        M[idx[r["id"]], bidx[r["bucket"]]] = 1.0
    y = np.zeros(len(ids))
    for r in label_rows:
        y[idx[r["id"]]] = r["y"]
    w, b = np.zeros(len(buckets)), 0.0
    losses = []
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(M @ w + b)))
        losses.append(
            float(
                -np.mean(
                    y * np.log(np.clip(p, 1e-12, None))
                    + (1 - y) * np.log(np.clip(1 - p, 1e-12, None))
                )
            )
        )
        g = M.T @ (p - y) / len(ids) + L2 * w
        gb = float(np.mean(p - y))
        w, b = w - LR * g, b - LR * gb
    return {buckets[j]: w[j] for j in range(len(buckets))}, b, losses


def test_matches_numpy_replay(spark, sf_dir):
    _, feats, labels = _fixture(spark, sf_dir)
    model = train_logreg(feats, labels, lr=LR, iterations=ITERS, l2=L2)
    want_w, want_b, want_losses = _numpy_replay(feats.collect(), labels.collect())
    got_w = {r["bucket"]: r["weight"] for r in model.weights.collect()}
    assert set(got_w) == set(want_w)
    for bkt, wv in want_w.items():
        assert math.isclose(got_w[bkt], wv, rel_tol=0, abs_tol=1e-9), bkt
    assert math.isclose(model.bias, want_b, abs_tol=1e-9)
    got_losses = [h["loss"] for h in model.history]
    assert all(
        math.isclose(a, b, abs_tol=1e-9) for a, b in zip(got_losses, want_losses)
    )


def test_training_dynamics(spark, sf_dir):
    _, feats, labels = _fixture(spark, sf_dir)
    model = train_logreg(feats, labels, lr=LR, iterations=ITERS, l2=L2)
    losses = [h["loss"] for h in model.history]
    assert len(losses) == ITERS
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), losses
    base = labels.agg(F.avg("y")).collect()[0][0]
    base_entropy = -(base * math.log(base) + (1 - base) * math.log(1 - base))
    assert losses[-1] < base_entropy, (
        f"final loss {losses[-1]:.4f} did not beat the base-rate entropy "
        f"{base_entropy:.4f} — the model learned nothing"
    )


def test_scoring_separates_classes(spark, sf_dir):
    docs, feats, labels = _fixture(spark, sf_dir)
    model = train_logreg(feats, labels, lr=LR, iterations=ITERS, l2=L2)
    scored = score_documents(docs, model).join(labels, "id")
    means = {
        r["y"]: r["m"]
        for r in scored.groupBy("y").agg(F.avg("p").alias("m")).collect()
    }
    assert means[1.0] > means[0.0] + 0.1, means


def test_scoring_plan_is_python_free(spark, sf_dir):
    docs, feats, labels = _fixture(spark, sf_dir)
    model = train_logreg(feats, labels, lr=LR, iterations=2, l2=L2)
    plan = (
        score_documents(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
