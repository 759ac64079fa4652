"""In-engine training of a linear quality classifier.

q_linear_quality_score (queries/textops.py) is the SCORING half of the
fastText-shaped quality filter every web-scale corpus runs (CCNet's
wiki-reference filter, the LLaMA reproduction's quality model): hash
tokens into a bucketed feature space, broadcast a weight table, one
map-side pass.  This module is the TRAINING half: full-batch logistic
regression by gradient descent, expressed entirely in DataFrame
algebra — the weight table it emits is exactly what the scoring pass
broadcasts.

Shape per iteration (the PageRank/BPE iterative idiom — driver FOR
loop, lineage cut per round, one tiny driver collect per iteration):
  1. score: features ⋈ broadcast(weights) → per-doc logit z = Σ w + b,
     p = sigmoid(z) — one shuffle at document grain;
  2. residual agg: loss (log-loss mean) and the bias gradient in one
     row collected to the driver;
  3. weight gradient: features ⋈ residuals → per-bucket mean residual
     — one shuffle at bucket grain (the feature-key space, ≤ n_buckets
     rows, never the corpus);
  4. update: full-outer join of the ≤ n_buckets-row weight table with
     the gradient (w ← w − lr·(g + l2·w)).

Features are hashed-token PRESENCE indicators (md5(token) % n_buckets,
the same bucketing q_linear_quality_score scores with), built in ONE
corpus scan and checkpointed; iterations touch only the feature table.
At 100 TB you train on a sampled slice (the standard practice — a
quality classifier fits on ~10^6 labeled docs) and SCORE the full
corpus with the emitted weights; both halves are map-side at scoring
time.

Verified: an unrolled-SQL DuckDB oracle replays all 12 iterations
value-exactly (q_train_quality_classifier); a numpy replay matches to
fp tolerance and the loss trajectory is asserted monotone with final
loss below the base-rate entropy — the proof the model learned signal,
not the majority class (tests/test_quality_model.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_presence_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, bucket) — distinct hashed-token presence per document; the
    one corpus scan.  Bucketing matches q_linear_quality_score:
    md5(token) first 8 hex digits mod n_buckets."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    bucket = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % n_buckets
    return tok.select("id", bucket.alias("bucket")).distinct()


@dataclass
class TrainedModel:
    weights: DataFrame  # (bucket bigint, weight double)
    bias: float
    history: list[dict] = field(default_factory=list)  # iter, loss, grad_b


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    lr: float = 0.5,
    iterations: int = 12,
    l2: float = 0.001,
) -> TrainedModel:
    """Full-batch logistic regression over presence features.

    ``features``: (id, bucket); ``labels``: (id, y) with y in {0, 1}.
    Returns the weight table, the bias, and the per-iteration loss
    history (the training curve is part of the artifact — a quality
    filter whose loss never moved is a bug, not a model)."""
    spark = features.sparkSession
    feats = features.select("id", "bucket").localCheckpoint(eager=True)
    y = labels.select("id", F.col("y").cast("double").alias("y"))
    n_docs = y.count()
    weights = spark.createDataFrame([], "bucket bigint, weight double")
    bias = 0.0
    history: list[dict] = []
    for it in range(1, int(iterations) + 1):
        z = (
            feats.join(F.broadcast(weights), "bucket", "left")
            .groupBy("id")
            .agg(F.sum(F.coalesce("weight", F.lit(0.0))).alias("z0"))
        )
        scored = (
            y.join(z, "id", "left")
            .select(
                "id",
                "y",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.coalesce("z0", F.lit(0.0)) + F.lit(bias))))).alias("p"),
            )
            .localCheckpoint(eager=True)  # reused by loss agg AND gradient join
        )
        row = scored.agg(
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                    + (1 - F.col("y"))
                    * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                )
            ).alias("loss"),
            F.avg(F.col("p") - F.col("y")).alias("grad_b"),
        ).collect()[0]
        loss, grad_b = float(row["loss"]), float(row["grad_b"])
        history.append({"iter": it, "loss": loss, "grad_b": grad_b})
        grad = (
            feats.join(scored.select("id", (F.col("p") - F.col("y")).alias("r")), "id")
            .groupBy("bucket")
            .agg((F.sum("r") / F.lit(float(n_docs))).alias("g"))
        )
        weights = (
            weights.join(grad, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce("weight", F.lit(0.0))
                    - F.lit(lr)
                    * (F.coalesce("g", F.lit(0.0)) + F.lit(l2) * F.coalesce("weight", F.lit(0.0)))
                ).alias("weight"),
            )
            .localCheckpoint(eager=False)
        )
        bias -= lr * grad_b
    return TrainedModel(weights=weights, bias=bias, history=history)


def score_documents(
    docs: DataFrame,
    model: TrainedModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, p) — apply the trained model: the scoring half, map-side
    except one doc-grain aggregate; the weight table broadcasts."""
    feats = hashed_presence_features(docs, text_col, id_col, n_buckets)
    return (
        feats.join(F.broadcast(model.weights), "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.coalesce("weight", F.lit(0.0))).alias("z0"))
        .select(
            "id",
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("z0") + F.lit(model.bias))))
            ).alias("p"),
        )
    )
