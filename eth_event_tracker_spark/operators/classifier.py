"""Model-based quality scoring: a logistic-regression quality
classifier over hashed TF-IDF features — the learned tier above the
rule-based gate (operators/text.quality_verdicts), the way production
LLM-data pipelines actually filter at scale (a cheap linear model
distills expensive heuristics/human labels, then scores the whole
corpus in one vectorized pass).

Spark-first by construction: features are the existing JVM-side
``hashed_tfidf_vectors`` (no vocabulary state, fixed dim), training is
``pyspark.ml`` LogisticRegression (distributed L-BFGS — treeAggregate
partials, the driver holds only the (dim+1)-float coefficient vector),
and scoring is one ``transform`` — a broadcast of the coefficients into
a per-row dot product, no shuffle.

Bootstrap labeling: ``distill_quality_gate`` trains on the RULE gate's
own keep/drop verdicts — rules label the training set, the model
generalizes them to a smooth score (the classic weak-supervision
bootstrap).  Swap in human labels by calling
``train_quality_classifier`` directly with any (id, label) frame.

Determinism note (why the registry entry is rows-only): L-BFGS
converges to the same optimum but its float reduction order follows the
partitioning, so trailing ulps of the scores can differ across cluster
layouts.  Tests therefore pin BEHAVIOR — separable-data accuracy,
agreement with the teacher gate, schema/row stability — not bytes.

No counterpart in the reference (`tracker.go` filters by address/topic
equality only); this is the LLM-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import hashed_tfidf_vectors


def train_quality_classifier(
    df: DataFrame,
    labels: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 40,
    reg_param: float = 1e-3,
    feats: DataFrame | None = None,
    tol: float = 1e-6,
):
    """Fit LR on hashed TF-IDF features against ``labels`` (id_col,
    label ∈ {0.0, 1.0}).  Returns the fitted
    ``LogisticRegressionModel`` — driver-side state is only the
    coefficient vector, so the model broadcasts for free at scoring
    time."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    if feats is None:
        feats = hashed_tfidf_vectors(df, dim=dim, text_col=text_col, id_col=id_col)
    train = feats.join(labels, id_col).select(
        array_to_vector(F.col("vector")).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False, tol=tol
    )
    return lr.fit(train)


def score_quality(
    df: DataFrame,
    model,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id_col, p_good): the model's keep probability per doc — one
    feature pass + one broadcast dot product; rank by it, threshold it,
    or feed it to select_keepers/weighted_sample as the quality
    signal."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if feats is None:
        feats = hashed_tfidf_vectors(df, dim=dim, text_col=text_col, id_col=id_col)
    scored = model.transform(
        feats.select(id_col, array_to_vector(F.col("vector")).alias("features"))
    )
    return scored.select(
        id_col,
        F.element_at(vector_to_array("probability"), 2).alias("p_good"),
    )


def distill_quality_gate(
    df: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 40,
    tol: float = 1e-6,
) -> DataFrame:
    """Rules → model bootstrap: label with the rule gate (keep = 1),
    train, score EVERYTHING — including docs the rules could not judge
    smoothly.  Output: (id_col, teacher_verdict, p_good)."""
    from .text import quality_verdicts

    verdicts = quality_verdicts(df, text_col=text_col)
    labels = verdicts.select(
        id_col, (F.col("verdict") == "keep").cast("double").alias("label")
    )
    # ONE feature pass shared by training and scoring (the TF-IDF
    # pipeline is the expensive half; L-BFGS converges in ~10 rounds)
    feats = hashed_tfidf_vectors(
        df, dim=dim, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    model = train_quality_classifier(
        df, labels, dim=dim, text_col=text_col, id_col=id_col,
        max_iter=max_iter, feats=feats, tol=tol,
    )
    scores = score_quality(
        df, model, dim=dim, text_col=text_col, id_col=id_col, feats=feats
    )
    return scores.join(
        verdicts.withColumnRenamed("verdict", "teacher_verdict"), id_col
    ).select(id_col, "teacher_verdict", "p_good")
