"""Model-based quality scoring: LR over hashed TF-IDF. Pins are
behavioral (accuracy, teacher agreement, stability), never byte-exact —
L-BFGS reduction order follows partitioning (see module docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.classifier import (
    distill_quality_gate,
    score_quality,
    train_quality_classifier,
)


def _synth(spark):
    good_words = (
        "the quick brown fox jumps over a lazy dog while many other words "
        "appear in normal sentences about data systems and weather patterns"
    ).split()
    rows = []
    for i in range(120):
        text = " ".join(good_words[(i + j) % len(good_words)] for j in range(40))
        rows.append((i, text, 1.0))
    for i in range(120, 240):
        rows.append((i, " ".join(["spam"] * 40), 0.0))  # degenerate repetition
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_planted_quality(spark):
    df = _synth(spark)
    train = df.where("doc_id % 3 != 0")
    test = df.where("doc_id % 3 = 0")
    model = train_quality_classifier(
        train.select("doc_id", "text"), train.select("doc_id", "label"), dim=64
    )
    scored = score_quality(test.select("doc_id", "text"), model, dim=64).join(
        test.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    acc = sum(1 for r in rows if (r.p_good >= 0.5) == (r.label == 1.0)) / len(rows)
    assert acc >= 0.95, acc
    assert all(0.0 <= r.p_good <= 1.0 for r in rows)


def test_distill_agrees_with_teacher_gate(spark, sf_dir):
    from eth_event_tracker_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = distill_quality_gate(docs, dim=64).collect()
    assert len(out) == docs.count()
    both = [(r.p_good >= 0.5, r.teacher_verdict == "keep") for r in out]
    agree = sum(1 for a, b in both if a == b) / len(both)
    # the student should reproduce most of the teacher's decisions —
    # perfect agreement is NOT expected (that's the point of smoothing)
    assert agree >= 0.75, agree


def test_scores_stable_shape_under_repartition(spark):
    df = _synth(spark).select("doc_id", "text")
    labels = _synth(spark).select("doc_id", "label")
    model = train_quality_classifier(df, labels, dim=32, max_iter=10)
    a = score_quality(df, model, dim=32)
    b = score_quality(df.repartition(13), model, dim=32)
    assert a.count() == b.count() == 240
    # same model, same features → same decisions (floats may differ in
    # trailing ulps across layouts; the DECISION boundary must not)
    da = {r.doc_id: r.p_good >= 0.5 for r in a.collect()}
    db = {r.doc_id: r.p_good >= 0.5 for r in b.collect()}
    assert da == db
