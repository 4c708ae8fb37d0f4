"""Portable (oracle-graded) quality-classifier pins — round 11.

The DuckDB hash equality itself is driver_sim/sf01_gate territory; these
pins cover the BEHAVIOR the hash cannot see (the model must actually
learn the gate, not echo the majority class) and the portability
invariants the hash relies on (scorer bit-equality, layout-independent
training, exact integer updates).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from eth_event_tracker_spark.operators.classifier import (
    N_QUALITY_BUCKETS,
    _pe6_col,
    _pe6_udf,
    _rha_div,
    distill_quality_gate_portable,
    quality_feature_units,
    train_quality_gd_portable,
)
from eth_event_tracker_spark.operators.text import quality_verdicts
from eth_event_tracker_spark.tables import load_table


def _labels(docs):
    return quality_verdicts(docs).select(
        "doc_id",
        F.when(F.col("verdict") == "keep", F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ye6"),
    )


def test_portable_distill_beats_majority_class(spark, sf_dir):
    """The promoted entry must LEARN: agreement strictly above the
    majority-class baseline (predict-keep-everything), with real recall
    on the drop class — the L-BFGS tier's blind spot (6/43 at sf0.01)."""
    docs = load_table(spark, sf_dir, "documents")
    rows = distill_quality_gate_portable(docs, dim=64, n_iters=8, lr_exp=2).collect()
    n = len(rows)
    keep_rate = sum(1 for r in rows if r.teacher_verdict == "keep") / n
    agree = sum(
        1 for r in rows if (r.p_good >= 0.5) == (r.teacher_verdict == "keep")
    ) / n
    assert agree > max(keep_rate, 1 - keep_rate) + 0.02, (agree, keep_rate)
    drops = [r for r in rows if r.teacher_verdict != "keep"]
    if drops:
        drop_recall = sum(1 for r in drops if r.p_good < 0.5) / len(drops)
        assert drop_recall >= 0.4, drop_recall
    assert all(0.0 <= r.p_good <= 1.0 for r in rows)


def test_scorers_bit_identical_on_trained_model(spark, sf_dir):
    """The Arrow training scorer and the Catalyst output scorer must
    produce the SAME pe6 for every doc under the trained weights — the
    equality the registry plan (Catalyst) and the training loop (Arrow)
    both lean on."""
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_units(docs, dim=64).localCheckpoint(eager=False)
    w, b, _ = train_quality_gd_portable(
        feats, _labels(docs), dim=64 + N_QUALITY_BUCKETS, n_iters=8, lr_exp=2
    )
    both = feats.withColumn("a", _pe6_udf(w, b)).withColumn("c", _pe6_col(w, b))
    assert both.where(F.col("a") != F.col("c")).count() == 0


def test_training_is_layout_independent(spark, sf_dir):
    """Same model from a 13-partition re-shuffle of the same features —
    the exact-integer-gradient property that L-BFGS lacks and the whole
    promotion rests on."""
    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = quality_feature_units(docs, dim=64).localCheckpoint(eager=False)
    dim = 64 + N_QUALITY_BUCKETS
    w1, b1, n1 = train_quality_gd_portable(feats, labels, dim=dim, n_iters=3, lr_exp=2)
    w2, b2, n2 = train_quality_gd_portable(
        feats.repartition(13), labels, dim=dim, n_iters=3, lr_exp=2
    )
    assert (w1, b1, n1) == (w2, b2, n2)


def test_fused_gradient_equals_posexplode_gradient(spark, sf_dir):
    """Round-11 optimization pin: the fused mapInPandas gradient
    (_grad_partials — pe6 + integer partials in one Python pass) must
    produce EXACTLY the gradient of the original posexplode+groupBy(pos)
    form, for zero weights and for a non-trivial weight vector, under a
    skewed repartition — the order-independence the exact-integer-sum
    promotion rests on."""
    from eth_event_tracker_spark.operators.classifier import _grad_partials, _pe6_udf

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_units(docs, dim=64).localCheckpoint(eager=False)
    dim = 64 + N_QUALITY_BUCKETS
    t = feats.join(_labels(docs), "doc_id").select("vq", "ye6")
    for w, b in [
        ([0] * dim, 0),
        ([((j * 7919) % 2001) - 1000 for j in range(dim)], 12345),
    ]:
        old = {
            int(r.pos): int(r.g)
            for r in (
                t.withColumn("pe6", _pe6_udf(w, b))
                .withColumn("r", F.col("pe6") - F.col("ye6"))
                .select(
                    "r",
                    F.posexplode(
                        F.concat(F.array(F.lit(1).cast("long")), F.col("vq"))
                    ).alias("pos", "x"),
                )
                .groupBy("pos")
                .agg(F.sum((F.col("r") * F.col("x")).cast("decimal(38,0)")).alias("g"))
                .collect()
            )
        }
        new = {
            int(r.pos): int(r.g)
            for r in (
                _grad_partials(t.repartition(7), w, b)
                .groupBy("pos")
                .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("g"))
                .collect()
            )
        }
        assert old == new and len(new) == dim + 1


def test_rha_div_matches_duckdb_integer_form():
    """_rha_div == the twin's (2|g|+d)//(2d) CASE — including above 2^53
    where a double round() would drift."""
    con = duckdb.connect()
    cases = [
        (7, 2), (-7, 2), (5, 10), (-5, 10), (15, 10), (-15, 10), (0, 3),
        (2**60 + 12345, 10**7), (-(2**60) - 12345, 10**7),
        (123456789012345678, 999), (-123456789012345678, 999),
    ]
    for g, d in cases:
        sql = (
            f"SELECT CASE WHEN {g} >= 0 THEN (2 * ({g}) + {d}) // (2 * {d}) "
            f"ELSE -((2 * (-({g})) + {d}) // (2 * {d})) END"
        )
        assert _rha_div(g, d) == int(con.execute(sql).fetchone()[0]), (g, d)
    # half-away semantics, not banker's
    assert _rha_div(5, 10) == 1 and _rha_div(-5, 10) == -1
    assert _rha_div(25, 10) == 3 and _rha_div(-25, 10) == -3


def test_feature_vector_shape_and_buckets(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, " ".join(["word"] * 700)),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.vq for r in quality_feature_units(docs, dim=8).collect()}
    # doc 3 has no tokens -> no feature row (the hashed_tfidf_units contract)
    assert set(out) == {1, 2}
    assert all(len(v) == 8 + N_QUALITY_BUCKETS for v in out.values())
    # exactly one word-count bucket + one awl bucket fire per doc
    for v in out.values():
        buckets = v[8:]
        assert sum(1 for x in buckets if x != 0) == 2
        assert all(x in (0, 100000) for x in buckets)


def test_empty_training_set_fails_loud(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    feats = quality_feature_units(docs, dim=8)
    with pytest.raises(ValueError, match="empty training set"):
        train_quality_gd_portable(
            feats, _labels(docs), dim=8 + N_QUALITY_BUCKETS, n_iters=1
        )


def test_gradient_chunking_shrinks_for_huge_cells(spark):
    """Round-12 advice fix: the fused gradient enforces the int64 bound
    from the MEASURED max|x| of each Arrow batch — cells near the bound
    force per-row chunks, and the summed gradient still equals an exact
    Python-int reference (no silent numpy wrap)."""
    import math

    from eth_event_tracker_spark.operators.classifier import _grad_partials

    # 6 rows whose cells are ~5e12: rows·1e6·max|x| would overflow int64
    # for any chunk of ≥ 2 rows, so the kernel must fall back to step=1
    big = 5_000_000_000_000
    rows = [
        ([big, -big // 2, 3], 0),
        ([big - 7, big, 0], 1_000_000),
        ([-big, big // 3, 1], 0),
        ([big // 2, -big, 2], 1_000_000),
        ([big, big, big], 0),
        ([-big, -big, -big], 1_000_000),
    ]
    df = spark.createDataFrame(
        [(list(map(int, v)), int(y)) for v, y in rows], "vq array<long>, ye6 long"
    )
    w, b = [2, -3, 5], 7
    got = {
        int(r.pos): int(r.g)
        for r in (
            _grad_partials(df, w, b)
            .groupBy("pos")
            .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("g"))
            .collect()
        )
    }
    # exact reference in unbounded Python ints, same pinned float tail
    ref = {p: 0 for p in range(4)}
    for v, y in rows:
        ze9 = sum(x * wj for x, wj in zip(v, w)) + b * 1000
        z = float(ze9) / 1e9
        # saturating exp, matching numpy (np.exp(±710) → inf/0, not raise)
        p_ = 0.0 if -z > 709.0 else 1.0 / (1.0 + math.exp(-z))
        pe6 = math.floor(p_ * 1e6 + 0.5) if p_ >= 0 else -math.floor(-p_ * 1e6 + 0.5)
        r = pe6 - y
        ref[0] += r
        for j, x in enumerate(v):
            ref[j + 1] += r * x
    assert got == ref
    # and the plain small-cell path still takes one chunk per batch
    assert (2**63 - 1) // (1_000_000 * big) == 1  # the bound really binds
