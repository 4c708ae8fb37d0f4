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

Determinism note: the L-BFGS tier converges to the same optimum but its
float reduction order follows the partitioning, so trailing ulps of the
scores can differ across cluster layouts — tests pin its BEHAVIOR
(separable-data accuracy, agreement with the teacher gate, schema/row
stability), not bytes.  The ENGINE-PORTABLE tier below
(``distill_quality_gate_portable``) is the registry entry since round
11: fixed-iteration, integer-quantized batch gradient descent whose
every decision a DuckDB twin replays bit-for-bit (the
semantic_portable.py recipe) — see its docstring for the arithmetic
contract.

No counterpart in the reference (`tracker.go` filters by address/topic
equality only); this is the LLM-data surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# Engine-portable tier: fixed-iteration integer-quantized logistic GD
# (round-10 verdict item 1 — the last rows-only entry with algorithmic
# content, promoted with the recipe that promoted k-means in round 10).
# ---------------------------------------------------------------------------


def _rha_div(num: int, den: int) -> int:
    """round(num/den), half away from zero, on EXACT python integers —
    the driver-side twin of the DuckDB integer form
    ``(2*abs(g) + d) // (2*d)`` with the sign restored (den > 0).  No
    float ever touches the weight update, so a >2^53 gradient sum
    cannot drift through a double cast."""
    q = (2 * abs(num) + den) // (2 * den)
    return q if num >= 0 else -q


def _pe6_col(w_u: list[int], b_u: int) -> "F.Column":
    """Quantized sigmoid score of the integer feature vector ``vq``
    under integer weights: the ONE pinned float sequence both engines
    replay —

      ze9 = fold(vq[j] * w_u[j]) + b_u*1000        (exact BIGINT)
      z   = CAST(ze9 AS DOUBLE) / 1e9              (correctly rounded)
      p   = 1.0 / (1.0 + exp(-z))                  (exp ≤1 ulp apart)
      pe6 = round(p * 1e6)                          (half-away, exact)

    The 1e6 quantization absorbs the cross-engine exp ulp the way the
    round(ln·1e9) convention does for the unigram/bigram LMs (their
    green streak since round 5 is the empirical basis); every other op
    above is a single correctly-rounded IEEE step on identical inputs.
    Weights enter as LITERALS (the k×1 analogue of the centroid
    literals in the k-means twin), so the whole score is Catalyst-only
    — no Python in the per-row path."""
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w_u])
    ze9 = F.aggregate(
        F.zip_with(F.col("vq"), warr, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ) + F.lit(int(b_u) * 1000)
    z = ze9.cast("double") / F.lit(1000000000.0)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return F.round(p * F.lit(1000000.0)).cast("long")


def _pe6_udf(w_u: list[int], b_u: int) -> "F.Column":
    """Arrow-batched twin of :func:`_pe6_col` — the numpy scoring kernel
    the training gradient (:func:`_grad_partials`) fuses into its single
    Python pass: the int64 matmul is exact (order-free — integers), and
    the float tail replays the same pinned sequence (int→double /1e9,
    np.exp, 1/(1+·), ·1e6, half-away round via _round_half_away, never
    numpy's half-even).  Bit-equality to the Catalyst scorer is pinned
    in tests (same trained model, zero pe6 mismatches) — the PQ-encode
    lesson that a vectorized integer UDF is both the fast AND the
    portable shape, vs re-analyzing an 83-literal HOF per action.  The
    REGISTERED query's returned plan still uses the Catalyst scorer —
    no Python in any registry plan."""
    from pyspark.sql.functions import pandas_udf

    from .semantic_portable import _round_half_away

    w_np = np.array(w_u, dtype=np.int64)
    bz = int(b_u) * 1000

    @pandas_udf("long")
    def score(vqs: pd.Series) -> pd.Series:
        m = np.stack(vqs.to_numpy()).astype(np.int64)
        ze9 = m @ w_np + bz  # exact int64: |ze9| <= dim*5e6*1e9 < 2^63
        z = ze9.astype(np.float64) / 1e9
        p = 1.0 / (1.0 + np.exp(-z))
        return pd.Series(_round_half_away(p * 1e6).astype(np.int64))

    return score(F.col("vq"))


def _grad_partials(tv: DataFrame, w_u: list[int], b_u: int) -> DataFrame:
    """Fused training-gradient partials for ONE GD iteration: per chunk,
    score pe6 with the exact numpy sequence :func:`_pe6_udf` pins (int64
    matmul — exact, order-free — then the int→double /1e9, np.exp, 1e6
    half-away-round tail), take the residual r = pe6 − ye6, and emit the
    chunk's integer gradient partials as (pos, g) rows: pos 0 = Σr (the
    bias, x ≡ 1), pos 1..dim = Σ r·x_j.  The caller sums partials as
    DECIMAL(38,0) — exact and order-independent, so any
    partitioning/chunking yields the same gradient (pinned in tests
    against the posexplode form).

    Chunking = int64-overflow enforcement (round-11 advice #1): a chunk
    arrives as one Arrow batch (≤ spark.sql.execution.arrow.
    maxRecordsPerBatch rows, default 10k — the effective chunk in the
    measured numbers) and is further split so that
    rows · 1e6 · max|x| < 2^63 holds for the MEASURED max|x| of the
    batch, not an assumed feature bound — pathological long docs
    (hashed-TFIDF cells grow with tokens/doc) shrink the chunk instead
    of silently wrapping numpy int64.  |r| ≤ 1e6 always; the per-element
    product 1e6·max|x| itself cannot overflow below ~7.7e8 tokens/doc."""
    from .semantic_portable import _round_half_away

    w_np = np.array(w_u, dtype=np.int64)
    bz = int(b_u) * 1000
    dim = len(w_u)
    pos = np.arange(dim + 1, dtype=np.int32)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vq = np.stack(pdf["vq"].to_numpy()).astype(np.int64)
            ye6 = pdf["ye6"].to_numpy().astype(np.int64)
            xmax = int(np.abs(vq).max()) or 1
            step = max(1, min(100_000, (2**63 - 1) // (1_000_000 * xmax)))
            for s in range(0, len(ye6), step):
                m = vq[s : s + step]
                ze9 = m @ w_np + bz
                z = ze9.astype(np.float64) / 1e9
                p = 1.0 / (1.0 + np.exp(-z))
                pe6 = _round_half_away(p * 1e6).astype(np.int64)
                r = pe6 - ye6[s : s + step]
                yield pd.DataFrame(
                    {"pos": pos, "g": np.concatenate(([r.sum()], r @ m))}
                )

    return tv.mapInPandas(gen, "pos int, g long")


def train_quality_gd_portable(
    feats: DataFrame,
    labels_e6: DataFrame,
    dim: int = 64,
    n_iters: int = 8,
    lr_exp: int = 3,
    clamp: int = 10**9,
    id_col: str = "doc_id",
) -> tuple[list[int], int, int]:
    """Batch logistic-regression GD over integer hashed-TFIDF cells
    (semantic_portable.hashed_tfidf_units), every cross-row reduction an
    exact integer sum and every weight update exact integer arithmetic —
    so ANY partitioning/executor layout produces the same model, and a
    DuckDB twin replays training end-to-end (the portable-k-means
    promotion recipe, semantic_portable.py module docstring).

    Per iteration (``n_iters`` fixed, no data-dependent stopping):
      * pe6 per row via the :func:`_pe6_col` float sequence (the numpy
        twin inside :func:`_grad_partials`);
      * residual r = pe6 - ye6 (exact integers, |r| ≤ 1e6);
      * gradients G_j = Σ r·x_j and G_b = Σ r as DECIMAL(38,0) — exact
        and ORDER-INDEPENDENT, the property that makes the distributed
        treeAggregate-style reduction replayable where L-BFGS's float
        partials are not (the round-9/10 rows-only blocker);
      * update Δwu_j = rha(G_j / (10^(lr_exp+3)·n)) in 1e-6 weight
        units — i.e. natural w -= lr·(1/n)·Σ(σ(z)-y)x with lr =
        10^-lr_exp — clamped to ±``clamp`` (the int64-overflow bound:
        |vq| ≤ ~5e6, |wu| ≤ 1e9, dim ≤ 64 ⇒ |ze9| ≤ 3.2e17 < 2^63).

    Driver state: the (dim+1)-int weight vector and one 65-row gradient
    collect per iteration — bounded by contract, like the k-means
    centroid collects.  Returns (weights, bias, n_train)."""
    t = (
        feats.join(labels_e6, id_col)
        .select(id_col, "vq", "ye6")
        .localCheckpoint(eager=False)
    )
    n = t.count()
    if n == 0:
        raise ValueError("train_quality_gd_portable: empty training set")
    d_w = (10 ** (lr_exp + 3)) * n
    d_b = (10**lr_exp) * n
    w = [0] * dim
    b = 0
    # only the two columns the gradient kernel reads cross the Arrow
    # boundary (guide §4.1: opaque functions defeat column pruning)
    tv = t.select("vq", "ye6")
    for _ in range(n_iters):
        # ONE action per iteration: a fused mapInPandas pass computes pe6
        # (the same pinned numpy kernel as _pe6_udf) AND the per-chunk
        # integer gradient partials g_0 = Σr, g_j = Σ r·x_j in one Python
        # crossing, emitting 1+dim partial rows per chunk (= one Arrow
        # batch, default 10k rows, further split only if the measured
        # max|x| demands it — see _grad_partials); the 1+dim-key groupBy
        # then sums the partials as DECIMAL(38,0).
        # Integer addition is order-independent, so the result is the
        # exact gradient regardless of partitioning/chunking — the same
        # property the original posexplode+groupBy(pos) form leaned on.
        # Round-11 interleaved A/Bs (idle host, sf0.1, 3 rounds each,
        # models asserted identical): this fused form 0.29-0.31 s/iter vs
        # posexplode 0.40-0.50 s/iter (training total 3.35 → 2.45 s) — it
        # shuffles 1+dim rows per CHUNK instead of 1+dim rows per DOC;
        # a "zero shuffle" wide grand aggregate (dim+1 decimal sums in
        # one agg) measured 3× SLOWER than either (0.77 → 2.52 s/iter)
        # because the 83-expression aggregate re-pays plan/codegen cost
        # every iteration (weights are fresh literals each round).
        # Round-12 COLD adjudication (the round-11 verdict's protocol:
        # fresh JVM per form, best-of-3, SPARK_GRAFT_CPUS at 32 AND 8,
        # same box, idle): fused 5.72/5.33 s vs posexplode 8.69/6.30 s
        # (noop sink 6.5 vs 14.4 / 4.9 vs 7.1) — fused wins cold at both
        # core counts; the r11 driver's 2.52→5.82 read spanned two hosts
        # and a ~1.5×-inflated run, not two plans.
        grads = (
            _grad_partials(tv, w, b)
            .groupBy("pos")
            .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("g"))
            .collect()
        )
        gmap = {int(row.pos): int(row.g) for row in grads}
        b = max(-clamp, min(clamp, b - _rha_div(gmap.get(0, 0), d_b)))
        w = [
            max(-clamp, min(clamp, w[j] - _rha_div(gmap.get(j + 1, 0), d_w)))
            for j in range(dim)
        ]
    return w, b, n


def distill_quality_gate_portable(
    df: DataFrame,
    dim: int = 64,
    n_iters: int = 8,
    lr_exp: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Portable rules→model bootstrap: label with the rule gate (keep =
    1e6 in e6 units), train the portable GD classifier over
    :func:`quality_feature_units` (hashed-TFIDF cells + length-bucket
    indicators), score every doc that has feature cells (≥1 non-empty
    token — the hashed_tfidf_units contract, same as the topic-balance
    entry).  Output: (id_col, teacher_verdict, p_good) with p_good =
    pe6/1e6 — an exact double both engines produce bit-identically."""
    from .text import quality_verdicts

    verdicts = quality_verdicts(df, text_col=text_col)
    labels = verdicts.select(
        id_col,
        F.when(F.col("verdict") == "keep", F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ye6"),
    )
    feats = quality_feature_units(
        df, dim=dim, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    w, b, _ = train_quality_gd_portable(
        feats,
        labels,
        dim=dim + N_QUALITY_BUCKETS,
        n_iters=n_iters,
        lr_exp=lr_exp,
        id_col=id_col,
    )
    scored = feats.withColumn("pe6", _pe6_col(w, b))
    return scored.join(
        verdicts.withColumnRenamed("verdict", "teacher_verdict"), id_col
    ).select(
        id_col,
        "teacher_verdict",
        (F.col("pe6").cast("double") / F.lit(1000000.0)).alias("p_good"),
    )


# length buckets: log-ish word-count bands (densified toward the short
# tail, where real crawl corpora concentrate) + avg-word-len bands — the
# standard length/shape features of fasttext-style quality classifiers,
# deliberately NOT aligned to the rule gate's 20/400/2.0 thresholds (the
# student must LEARN the tails, not read them off an indicator)
_NW_BUCKETS = [
    (0, 8), (8, 12), (12, 16), (16, 24), (24, 32), (32, 48), (48, 64),
    (64, 96), (96, 128), (128, 192), (192, 256), (256, 384), (384, 512),
    (512, None),
]
_AWL_BUCKETS = [(None, 2.0), (2.0, 3.0), (3.0, 4.0), (4.0, None)]
N_QUALITY_BUCKETS = len(_NW_BUCKETS) + len(_AWL_BUCKETS)
# indicator magnitude in the shared e3 unit (natural 100): comparable to
# the tf-idf cells' scale so one global learning rate moves bucket
# weights at a useful pace — at natural 1.0 a pure-drop bucket's weight
# crawls (gradient ∝ x, logit movement ∝ x²) and the bias term's
# majority-class drift swamps it (measured: drop-recall 0/43 at 1.0,
# 23/43 at 100)
_BUCKET_UNIT = 100_000


def quality_feature_units(
    df: DataFrame, dim: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, vq array<long> of dim + N_QUALITY_BUCKETS cells): the
    portable classifier's feature vector — integer hashed-TFIDF cells
    (semantic_portable.hashed_tfidf_units) concatenated with one-hot
    length-bucket indicators at _BUCKET_UNIT (= 100.0 in the shared e3 unit).

    Why buckets: the gate's drop classes live in BOTH length tails, and
    "norm is small/large" is not linearly separable in signed tf-idf
    cells alone — the L-BFGS tier's 6/43 drop-recall at sf0.01 is that
    ceiling.  Bucketed length/shape indicators are how linear quality
    classifiers express tail rules; every indicator is an integer
    comparison on len(words) or ONE correctly-rounded int/int division
    (avg_word_len), so the whole vector stays engine-portable.  Doc
    contract unchanged: rows = docs with ≥1 non-empty token."""
    from .semantic_portable import hashed_tfidf_units
    from .text import words

    base = hashed_tfidf_units(df, dim=dim, text_col=text_col, id_col=id_col)
    ws = F.col("_ws")
    n_words = F.size(ws)
    awl = F.length(F.array_join(ws, "")) / n_words
    cells = []
    for lo, hi in _NW_BUCKETS:
        cond = n_words >= F.lit(lo)
        if hi is not None:
            cond = cond & (n_words < F.lit(hi))
        cells.append(F.when(cond, F.lit(_BUCKET_UNIT)).otherwise(F.lit(0)).cast("long"))
    for lo, hi in _AWL_BUCKETS:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (awl >= F.lit(lo))
        if hi is not None:
            cond = cond & (awl < F.lit(hi))
        cells.append(F.when(cond, F.lit(_BUCKET_UNIT)).otherwise(F.lit(0)).cast("long"))
    stats = df.withColumn("_ws", words(F.col(text_col))).select(
        F.col(id_col), F.array(*cells).alias("qb")
    )
    return base.join(stats, id_col).select(
        id_col, F.concat(F.col("vq"), F.col("qb")).alias("vq")
    )
