"""Exact-substring span dedup (operators/dedup.py duplicate_spans): the
Lee et al. 2022 maximal-span formulation.  Pins: planted shared runs
produce exactly the expected [start, end] intervals at ANY alignment
(including offsets the fixed 16-word cells of dedup_spans would
straddle), two disjoint shared runs stay two spans, intra-doc-only
repeats do NOT mark (min_docs counts distinct documents), and the
result is repartition-deterministic."""

from __future__ import annotations

import pytest

from eth_event_tracker_spark.operators.dedup import duplicate_spans


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df, **kw):
    out = duplicate_spans(df, **kw).collect()
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_words"], r["n_grams"])
        for r in out
    )


W = [f"u{i}" for i in range(40)]  # unique filler words


class TestDuplicateSpans:
    def test_planted_shared_run_any_alignment(self, spark):
        # a 12-word run shared by docs 1 and 2, at word offset 5 in doc 1
        # and offset 3 in doc 2 — neither a multiple of the 16-word cell
        # size, so the chunked dedup_spans formulation cannot see it.
        shared = [f"s{i}" for i in range(12)]
        d1 = W[:5] + shared + W[20:28]
        d2 = W[30:33] + shared + W[33:38]
        d3 = [f"z{i}" for i in range(25)]  # no overlap with anything
        df = _mk(spark, [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))])
        got = _spans(df, n=8, min_docs=2)
        # 12-word run → 5 consecutive 8-grams → one maximal span of 12 words
        assert got == [
            (1, 5, 16, 12, 5),
            (2, 3, 14, 12, 5),
        ]

    def test_two_disjoint_runs_stay_two_spans(self, spark):
        a = [f"a{i}" for i in range(8)]
        b = [f"b{i}" for i in range(9)]
        d1 = a + W[:6] + b
        d2 = [f"x{i}" for i in range(4)] + a + [f"y{i}" for i in range(7)] + b
        df = _mk(spark, [(1, " ".join(d1)), (2, " ".join(d2))])
        got = _spans(df, n=8, min_docs=2)
        assert got == [
            (1, 0, 7, 8, 1),
            (1, 14, 22, 9, 2),
            (2, 4, 11, 8, 1),
            (2, 19, 27, 9, 2),
        ]

    def test_intra_doc_repeat_does_not_mark(self, spark):
        # the same 8-gram twice within ONE document, nowhere else:
        # countDistinct(doc_id) == 1 < min_docs → no span
        run = [f"r{i}" for i in range(8)]
        d1 = run + W[:5] + run
        df = _mk(spark, [(1, " ".join(d1)), (2, " ".join(W[10:35]))])
        assert _spans(df, n=8, min_docs=2) == []

    def test_short_docs_excluded(self, spark):
        df = _mk(spark, [(1, "a b c"), (2, "a b c"), (3, None)])
        assert _spans(df, n=8, min_docs=2) == []
        # but the same corpus IS caught at n=3
        assert _spans(df, n=3, min_docs=2) == [
            (1, 0, 2, 3, 1),
            (2, 0, 2, 3, 1),
        ]

    def test_repartition_deterministic(self, spark):
        shared = [f"s{i}" for i in range(10)]
        rows = [
            (i, " ".join(W[: 3 + i % 4] + shared + W[20 : 26 + i % 3]))
            for i in range(12)
        ]
        df = _mk(spark, rows)
        assert _spans(df.repartition(1), n=8) == _spans(df.repartition(7), n=8)


@pytest.mark.slow
def test_scale_smoke_10x_near_linear(spark):
    """10× corpus → duplicated-span totals scale with the plant and the
    runtime stays near-linear (no quadratic candidate step hiding in
    the gram join)."""
    import time

    shared = [f"s{i}" for i in range(12)]
    def corpus(n):
        rows = []
        for i in range(n):
            filler = [f"w{i}_{j}" for j in range(20)]
            body = filler[:7] + (shared if i % 5 == 0 else filler[7:13]) + filler[13:]
            rows.append((i, " ".join(body)))
        return spark.createDataFrame(rows, "doc_id long, text string")

    from eth_event_tracker_spark.operators.dedup import duplicate_spans

    t0 = time.time()
    small = duplicate_spans(corpus(500), n=8).count()
    t_small = time.time() - t0
    t0 = time.time()
    big = duplicate_spans(corpus(5000), n=8).count()
    t_big = time.time() - t0
    # every 5th doc carries the planted span -> counts scale 10x exactly
    assert small == 100 and big == 1000
    # generous near-linear bound (fixture job overhead dominates)
    assert t_big <= 25 * max(t_small, 0.5), (t_small, t_big)
