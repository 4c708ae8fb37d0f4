"""Bigram LM quality (operators/text.py bigram_logprob): add-1-smoothed
second-order LM score.  Pins: exact equality with a pure-Python model
(including the integer-1e-9 rounding convention), word-order
discrimination that unigram frequencies cannot express, sub-2-token
exclusion, and repartition determinism."""

from __future__ import annotations

import math

import pytest

from eth_event_tracker_spark.operators.text import bigram_logprob


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_model(texts: dict[int, str]):
    """The exact add-1 bigram model, python-side, with the operator's
    integer-1e-9 rounding convention."""
    bigrams: dict[int, list[tuple[str, str]]] = {}
    for d, t in texts.items():
        toks = [w for w in t.lower().split() if w]
        bigrams[d] = list(zip(toks, toks[1:]))
    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for bs in bigrams.values():
        for w1, w2 in bs:
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
            vocab.add(w2)
    v = len(vocab)
    out = {}
    for d, bs in bigrams.items():
        if not bs:
            continue
        contrib = sum(
            round(math.log((c12[(w1, w2)] + 1) / (c1[w1] + v)) * 1e9) for w1, w2 in bs
        )
        out[d] = (len(bs), contrib / len(bs) / 1e9)
    return out


class TestBigramLogprob:
    def test_exact_python_model_pin(self, spark):
        texts = {
            1: "a b a b a",
            2: "b a b",
            3: "a a b b a b",
            4: "c a b c",
        }
        got = {
            r["doc_id"]: (r["n_bigrams"], r["logprob"])
            for r in bigram_logprob(_mk(spark, list(texts.items()))).collect()
        }
        want = _py_model(texts)
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == want[d][0]
            assert got[d][1] == pytest.approx(want[d][1], abs=1e-12), d

    def test_word_order_discrimination(self, spark):
        # corpus dominated by the period-3 pattern p→q→r→p (note the
        # backwards transitions q→p / p→r / r→q NEVER occur in it —
        # "x y x y" would contain y→x as often as x→y); doc 90 follows
        # the pattern, doc 91 is its reversal with IDENTICAL unigrams —
        # only a second-order model separates them
        rows = [(i, "p q r " * 13) for i in range(20)]
        fwd = "p q r p q r p q"
        rows += [(90, fwd), (91, " ".join(reversed(fwd.split())))]
        got = {
            r["doc_id"]: r["logprob"]
            for r in bigram_logprob(_mk(spark, rows)).collect()
        }
        assert got[90] > got[91] + 0.5, (
            "the pattern-following doc must score clearly above its "
            "reversal — unigram counts are identical for both"
        )

    def test_short_and_null_docs_excluded(self, spark):
        rows = [(1, "hello"), (2, ""), (3, None), (4, "   "), (5, "a b")]
        got = {r["doc_id"] for r in bigram_logprob(_mk(spark, rows)).collect()}
        assert got == {5}

    def test_repartition_deterministic(self, spark):
        rows = [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7} w{i % 3}") for i in range(40)]
        a = bigram_logprob(_mk(spark, rows).repartition(1)).orderBy("doc_id").collect()
        b = bigram_logprob(_mk(spark, rows).repartition(9)).orderBy("doc_id").collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BLM_DOC = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(BLM_DOC, min_size=1, max_size=6))
def test_bigram_logprob_fuzz_vs_python_model(spark, corpus):
    texts = {i: " ".join(ws) for i, ws in enumerate(corpus)}
    df = _mk(spark, list(texts.items()))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob"])
        for r in bigram_logprob(df).collect()
    }
    want = _py_model(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-12), d
