"""Hand-computed semantics checks for the statistical text models
(operators/text.py: bigram_lm_score, nb_classify). The full-corpus
cross-engine check is tests/test_oracle_parity.py (txt13/txt14)."""

from __future__ import annotations

import math

import pytest

from dbt_analytics_spark.operators.text import bigram_lm_score, nb_classify


def test_bigram_lm_score_hand_computed(spark):
    # Train corpus: "a b a b" → bigrams: (a b) x2? no — "a b a b" gives
    # a-b, b-a, a-b → c2: {"a b": 2, "b a": 1}; c1: {a: 2, b: 1};
    # successor vocab V = {b, a} → 2.
    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "a b"), (11, "a c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bigram_lm_score(train, score).collect()}
    # doc 10: one bigram "a b": ln((2+1)/(2+2)) = ln(0.75)
    assert rows[10].n_bigrams == 1
    assert rows[10].avg_logp == pytest.approx(round(math.log(3 / 4), 6), abs=1e-9)
    # doc 11: unseen bigram "a c", seen head a: ln((0+1)/(2+2)) = ln(0.25)
    assert rows[11].avg_logp == pytest.approx(round(math.log(1 / 4), 6), abs=1e-9)


def test_bigram_lm_single_token_docs_omitted(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame([(2, "solo")], "doc_id long, text string")
    assert bigram_lm_score(train, score).count() == 0


def test_nb_classify_hand_computed(spark):
    # Two labels with disjoint vocab; a test doc of pure "x" tokens must
    # classify as the label that saw "x".
    train = spark.createDataFrame(
        [(1, "x x y", "en"), (2, "u u v", "de")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "x x", "en"), (11, "u v u", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in nb_classify(train, test).collect()}
    assert out[10].predicted == "en" and out[10].correct
    assert out[11].predicted == "de" and out[11].correct
    # Hand-check doc 10's winning score: V=4 (x,y,u,v), prior ln(1/2),
    # P(x|en) = (2+1)/(3+4) → score = ln(0.5) + 2*ln(3/7).
    want = round(math.log(0.5) + 2 * math.log(3 / 7), 6)
    assert out[10].score == pytest.approx(want, abs=1e-9)


def test_nb_classify_tie_breaks_label_asc(spark):
    # Symmetric labels → identical rounded scores; argmax must break on
    # label ascending, deterministically.
    train = spark.createDataFrame(
        [(1, "x", "aa"), (2, "x", "bb")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "x", "bb")], "doc_id long, text string, lang string"
    )
    row = nb_classify(train, test).collect()[0]
    assert row.predicted == "aa"
    assert not row.correct


# ---------------------------------------------------------------------------
# Property-based crosschecks against pure-Python references
# ---------------------------------------------------------------------------

from collections import Counter
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _py_bigrams(text):
    w = text.split()
    return [(w[i], w[i + 1]) for i in range(len(w) - 1)]


@settings(max_examples=10, deadline=None)
@given(docs=_corpus)
def test_bigram_lm_matches_python_reference(spark, docs):
    from hypothesis import assume

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = [t for i, t in rows if i % 2 == 0]
    # Degenerate all-singleton train halves have no bigrams → the model is
    # undefined (documented bigram_lm_score precondition).
    assume(any(len(t.split()) >= 2 for t in train))
    c2 = Counter(g for t in train for g in _py_bigrams(t))
    c1 = Counter(g[0] for t in train for g in _py_bigrams(t))
    V = len({g[1] for t in train for g in _py_bigrams(t)})
    want = {}
    for i, t in rows:
        grams = _py_bigrams(t)
        if not grams:
            continue
        lps = [
            math.log((c2.get(g, 0) + 1) / (c1.get(g[0], 0) + V)) for g in grams
        ]
        want[i] = (len(grams), round(sum(lps) / len(lps), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in bigram_lm_score(
            df.filter("doc_id % 2 = 0"), df
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)


@settings(max_examples=10, deadline=None)
@given(docs=_corpus)
def test_exact_substring_matches_python_reference(spark, docs):
    from dbt_analytics_spark.operators.dedup import exact_substring_pairs

    K, CAP = 3, 4
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def windows(text):
        w = text.split()
        if len(w) < K:
            return {" ".join(w)}
        return {" ".join(w[i : i + K]) for i in range(len(w) - K + 1)}

    inv = {}
    for i, t in rows:
        for g in windows(t):
            inv.setdefault(g, set()).add(i)
    want = Counter()
    for g, ds in inv.items():
        if 2 <= len(ds) <= CAP:
            for a, b in combinations(sorted(ds), 2):
                want[(a, b)] += 1
    got = {
        (r.doc_a, r.doc_b): r.n_shared_windows
        for r in exact_substring_pairs(df, k=K, max_gram_docs=CAP).collect()
    }
    assert got == dict(want)
