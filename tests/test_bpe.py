"""BPE tokenizer training/application (operators/bpe.py) vs a pure-Python
reference implementation: learned merge lists must match exactly
(including tie-breaks), and segmentation must round-trip."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_analytics_spark.operators.bpe import (
    EOW,
    _apply_merges_to_word,
    bpe_segment,
    bpe_train,
)


def _py_apply(s, left, right):
    out = []
    for x in s:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_train(texts, n_merges):
    wf = Counter(w for t in texts for w in t.lower().split() if w)
    syms = {w: list(w) + [EOW] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), n = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((left, right, n))
        syms = {w: _py_apply(s, left, right) for w, s in syms.items()}
    return merges


def test_bpe_train_matches_python_reference_fixed(spark):
    texts = ["low lower lowest", "low low newer newest", "wider new new"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(df, n_merges=8)
    want = _py_train(texts, 8)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ab", "abc", "bc", "aab", "cab", "b"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
def test_bpe_train_matches_python_reference_property(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert bpe_train(df, n_merges=5) == _py_train(texts, 5)


def test_bpe_segment_applies_merges(spark):
    texts = ["low low low lower"]
    df = spark.createDataFrame([(1, texts[0])], "doc_id long, text string")
    merges = bpe_train(df, n_merges=4)
    seg = bpe_segment(df, merges).collect()[0]
    # Reference application word-by-word.
    rules = [(m[0], m[1]) for m in merges]
    want = []
    for w in texts[0].split():
        want.extend(_apply_merges_to_word(w, rules))
    assert seg.bpe_tokens == want
    assert seg.n_words == 4
    assert seg.n_bpe_tokens == len(want)
    # Segmentation reconstructs the original text (EOW marks boundaries).
    joined = "".join(seg.bpe_tokens).replace(EOW, " ").strip()
    assert joined == texts[0]


def test_bpe_train_validates_and_exhausts(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)
    # "ab</w>" fully merges in 2 steps; asking for more stops early.
    merges = bpe_train(df, n_merges=10)
    assert 2 <= len(merges) <= 3
    rules = [(m[0], m[1]) for m in merges]
    assert _apply_merges_to_word("ab", rules) == ["ab" + EOW]


def test_bpe_segment_null_text_and_long_word(spark):
    # NULL-text docs emit an empty segmentation instead of crashing the
    # job; over-cap words pass through unsplit (mirroring the training
    # exclusion).
    df = spark.createDataFrame(
        [(1, "low low"), (2, None), (3, "x" * 40)],
        "doc_id long, text string",
    )
    merges = bpe_train(df, n_merges=3, max_word_chars=30)
    rows = {r.id: r for r in bpe_segment(df, merges, max_word_chars=30).collect()}
    assert rows[2].n_words == 0 and rows[2].n_bpe_tokens == 0
    assert rows[2].bpe_tokens == []
    assert rows[3].bpe_tokens == ["x" * 40 + EOW]
    assert rows[1].n_words == 2
