"""Unit semantics for the PII-redaction and context-window-chunking
operators (their cross-engine hash parity is covered by
tests/test_oracle_parity.py via txt8/txt9)."""

from __future__ import annotations

import pytest

from dbt_analytics_spark.operators.text import (
    chunk_documents,
    pii_counts,
    redact_pii,
)


def _redact_one(spark, text: str) -> tuple[str, dict[str, int]]:
    df = spark.createDataFrame([(text,)], "text string")
    counts = pii_counts("text")
    row = df.select(
        redact_pii("text").alias("red"),
        *[c.alias(name) for name, c in counts.items()],
    ).collect()[0]
    return row["red"], {k: row[k] for k in counts}


def test_redact_every_kind(spark):
    red, n = _redact_one(
        spark,
        "mail a.smith+x@sub.example.org card 4111-1111 1111-9999 "
        "ssn 078-05-1120 call +1 415-555-2671 host 192.168.0.254 done",
    )
    assert red == (
        "mail <EMAIL> card <CC> ssn <SSN> call +1 <PHONE> host <IP> done"
    ), red
    assert n == {"email": 1, "cc": 1, "ssn": 1, "phone": 1, "ip": 1}


def test_redact_leaves_clean_text_alone(spark):
    text = "version 3.2.1 released in 2024, see section 4.5 for details"
    red, n = _redact_one(spark, text)
    assert red == text
    assert n == {"email": 0, "cc": 0, "ssn": 0, "phone": 0, "ip": 0}


def test_redact_specificity_order(spark):
    # An SSN-shaped span must NOT be half-eaten by the phone pattern, and a
    # credit card must not decay into phone fragments: most-specific first.
    red, n = _redact_one(spark, "123-45-6789 and 4111 1111 1111 1111")
    assert red == "<SSN> and <CC>"
    assert n["ssn"] == 1 and n["cc"] == 1 and n["phone"] == 0


def test_chunk_covers_all_tokens_with_overlap(spark):
    words = [f"w{i:03d}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_size=32, stride=24).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # ceil((100-32)/24)+1 = 4 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in rows] == [32, 32, 32, 28]
    seen = set()
    for r in rows:
        toks = r["chunk_text"].split(" ")
        start = r["chunk_idx"] * 24
        assert toks == words[start : start + 32]
        seen.update(toks)
    assert seen == set(words)
    # consecutive chunks overlap by chunk_size - stride = 8 tokens
    assert rows[0]["chunk_text"].split(" ")[-8:] == rows[1]["chunk_text"].split(" ")[:8]


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [(1, "just a few tokens"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in chunk_documents(df).collect()}
    assert len(rows) == 2
    assert rows[1]["chunk_idx"] == 0 and rows[1]["n_chunk_tokens"] == 4
    assert rows[1]["chunk_text"] == "just a few tokens"
    # empty text still yields exactly one (empty) chunk, mirroring the oracle
    assert rows[2]["chunk_idx"] == 0 and rows[2]["chunk_text"] == ""


def test_chunk_exact_boundary_no_phantom_chunk(spark):
    # n == chunk_size + k*stride must not emit a trailing empty window
    words = [str(i) for i in range(56)]  # 32 + 24 exactly
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = chunk_documents(df, chunk_size=32, stride=24).collect()
    assert sorted(r["chunk_idx"] for r in rows) == [0, 1]
    assert {r["n_chunk_tokens"] for r in rows} == {32}


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, stride=16)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, stride=0)
