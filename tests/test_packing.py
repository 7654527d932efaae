"""pack_sequences invariants: exactly-once assignment, budget respected,
oversize flagging, partitioning-independence, utilization, and equality
with a pure-Python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_analytics_spark.operators.packing import pack_sequences, pack_stats

MAX = 256


def _docs(spark, n=400, seed=5):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        n_tok = rng.choice(
            [rng.randrange(5, 40), rng.randrange(40, 200), rng.randrange(200, 400)]
        )
        rows.append(Row(doc_id=i, text=" ".join(f"t{j}" for j in range(n_tok))))
    return spark.createDataFrame(rows)


def _py_reference(rows, max_tokens, n_groups=64):
    """Replays the documented algorithm exactly (hash grouping is Spark
    xxhash64, so groups come from the Spark-computed group ids)."""
    packs = {}
    for gid in sorted({r["group_id"] for r in rows}):
        grp = sorted(
            (r for r in rows if r["group_id"] == gid),
            key=lambda r: (-r["n_tokens"], r["doc_id"]),
        )
        caps = []
        for r in grp:
            n = r["n_tokens"]
            if n > max_tokens:
                caps.append(0)
                packs[r["doc_id"]] = (gid << 32) + len(caps) - 1
                continue
            for i, c in enumerate(caps):
                if c >= n:
                    caps[i] = c - n
                    packs[r["doc_id"]] = (gid << 32) + i
                    break
            else:
                caps.append(max_tokens - n)
                packs[r["doc_id"]] = (gid << 32) + len(caps) - 1
    return packs


def test_invariants_and_reference_equality(spark):
    docs = _docs(spark)
    out = pack_sequences(docs, MAX, n_groups=8)
    rows = out.collect()
    assert len(rows) == docs.count()                       # exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)
    stats = pack_stats(out, MAX).collect()
    for s in stats:
        over = [r for r in rows if r["pack_id"] == s["pack_id"] and r["oversize"]]
        if over:
            assert s["n_docs"] == 1                        # oversize isolated
        else:
            assert s["pack_tokens"] <= MAX                 # budget respected

    # Reference equality (groups from the Spark run, algorithm replayed).
    sized = (
        docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " "))
            .cast("long")
            .alias("n_tokens"),
            F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("long").alias("group_id"),
        )
        .collect()
    )
    want = _py_reference(sized, MAX)
    got = {r["doc_id"]: r["pack_id"] for r in rows}
    assert got == want


def test_partitioning_independence(spark):
    docs = _docs(spark, n=300, seed=9)
    a = {r["doc_id"]: r["pack_id"] for r in pack_sequences(docs, MAX).collect()}
    b = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(docs.repartition(13), MAX).collect()
    }
    assert a == b


def test_utilization_floor(spark):
    # Realistic mixed lengths, large groups: FFD should fill packs well.
    docs = _docs(spark, n=1000, seed=11)
    out = pack_sequences(docs, MAX, n_groups=4)
    stats = pack_stats(out.filter(~F.col("oversize")), MAX)
    # All packs but the tail per group should be > 70% full on average.
    avg_fill = stats.agg(F.avg("fill_ratio")).collect()[0][0]
    assert avg_fill > 0.7, avg_fill


def test_validation(spark):
    docs = _docs(spark, n=5)
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(docs, 0)


def test_null_text_packs_as_zero_tokens(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c"),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="d e"),
        ]
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, 10, n_groups=2).collect()}
    assert set(rows) == {1, 2, 3}          # NULL-text doc still packs once
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["oversize"] is False
