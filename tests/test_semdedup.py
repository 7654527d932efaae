"""SemDeDup (operators/similarity.py: semdedup_flags) mechanics.

The hash-green DuckDB oracle (dd11_semdedup, tests/test_oracle_parity.py)
covers end-to-end values; here we pin the operator's internal contracts:
the block-loop memory bound changes nothing, drops only ever point at
LOWER ids inside the SAME cell, and the greedy keep-first rule keeps at
least one representative per duplicate group.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dbt_analytics_spark.operators.similarity import (
    kmeans_assign,
    semdedup_flags,
)
from dbt_analytics_spark.sources import load_testdata

SF = "/root/testdata/sf0.001"


def _with_cells(spark):
    emb = load_testdata(spark, SF)["embeddings"]
    crows = (
        emb.filter(F.col("vec_id").isin(0, 1, 2, 3))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    C = np.asarray([list(r[0]) for r in crows], dtype=np.float64)
    assigned = kmeans_assign(emb, C, "vec_id", "embedding")
    return emb.join(assigned.select(F.col("id").alias("vec_id"), "cell"), "vec_id")


def test_block_loop_invariant(spark):
    # The row-block matmul (the per-cell memory bound) must be a pure
    # implementation detail: block=7 (forcing many partial passes) and the
    # default block produce byte-identical flags.
    wc = _with_cells(spark)
    a = sorted(map(tuple, semdedup_flags(wc, threshold=0.4).collect()))
    b = sorted(map(tuple, semdedup_flags(wc, threshold=0.4, block=7).collect()))
    assert a == b
    assert len(a) == wc.count()


def test_drops_are_lower_id_same_cell(spark):
    wc = _with_cells(spark)
    flags = semdedup_flags(wc, threshold=0.4)
    rows = {r["id"]: r for r in flags.collect()}
    # Recompute the ground truth pairs in numpy on the driver (500 rows).
    data = wc.select("vec_id", "cell", "embedding").collect()
    by_cell: dict[int, list] = {}
    for r in sorted(data, key=lambda r: r["vec_id"]):
        by_cell.setdefault(r["cell"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    n_dropped = 0
    for cell, members in by_cell.items():
        ids = [i for i, _ in members]
        X = np.stack([v for _, v in members])
        norms = np.sqrt((X * X).sum(axis=1))
        S = (X @ X.T) / np.outer(norms, norms)
        for i_pos, i in enumerate(ids):
            expect = int((np.round(S[i_pos, :i_pos], 6) >= 0.4).sum())
            assert rows[i]["n_dups_lower"] == expect, (cell, i)
            assert rows[i]["is_dropped"] == (expect > 0)
            n_dropped += int(expect > 0)
    # The earliest member of every duplicate group is never dropped: some
    # survivor exists in any cell that produced drops.
    assert n_dropped < len(rows)
