"""Distributed connected components — the clustering step of near-dup
deduplication (pairs → clusters → one canonical keeper per cluster).

Algorithm: min-label propagation with pointer jumping. Every node starts
labeled with itself; each round a node's label becomes the min over {its
own label, its neighbors' labels, its label's label}. The label-of-label
("pointer jump") step doubles the propagation horizon per round, so
convergence takes O(log diameter) rounds instead of O(diameter) — a
100-link chain collapses in ~7 rounds. Converged when no label changes.

Scale notes (100 TB):
- The edge relation shuffles once per round keyed by node id — skinny rows,
  uniform keys (doc ids), no payloads.
- Label state is localCheckpoint()ed per round: the self-joins roughly
  QUADRUPLE the logical plan per round, so a persist (which caches data
  but keeps the logical lineage) leaves Catalyst re-analyzing an
  exponentially growing plan each round — checkpointing truncates the
  lineage so every round starts from a leaf. (Measured: 3 small-graph
  tests 315 s with persist, ~40 s with checkpoint.)
- The convergence check is one count per round (the only driver action);
  for a fixed-round variant pass check_convergence=False and max_iter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 25,
    check_convergence: bool = True,
) -> DataFrame:
    """Label every node reachable through ``edges`` with its component's
    minimum node id. Returns (node, component)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("nbl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbl").alias("nbr_min"))
        )
        one_hop = labels.join(
            nbr_min.withColumnRenamed("a", "node"), "node", "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                "label"
            ),
            # The round's starting label rides along so convergence is a
            # filter-count over the checkpointed blocks — no extra
            # old-vs-new join shuffle per round.
            F.col("label").alias("prev"),
        )
        # Pointer jump: also adopt the label's own (new) label — the
        # component minimum is always a member, so the self-join always
        # resolves, and each round doubles the reachable horizon.
        new_labels = (
            one_hop.alias("l")
            .join(
                one_hop.select(
                    F.col("node").alias("label"), F.col("label").alias("ll")
                ).alias("j"),
                "label",
                "left",
            )
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("ll", F.col("label"))).alias(
                    "label"
                ),
                "prev",
            )
            .localCheckpoint()  # truncate lineage: next round starts from a leaf
        )
        if check_convergence:
            changed = new_labels.filter(F.col("label") != F.col("prev")).count()
        else:
            changed = 1
        labels = new_labels.drop("prev")
        if check_convergence and changed == 0:
            break
    # Checkpointed blocks are released by the ContextCleaner when the
    # intermediate DataFrames are garbage collected; the returned frame
    # reads the final round's materialized blocks.
    return labels.select("node", F.col("label").alias("component"))
