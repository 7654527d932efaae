"""Connected-components crosscheck: the distributed min-label propagation
must agree with a plain-Python union-find on random graphs, including
long chains that force multiple propagation rounds."""

from __future__ import annotations

import numpy as np

from dbt_analytics_spark.operators.graph import connected_components

RNG = np.random.default_rng(11)


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.parent}


def _check(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, ["doc1", "doc2"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "doc1", "doc2").collect()
    }
    assert got == _reference(edges)


def test_cc_random_graph(spark):
    # 120 random edges over 80 nodes: several non-trivial components.
    edges = [
        (int(a), int(b))
        for a, b in zip(RNG.integers(0, 80, 120), RNG.integers(0, 80, 120))
        if a != b
    ]
    _check(spark, edges)


def test_cc_long_chains_need_multiple_rounds(spark):
    # Two 30-node chains + a 10-node cycle: diameter ~30 forces many
    # propagation rounds; labels must still collapse to the chain minimum.
    edges = [(i, i + 1) for i in range(100, 130)]
    edges += [(i, i + 1) for i in range(200, 230)]
    edges += [(300 + i, 300 + (i + 1) % 10) for i in range(10)]
    _check(spark, edges)
    # Reversed edge direction must not matter.
    _check(spark, [(b, a) for a, b in edges])


def test_cc_keeps_singleton_free_output(spark):
    # Nodes appear only via edges; an isolated pair forms its own component.
    edges = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(edges, ["doc1", "doc2"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "doc1", "doc2").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
