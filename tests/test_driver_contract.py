"""Static driver-contract checks (no Spark jobs): bench headline names
resolve, every oracle key has a query, and oracle SQL only references the
pre-registered driver views."""

from __future__ import annotations

import re

import bench
import __spark_entry__ as entry_mod
from dbt_analytics_spark.queries import REGISTRY

DRIVER_VIEWS = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}


def test_headline_queries_registered():
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing


def test_every_query_callable_and_oracles_subset():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    # Every registry entry is exposed through the driver contract.
    assert set(qs) == set(REGISTRY)


def test_oracle_sql_references_only_driver_views():
    # Crude FROM/JOIN table extraction; CTE names are excluded via WITH scan.
    for name, sql in entry_mod.oracle_sql().items():
        # EXTRACT(x FROM col) is not a table reference.
        sql = re.sub(r"(?i)extract\s*\([^)]*\)", "", sql)
        ctes = set(
            re.findall(
                r"(?i)(?:with(?:\s+recursive)?|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+as\s*\(",
                sql,
            )
        )
        tables = set(
            t.lower()
            for t in re.findall(r"(?i)\bfrom\s+([a-z_][a-z0-9_]*)\b", sql)
            + re.findall(r"(?i)\bjoin\s+([a-z_][a-z0-9_]*)\b", sql)
        )
        unknown = tables - DRIVER_VIEWS - ctes - {"read_parquet", "lateral", "t", "q", "m", "c", "p", "b", "l"}
        assert not unknown, (name, unknown)
