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
        # "lateral" is a keyword that can follow JOIN, not a table name. No
        # alias whitelist: every other captured token must be a driver view
        # or a CTE defined in the same statement (a whitelist of one-letter
        # aliases could mask a real unknown-table reference).
        unknown = tables - DRIVER_VIEWS - ctes - {"lateral"}
        assert not unknown, (name, unknown)


def test_driver_prefix_is_frozen():
    # The driver verifies only the FIRST 50 registered queries (see
    # queries/__init__.py). Freeze the round-6 prefix so an accidental
    # registry reorder (new import order, dict churn) can't silently eject
    # a query from driver verification. Intentional rotations update this
    # list in the same commit (round-7 rotation: txt14/ev6/dd10/ev1c/smp4/f6
    # in, mm2/txt3/txt5/dd2/smp2/f1 out — see queries/__init__.py for the
    # per-query sibling-evidence rationale).
    from dbt_analytics_spark import queries as q

    expected_prefix = [
        "q1_pricing_summary", "p1_projection_cast", "p2_filter_ilike",
        "p3_case_classify", "p5_coalesce", "j1_join_agg", "j2_left_join",
        "j3b_regex_lateral_top1", "j4_lateral_expr", "j5_explode_split",
        "a1_multi_grain_rollup", "a3_conditional_agg", "a4_count_distinct",
        "w1_dedup_rank", "w2_first_value", "w3_pct_of_total",
        "u1_union_dedup", "u2_union_all_dim", "g1_date_spine",
        "d1_date_trunc", "d2_extract", "d3_interval_arith", "t2_regex_match",
        "t4_string_fns", "t3_normalize", "so1_order_limit", "ev1_sessionize",
        "ev2_json_extract", "ev3_asof_join", "ev4_range_join", "ev5_funnel",
        "ev6_retention_cohorts", "ev1c_session_window", "dd1_exact_dedup",
        "dd3_minhash_lsh", "dd5_embedding_neardup", "sim1_cosine_topk",
        "sim3_ivf_topk", "txt1_token_stats", "txt2_quality",
        "txt4_fingerprint", "mm1_features", "dd6_decontaminate",
        "dd7_cluster_dedup", "txt10_repetition", "txt13_lm_score",
        "dd10_exact_substring", "smp4_temperature_mixture", "f6_histogram",
        "txt14_nb_langid",
    ]
    assert list(q.queries())[:50] == expected_prefix
