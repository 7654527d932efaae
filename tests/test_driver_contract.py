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
    # queries/__init__.py). Freeze the round-17 prefix so an accidental
    # registry reorder (new import order, dict churn) can't silently eject
    # a query from driver verification. Intentional rotations update this
    # list in the same commit (round-17 rotation: the never-driver-rowed
    # txt6/txt7/txt8/txt9/txt11/dd8/q6/q10/q14/q18 in;
    # mm1/a6/sim3b/txt16b/sem6/sem13/smp7/dd13/dd7/sem2 out — each with
    # the most cumulative green rows among non-headline prefix queries
    # and in-prefix sibling evidence — see queries/__init__.py).
    from dbt_analytics_spark import queries as q

    expected_prefix = [
        "q1_pricing_summary", "q1b_pricing_summary_layout",
        "q6_revenue_forecast", "q10_returned_items",
        "q13_custdist", "q13b_custdist_bucketed", "zo1_zorder_box_filter",
        "q15_top_supplier", "q17_small_qty_revenue",
        "q14_promo_revenue", "q18_large_orders",
        "j1_join_agg", "j1b_join_agg_bucketed", "w3b_pct_of_total_bucketed",
        "j3b_regex_lateral_top1", "j5_explode_split",
        "w3_pct_of_total",
        "ev1_sessionize", "ev1b_sessionize_bucketed", "ev5b_funnel_steps",
        "a5_cube", "p6_pivot", "u3_except_intersect",
        "w6_range_frame", "f4_profile",
        "dd1_exact_dedup", "dd3_minhash_lsh",
        "dd3b_minhash_lsh_exact", "sim1_cosine_topk",
        "txt2_quality",
        "mm3_audio_features", "mm5_media_metadata",
        "dd6_decontaminate",
        "smp1_stratified_sample",
        "txt6_keywords", "dd8_clean_corpus", "txt7_training_filter",
        "txt8_pii_redact", "txt9_chunk", "txt11_vocab",
        "txt12_bm25_topk",
        "sim6_ivf_index_exact",
        "f5b_heavy_hitters_exact",
        "txt14_nb_langid",
        "sem1_entity_star_metrics",
        "sem3_trailing_window",
        "sem4_conversion_rate", "sem5_saved_query",
        "sem16_metric_filter", "sem17_rollup_routing",
    ]
    assert list(q.queries())[:50] == expected_prefix
    # The only prefix row without a DuckDB oracle is the rows-only-by-
    # design banded LSH miner (its exact-regime sibling dd3b holds a
    # hash-checked prefix row of its own; sim3's rows-only row rotated
    # out in r13 — the ANN family holds three hash-checked prefix rows).
    oracles = set(q.oracle_sql())
    assert [n for n in expected_prefix if n not in oracles] == [
        "dd3_minhash_lsh",
    ]
