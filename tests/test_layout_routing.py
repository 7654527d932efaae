"""Layout awareness for ad-hoc star joins (plans/star_layout.py
maybe_star_layout + the j1/w3/q13 routing in queries/core.py): route to
the engine-owned bucketed layout ONLY when it exists and verifiably
derives from the current source files; silent fallback otherwise; never
build from a read path. The staleness contract mirrors the semantic
layer's rollup fingerprints (plans/fingerprint.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.plans import star_layout
from dbt_analytics_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = ("orders", "customer", "nation", "region")


@pytest.fixture(autouse=True)
def _route_at_toy_scale(monkeypatch):
    """Routing is fact-size gated (ROUTE_MIN_FACT_BYTES: below ~32 MB
    the raw broadcast plan wins); these tests exercise the routing
    machinery itself at toy scale, so pin the gate open."""
    monkeypatch.setattr(star_layout, "ROUTE_MIN_FACT_BYTES", 0)


@pytest.fixture()
def sf_copy(tmp_path):
    """A private, MUTABLE copy of the star tables so staleness tests can
    rewrite sources without touching the shared testdata. The dir name
    is unique per test: layout table names derive from it, so tests
    never collide on each other's warehouse leftovers."""
    import uuid

    d = str(tmp_path / f"sfc_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    for t in TABLES:
        shutil.copy(os.path.join(SF, f"{t}.parquet"), d)
    return d


def _fresh_session_view():
    """Simulate a NEW session's view of mutated source files: the
    per-session load_testdata cache holds the old file listing (testdata
    dirs are immutable in real use; these tests mutate private copies)."""
    from dbt_analytics_spark.sources import readers

    readers._CACHE.clear()


def _j1_rows(spark, sf_dir):
    return sorted(
        map(tuple, REGISTRY["j1_join_agg"][0](spark, sf_dir).collect())
    )


def test_route_misses_without_layout(spark, sf_copy):
    assert star_layout.maybe_star_layout(spark, sf_copy) is None
    assert star_layout.last_route_used is None
    # the ad-hoc query still answers (raw-parquet fallback)
    assert len(_j1_rows(spark, sf_copy)) == 25


def test_route_hits_after_ensure_and_matches_fallback(spark, sf_copy):
    raw = _j1_rows(spark, sf_copy)
    assert star_layout.last_route_used is None
    star_layout.ensure_star_layout(spark, sf_copy)
    routed = _j1_rows(spark, sf_copy)
    assert star_layout.last_route_used is not None
    assert routed == raw


def test_route_never_builds(spark, sf_copy):
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    before = set(os.listdir(wh))
    assert star_layout.maybe_star_layout(spark, sf_copy) is None
    assert set(os.listdir(wh)) == before  # no layout dirs appeared


def test_route_stale_after_source_rewrite_falls_back(spark, sf_copy):
    star_layout.ensure_star_layout(spark, sf_copy)
    assert star_layout.maybe_star_layout(spark, sf_copy) is not None
    # the source fact is REWRITTEN after the layout was built: keep only
    # orders from one status so the answer visibly changes
    orders = spark.read.parquet(os.path.join(sf_copy, "orders.parquet"))
    kept = orders.filter(F.col("o_orderstatus") == "O").collect()
    schema = orders.schema
    tmp_new = sf_copy + "_neworders"
    spark.createDataFrame(kept, schema).coalesce(1).write.parquet(tmp_new)
    os.remove(os.path.join(sf_copy, "orders.parquet"))
    os.rename(tmp_new, os.path.join(sf_copy, "orders.parquet"))
    _fresh_session_view()
    # the router must refuse the stale layout...
    assert star_layout.maybe_star_layout(spark, sf_copy) is None
    # ...and the ad-hoc query must answer from the NEW source
    rows = REGISTRY["j1_join_agg"][0](spark, sf_copy)
    total = sum(r["n_orders"] for r in rows.collect())
    assert total == len(kept)


def test_ensure_rebuilds_stale_layout(spark, sf_copy):
    """ensure_star_layout (the explicit build path) must DETECT the
    stale stamp and rebuild rather than reuse."""
    star_layout.ensure_star_layout(spark, sf_copy)
    orders = spark.read.parquet(os.path.join(sf_copy, "orders.parquet"))
    kept = orders.filter(F.col("o_orderstatus") == "O").collect()
    tmp_new = sf_copy + "_neworders"
    spark.createDataFrame(kept, orders.schema).coalesce(1).write.parquet(
        tmp_new
    )
    os.remove(os.path.join(sf_copy, "orders.parquet"))
    os.rename(tmp_new, os.path.join(sf_copy, "orders.parquet"))
    _fresh_session_view()
    spark.conf.set("spark.dbt_analytics.orphanHealMinAgeSeconds", "0")
    try:
        star_layout.ensure_star_layout(spark, sf_copy)
    finally:
        spark.conf.unset("spark.dbt_analytics.orphanHealMinAgeSeconds")
    rows = REGISTRY["j1b_join_agg_bucketed"][0](spark, sf_copy)
    assert sum(r["n_orders"] for r in rows.collect()) == len(kept)


def test_route_refuses_partial_write(spark, sf_copy):
    """Persisted files without _SUCCESS (crashed write) must never be
    re-registered by the router; with the marker restored it routes."""
    o_tbl, c_tbl = star_layout.ensure_star_layout(spark, sf_copy)
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    dirs = {t: os.path.join(wh, t.lower()) for t in (o_tbl, c_tbl)}
    # simulate a dead session: catalog entries gone, files persisted
    for t, d in dirs.items():
        shutil.copytree(d, d + ".keep")
        spark.sql(f"DROP TABLE {t}")  # managed drop removes the files
        shutil.move(d + ".keep", d)
    # crash the orders write: no _SUCCESS
    os.remove(os.path.join(dirs[o_tbl], "_SUCCESS"))
    assert star_layout.maybe_star_layout(spark, sf_copy) is None
    # restore the marker: the router re-registers and routes
    open(os.path.join(dirs[o_tbl], "_SUCCESS"), "w").close()
    assert star_layout.maybe_star_layout(spark, sf_copy) is not None
    assert len(_j1_rows(spark, sf_copy)) == 25


def test_route_respects_fact_size_gate(spark, sf_copy, monkeypatch):
    """Below ROUTE_MIN_FACT_BYTES the raw broadcast plan wins — the
    router must decline even when a fresh layout exists."""
    star_layout.ensure_star_layout(spark, sf_copy)
    assert star_layout.maybe_star_layout(spark, sf_copy) is not None
    monkeypatch.setattr(star_layout, "ROUTE_MIN_FACT_BYTES", 1 << 60)
    assert star_layout.maybe_star_layout(spark, sf_copy) is None
    assert star_layout.last_route_used is None
    assert len(_j1_rows(spark, sf_copy)) == 25  # raw fallback


def test_spec_cache_invalidates_on_mid_session_schema_change(spark, sf_copy):
    """_SPEC_STATIC caches the derived schema DDL per (appId, sf_dir,
    n_buckets); if source files are rewritten with a CHANGED schema
    mid-session, a rebuild must write a sidecar carrying the FRESH
    schema, not the stale cached string (otherwise spec-equality gating
    forces one wasted rebuild in the next session)."""
    specs_before = star_layout._star_specs(
        spark, sf_copy, star_layout.N_BUCKETS
    )
    # rewrite orders with an extra column mid-session
    orders = spark.read.parquet(os.path.join(sf_copy, "orders.parquet"))
    widened = orders.withColumn("o_extra", F.lit(1).cast("int"))
    tmp_new = sf_copy + "_neworders"
    widened.coalesce(1).write.parquet(tmp_new)
    os.remove(os.path.join(sf_copy, "orders.parquet"))
    os.rename(tmp_new, os.path.join(sf_copy, "orders.parquet"))
    _fresh_session_view()
    specs_after = star_layout._star_specs(
        spark, sf_copy, star_layout.N_BUCKETS
    )
    assert "o_extra" not in specs_before[0][2]["schema"]
    assert "o_extra" in specs_after[0][2]["schema"]
    # and a rebuild writes the fresh schema into the sidecar
    spark.conf.set("spark.dbt_analytics.orphanHealMinAgeSeconds", "0")
    try:
        o_tbl, _ = star_layout.ensure_star_layout(spark, sf_copy)
    finally:
        spark.conf.unset("spark.dbt_analytics.orphanHealMinAgeSeconds")
    from dbt_analytics_spark.plans.fingerprint import read_sidecar

    side = read_sidecar(
        star_layout._warehouse_path(spark, o_tbl),
        star_layout.LAYOUT_SIDECAR,
    )
    assert side is not None and "o_extra" in side["schema"]
    # the freshly built layout routes without a redundant rebuild
    assert star_layout.maybe_star_layout(spark, sf_copy) is not None
