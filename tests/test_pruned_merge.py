"""Partition-pruned MERGE + dbt incremental_predicates
(plans/materialize.py:_apply_partition_pruned_merge / _precedence_merge).

Reference: SP/.../incremental/merge.sql:1-96 (MERGE builder; the
predicates arm ANDs extra conjuncts into the ON clause). At 100 TB the
point of these is that merge WRITE cost scales with affected partitions
and the match-side SCAN with the predicate window — both asserted here,
including the rewrite-only-affected-partitions physical contract via
file mtimes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.plans import Project


def _table_location(spark, name: str) -> str:
    row = [
        r
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        if r["col_name"] == "Location"
    ]
    return row[0]["data_type"].removeprefix("file:")


def _partition_files(loc: str, part: str) -> dict[str, float]:
    d = os.path.join(loc, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def _mk_inc(spark, name: str, state: dict, **cfg):
    p = Project(spark, name=f"proj_{name}")

    @p.model(
        materialized="incremental",
        unique_key="id",
        incremental_strategy="merge",
        name=name,
        **cfg,
    )
    def _m(ctx):
        return ctx.spark.createDataFrame(state["rows"], ["id", "day", "val"])

    return p


def test_pruned_merge_rows_and_untouched_partitions(spark):
    state = {"rows": [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d3", 40.0)]}
    p = _mk_inc(spark, "pm_basic", state, partition_by=("day",))
    p.run(select="pm_basic")
    loc = _table_location(spark, "pm_basic")
    before_d3 = _partition_files(loc, "day=d3")
    before_d1 = _partition_files(loc, "day=d1")

    # Update id=2 in d1, insert id=5 into d2, new partition d4. d3 is
    # untouched and must keep its exact files (no full-table rewrite).
    state["rows"] = [(2, "d1", 21.0), (5, "d2", 50.0), (6, "d4", 60.0)]
    p.run(select="pm_basic")

    got = {r["id"]: (r["day"], r["val"]) for r in spark.table("pm_basic").collect()}
    assert got == {
        1: ("d1", 10.0),
        2: ("d1", 21.0),
        3: ("d2", 30.0),
        4: ("d3", 40.0),
        5: ("d2", 50.0),
        6: ("d4", 60.0),
    }
    assert _partition_files(loc, "day=d3") == before_d3  # byte-untouched
    assert _partition_files(loc, "day=d1") != before_d1  # rewritten


def test_pruned_merge_key_moves_partition_and_empty_partition_dropped(spark):
    # d1 holds ONLY id=1; the batch moves id=1 to d2. The stale d1 copy
    # must disappear (old partition is affected via the key semi-join)
    # and the emptied d1 partition must be dropped from the catalog.
    state = {"rows": [(1, "d1", 1.0), (2, "d2", 2.0)]}
    p = _mk_inc(spark, "pm_move", state, partition_by=("day",))
    p.run(select="pm_move")

    state["rows"] = [(1, "d2", 9.0)]
    p.run(select="pm_move")

    got = {(r["id"], r["day"], r["val"]) for r in spark.table("pm_move").collect()}
    assert got == {(1, "d2", 9.0), (2, "d2", 2.0)}
    parts = [r[0] for r in spark.sql("SHOW PARTITIONS pm_move").collect()]
    assert parts == ["day=d2"]


def test_incremental_predicates_scope_matching(spark):
    # Unpartitioned merge with a predicate window: the existing id=1 row
    # OUTSIDE the window is a bystander — dbt semantics admit the batch's
    # id=1 as a new row (the documented duplicate tradeoff), while id=2
    # INSIDE the window is updated in place.
    state = {"rows": [(1, "old", 1.0), (2, "old", 2.0)]}
    p = _mk_inc(spark, "pm_preds", state, incremental_predicates=("day = 'old'",))
    p.run(select="pm_preds")

    p2 = _mk_inc(spark, "pm_preds", state, incremental_predicates=("day = 'new'",))
    state["rows"] = [(1, "new", 11.0), (2, "old", 22.0)]
    p2.run(select="pm_preds")

    got = sorted(
        (r["id"], r["day"], r["val"]) for r in spark.table("pm_preds").collect()
    )
    # id=1: existing row was outside "day = 'new'" -> duplicate admitted.
    # id=2: batch day='old'... also outside the window -> bystander kept
    # AND batch row admitted (both rows carry day='old'/'old').
    assert got == [
        (1, "new", 11.0),
        (1, "old", 1.0),
        (2, "old", 2.0),
        (2, "old", 22.0),
    ]


def test_incremental_predicates_inside_window_updates(spark):
    state = {"rows": [(1, "hot", 1.0), (2, "cold", 2.0)]}
    p = _mk_inc(spark, "pm_preds2", state, incremental_predicates=("day = 'hot'",))
    p.run(select="pm_preds2")
    state["rows"] = [(1, "hot", 99.0)]
    p.run(select="pm_preds2")
    got = {r["id"]: (r["day"], r["val"]) for r in spark.table("pm_preds2").collect()}
    assert got == {1: ("hot", 99.0), 2: ("cold", 2.0)}


def test_pruned_merge_with_predicates_inside_hot_slice(spark):
    # Predicates compose with partition pruning: within the affected
    # partitions, only predicate-matching rows join the match window.
    state = {"rows": [(1, "d1", 1.0), (2, "d1", 2.0)]}
    p = _mk_inc(
        spark,
        "pm_both",
        state,
        partition_by=("day",),
        incremental_predicates=("val < 100",),
    )
    p.run(select="pm_both")
    state["rows"] = [(1, "d1", 50.0)]
    p.run(select="pm_both")
    got = {r["id"]: r["val"] for r in spark.table("pm_both").collect()}
    assert got == {1: 50.0, 2: 2.0}


def test_pruned_merge_schema_drift_conforms_to_target(spark):
    # insertInto is positional against the stored schema: a batch with an
    # extra column must conform back (ignore semantics) instead of
    # corrupting column order.
    state = {"rows": [(1, "d1", 1.0)]}
    p = Project(spark, name="proj_pm_drift")

    @p.model(
        materialized="incremental",
        unique_key="id",
        incremental_strategy="merge",
        partition_by=("day",),
        name="pm_drift",
    )
    def pm_drift(ctx):
        df = ctx.spark.createDataFrame(state["rows"], ["id", "day", "val"])
        if state.get("extra"):
            df = df.withColumn("extra", F.lit("x"))
        return df

    p.run(select="pm_drift")
    state.update(rows=[(2, "d1", 2.0)], extra=True)
    p.run(select="pm_drift")
    got = {r["id"]: r["val"] for r in spark.table("pm_drift").collect()}
    assert got == {1: 1.0, 2: 2.0}
    assert "extra" not in spark.table("pm_drift").columns


def test_append_partitioned_keeps_layout_and_appends_only(spark):
    # Incremental append on a partitioned target: the batch APPENDS (old
    # partitions' files untouched - cost scales with the batch, not the
    # table) and the partition layout survives (the old staging rewrite
    # silently dropped it).
    state = {"rows": [(1, "d1", 1.0), (2, "d2", 2.0)]}
    p = Project(spark, name="proj_app_part")

    @p.model(
        materialized="incremental",
        incremental_strategy="append",
        partition_by=("day",),
        name="app_part_t",
    )
    def app_part_t(ctx):
        return ctx.spark.createDataFrame(state["rows"], ["id", "day", "val"])

    p.run(select="app_part_t")
    loc = _table_location(spark, "app_part_t")
    before_d1 = _partition_files(loc, "day=d1")

    state["rows"] = [(3, "d2", 3.0), (4, "d3", 4.0)]
    p.run(select="app_part_t")

    parts = sorted(r[0] for r in spark.sql("SHOW PARTITIONS app_part_t").collect())
    assert parts == ["day=d1", "day=d2", "day=d3"]
    assert spark.table("app_part_t").count() == 4
    assert _partition_files(loc, "day=d1") == before_d1  # byte-untouched


def test_append_schema_drift_policies_still_apply(spark):
    # append_new_columns drift forces the full restatement path - the new
    # column appears, the layout survives.
    state = {"rows": [(1, "d1", 1.0)], "extra": False}
    p = Project(spark, name="proj_app_drift")

    @p.model(
        materialized="incremental",
        incremental_strategy="append",
        on_schema_change="append_new_columns",
        partition_by=("day",),
        name="app_drift_t",
    )
    def app_drift_t(ctx):
        df = ctx.spark.createDataFrame(state["rows"], ["id", "day", "val"])
        if state["extra"]:
            df = df.withColumn("extra", F.lit("x"))
        return df

    p.run(select="app_drift_t")
    state.update(rows=[(2, "d1", 2.0)], extra=True)
    p.run(select="app_drift_t")
    t = spark.table("app_drift_t")
    assert "extra" in t.columns
    assert {r["id"]: r["extra"] for r in t.collect()} == {1: None, 2: "x"}
    parts = [r[0] for r in spark.sql("SHOW PARTITIONS app_drift_t").collect()]
    assert parts == ["day=d1"]
