"""Z-order clustering (operators/zorder.py + the materializer's
``zorder_by=`` option): Morton-code correctness against a pure-Python
reference, content identity of the reordered frame, and the actual
point of the layout — parquet row-group/file min/max stats that prune a
box predicate on a column the table is NOT linearly sorted by.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dbt_analytics_spark.operators.zorder import (
    ZVALUE_COL,
    interleave_bits,
    with_zvalue,
    zorder_dataframe,
)


def py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [
        Row(a=a, b=b)
        for a in (0, 1, 5, 255, 256, 65535)
        for b in (0, 2, 7, 100, 65535)
    ]
    df = spark.createDataFrame(rows)
    got = df.select(
        "a",
        "b",
        interleave_bits(
            [F.col("a").cast("long"), F.col("b").cast("long")], 16
        ).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == py_morton([r["a"], r["b"]], 16), (r["a"], r["b"])


def test_with_zvalue_scaling_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(x=0, y=None), Row(x=50, y=10), Row(x=100, y=20)]
    )
    out = {r["x"]: r[ZVALUE_COL] for r in with_zvalue(df, ["x", "y"]).collect()}
    # min row scales to bucket 0 on x; its NULL y also parks at 0
    assert out[0] == 0
    # max row has both columns at the top bucket -> all interleaved bits set
    bits = min(48 // 2, 63 // 2)
    assert out[100] == py_morton([(1 << bits) - 1, (1 << bits) - 1], bits)
    # monotone: the midpoint is strictly between
    assert out[0] < out[50] < out[100]


def test_zorder_dataframe_content_identity(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    z = zorder_dataframe(orders, ["o_custkey", "o_orderdate"], n_files=4)
    assert ZVALUE_COL not in z.columns
    assert z.count() == orders.count()
    # exceptAll both ways == multiset equality
    assert z.exceptAll(orders).count() == 0
    assert orders.exceptAll(z).count() == 0


def _files_overlapping_box(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(n_files_overlapping, n_files) by parquet footer column stats."""
    total, hit = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, total


def test_zorder_layout_prunes_second_dimension(spark, tmp_path):
    # 100k rows over two INDEPENDENT uniform keys: a linear sort on `a`
    # leaves `b` scattered (every file overlaps any b-box); the z-order
    # clusters both, so a narrow b-box touches only a fraction of files.
    n = 100_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("a"),
        ((F.col("id") * 7919) % 1000).alias("b"),
    )
    lin = str(tmp_path / "linear")
    zod = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(lin)
    )
    zorder_dataframe(df, ["a", "b"], n_files=16).write.parquet(zod)

    lin_hit, lin_total = _files_overlapping_box(lin, "b", 100, 150)
    z_hit, z_total = _files_overlapping_box(zod, "b", 100, 150)
    assert lin_total == z_total == 16
    assert lin_hit == 16, "control: b is scattered under the linear sort"
    assert z_hit <= 8, f"z-order should prune most files on b, hit {z_hit}"

    # and the a-dimension still prunes under z-order too
    za_hit, _ = _files_overlapping_box(zod, "a", 100, 150)
    assert za_hit <= 8, f"z-order should prune files on a as well, hit {za_hit}"

    # layout is invisible to results: same filtered counts both layouts
    pred = "b BETWEEN 100 AND 150"
    assert (
        spark.read.parquet(zod).filter(pred).count()
        == spark.read.parquet(lin).filter(pred).count()
    )


def test_materializer_zorder_by(spark, sf_dir, tmp_path):
    import datetime as dt

    from dbt_analytics_spark.plans import Project

    p = Project(spark, name="zo_proj", run_date=dt.date(2026, 1, 1))
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    p.source_table("raw_orders", src)

    @p.model(materialized="table", zorder_by=("o_custkey", "o_orderdate"),
             zorder_files=4)
    def orders_zo(ctx):
        return ctx.source("raw_orders")

    statuses = {r.node: r.status for r in p.run()}
    assert statuses == {"orders_zo": "success"}
    out = p.read_relation("orders_zo")
    assert out.count() == src.count()
    assert out.exceptAll(src).count() == 0

    # config fingerprint carries the layout (state:modified detection)
    assert p.nodes["orders_zo"].config_fingerprint()["zorder_by"] == [
        "o_custkey",
        "o_orderdate",
    ]
    spark.sql(f"DROP TABLE IF EXISTS {p.qualified('orders_zo')}")


def test_materializer_zorder_bucket_conflict(spark, sf_dir):
    import datetime as dt

    from dbt_analytics_spark.plans import Project

    p = Project(spark, name="zo_conflict", run_date=dt.date(2026, 1, 1))
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    p.source_table("raw_orders", src)

    @p.model(
        materialized="table",
        zorder_by=("o_custkey",),
        bucket_by=("o_custkey",),
        n_buckets=4,
    )
    def orders_conflict(ctx):
        return ctx.source("raw_orders")

    results = {r.node: r for r in p.run()}
    r = results["orders_conflict"]
    assert r.status == "error"
    assert "mutually exclusive" in (r.message or "")


def test_with_zvalue_huge_double_magnitudes_saturate_not_null(spark):
    """Doubles beyond ~2^43 used to overflow the 2^20-scaled long cast to
    NULL (non-ANSI) and park at the curve origin; they must instead
    saturate monotonically at the curve edge."""
    df = spark.createDataFrame(
        [Row(x=-1e18), Row(x=0.0), Row(x=1e17), Row(x=1e18)]
    )
    out = {r["x"]: r[ZVALUE_COL] for r in with_zvalue(df, ["x"]).collect()}
    assert all(v is not None for v in out.values())
    # monotone; values past the clamp share the edge bucket (saturation
    # is non-strict by design — outliers tie at the curve edge instead
    # of teleporting to the origin)
    assert out[-1e18] < out[0.0] <= out[1e17] <= out[1e18]


def test_with_zvalue_near_full_range_long_domain(spark):
    """(x - mn) * top wraps in long arithmetic when the domain spans
    nearly the full 2^63 range; the bucket math runs in double now."""
    lo, hi = -(1 << 62), (1 << 62) - 1
    df = spark.createDataFrame(
        [Row(x=lo), Row(x=-1000), Row(x=1000), Row(x=hi)],
        "x: long",
    )
    out = {r["x"]: r[ZVALUE_COL] for r in with_zvalue(df, ["x"]).collect()}
    assert all(v is not None and v >= 0 for v in out.values())
    assert out[lo] == 0
    assert out[lo] < out[-1000] <= out[1000] < out[hi]


def test_with_zvalue_null_fractional_preserves_bucket_spread(spark):
    """greatest/least skip NULLs, so an unguarded saturation clamp turned
    NULL into -2^62 — one NULL row then dragged the collected min to the
    clamp edge and collapsed every real value into a sliver of top
    buckets. NULL must stay NULL through the clamp (parking at the
    origin), leaving real values spanning the full bucket range."""
    df = spark.createDataFrame(
        [Row(x=1.0), Row(x=2.0), Row(x=None)], "x: double"
    )
    out = [r[ZVALUE_COL] for r in with_zvalue(df, ["x"]).orderBy("x").collect()]
    null_z, z1, z2 = out[0], out[1], out[2]
    assert null_z == 0  # NULL parks at the curve origin
    bits = min(48, 63)
    top = (1 << bits) - 1
    # real values span the whole bucket range: min -> 0, max -> top
    assert z1 == 0
    assert z2 == top
