"""compact_table: small-file rewrite with atomic swap — data-identical,
partition-layout-preserving, no-op when already compact."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_analytics_spark.plans import compact_table, table_file_stats


def _sum_count(spark, table):
    r = spark.table(table).agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
    ).collect()[0]
    return r["n"], r["s"]


def test_compacts_fragmented_table(spark):
    spark.range(20_000).repartition(40).write.mode("overwrite").saveAsTable(
        "frag_plain"
    )
    before_files, before_bytes = table_file_stats(spark, "frag_plain")
    assert before_files == 40
    want = _sum_count(spark, "frag_plain")

    report = compact_table(
        spark, "frag_plain", target_file_bytes=max(before_bytes // 2, 1)
    )
    assert report["compacted"] is True
    assert report["files_before"] == 40
    assert report["files_after"] < 10
    assert _sum_count(spark, "frag_plain") == want


def test_noop_when_already_compact(spark):
    spark.range(1000).coalesce(2).write.mode("overwrite").saveAsTable(
        "compact_already"
    )
    report = compact_table(spark, "compact_already")
    assert report["compacted"] is False
    assert report["files_before"] == 2
    assert "files_after" not in report


def test_partitioned_table_keeps_layout(spark):
    df = spark.range(9_000).withColumn("p", (F.col("id") % 3).cast("int"))
    df.repartition(12).write.mode("overwrite").partitionBy("p").saveAsTable(
        "frag_part"
    )
    before_files, before_bytes = table_file_stats(spark, "frag_part")
    assert before_files >= 30  # ~12 files per partition dir
    want = _sum_count(spark, "frag_part")

    report = compact_table(
        spark, "frag_part", target_file_bytes=max(before_bytes // 3, 1)
    )
    assert report["compacted"] is True
    assert report["files_after"] < before_files / 2
    assert _sum_count(spark, "frag_part") == want
    # Partition layout survives: the column is still a partition column and
    # partition pruning still applies.
    part_cols = [
        c.name for c in spark.catalog.listColumns("frag_part") if c.isPartition
    ]
    assert part_cols == ["p"]
    assert spark.table("frag_part").filter(F.col("p") == 1).count() == 3_000


def test_sort_by_clusters_files(spark):
    spark.range(30_000).withColumn(
        "k", F.pmod(F.xxhash64("id"), 1000).cast("int")
    ).repartition(25).write.mode("overwrite").saveAsTable("frag_sorted")
    _, before_bytes = table_file_stats(spark, "frag_sorted")
    want = _sum_count(spark, "frag_sorted")

    report = compact_table(
        spark,
        "frag_sorted",
        target_file_bytes=max(before_bytes // 4, 1),
        sort_by=["k"],
    )
    assert report["compacted"] is True
    assert _sum_count(spark, "frag_sorted") == want
    # Range clustering: each output file covers a narrow, non-overlapping
    # k-slice (parquet footer min/max then prunes scans on k predicates).
    rows = (
        spark.table("frag_sorted")
        .select("k", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in rows)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert lo_next >= hi_prev  # boundaries may touch, never interleave


def test_project_compact_after_incremental_appends(spark):
    """The intended workflow: append-strategy incremental accretes files
    run over run; Project.compact() rewrites them without changing data."""
    from dbt_analytics_spark.plans import Project

    p = Project(spark, name="cmp")
    state = {"lo": 0}

    @p.model(
        materialized="incremental", incremental_strategy="append", name="acc_t"
    )
    def acc_t(ctx):
        return (
            ctx.spark.range(state["lo"], state["lo"] + 2000)
            .repartition(6)
            .selectExpr("id", "id * 2 AS v")
        )

    for run in range(4):
        state["lo"] = run * 2000
        p.run(select="acc_t")

    before = _sum_count(spark, "acc_t")
    assert before[0] == 8000
    report = p.compact("acc_t", target_file_bytes=1 << 30)
    assert report["compacted"] is True
    assert report["files_after"] < report["files_before"]
    assert _sum_count(spark, "acc_t") == before

    import pytest

    with pytest.raises(ValueError, match="does not exist"):
        p.compact("never_built")
