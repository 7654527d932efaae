"""Structured Streaming layer tests: microbatch incremental materialization
(checkpointed, no reprocessing), watermarked window aggregation, and the
stateful sessionizer vs its batch oracle (ev1_sessionize)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.sources import load_testdata
from dbt_analytics_spark.streaming import (
    microbatch_append,
    sessionized_counts_stateful,
    watermarked_window_agg,
)

from .conftest import SF_DIR


@pytest.fixture()
def events(spark):
    return load_testdata(spark, SF_DIR)["events"]


def test_microbatch_append_incremental(spark, events, tmp_path):
    """Second run after new files land processes ONLY the new files."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = events.filter(F.col("user_id") % 2 == 0)
    batch2 = events.filter(F.col("user_id") % 2 == 1)
    batch1.write.mode("append").parquet(src)

    def transform(df):
        return df.select("event_id", "user_id", "event_type")

    microbatch_append(spark, src, out, ckpt, transform)
    n1 = spark.read.parquet(out).count()
    assert n1 == batch1.count()

    batch2.write.mode("append").parquet(src)
    microbatch_append(spark, src, out, ckpt, transform)
    got = spark.read.parquet(out)
    assert got.count() == events.count()  # batch1 NOT reprocessed
    assert got.select("event_id").distinct().count() == events.count()


def test_watermarked_window_agg_batch_parity(spark, events):
    """The windowed plan runs identically on a batch frame; totals must
    match a plain groupBy."""
    agg = watermarked_window_agg(
        events, ts_col="ts", key_col="event_type", window_duration="1 day"
    )
    assert set(agg.columns) == {"window_start", "window_end", "event_type", "n_events"}
    total = agg.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # Each (window, key) bucket must equal the direct date_trunc rollup.
    direct = (
        events.groupBy(
            F.date_trunc("day", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_direct"))
    )
    joined = agg.join(direct, ["window_start", "event_type"], "full")
    bad = joined.filter(
        F.col("n_events").isNull()
        | F.col("n_direct").isNull()
        | (F.col("n_events") != F.col("n_direct"))
    )
    assert bad.count() == 0


def test_watermarked_window_agg_streaming(spark, events, tmp_path):
    """Same plan as a real stream: availableNow file source → memory sink."""
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = watermarked_window_agg(
        stream, ts_col="ts", key_col="event_type", window_duration="1 day"
    )
    q = (
        agg.writeStream.queryName("win_test")
        .format("memory")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select sum(n_events) from win_test").collect()[0][0]
    assert got == events.count()


def test_stateful_sessionizer_matches_batch_oracle(spark, events, tmp_path):
    """applyInPandasWithState sessionizer over a stream must agree with the
    lag-window batch formulation (ev1_sessionize) on sessions per user."""
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    sessions = sessionized_counts_stateful(stream)
    q = (
        sessions.writeStream.queryName("sess_test")
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        """
        select user_id,
               count(distinct session_id) as n_sessions,
               sum(n_events) as n_events
        from (select user_id, session_id, max(n_events) as n_events
              from sess_test group by 1, 2)
        group by 1
        """
    )

    from dbt_analytics_spark.queries.core import ev1_sessionize

    oracle = ev1_sessionize(spark, SF_DIR)
    joined = got.join(
        oracle.withColumnRenamed("n_sessions", "o_sessions").withColumnRenamed(
            "n_events", "o_events"
        ),
        "user_id",
        "full",
    )
    bad = joined.filter(
        (F.col("n_sessions") != F.col("o_sessions"))
        | (F.col("n_events") != F.col("o_events"))
        | F.col("n_sessions").isNull()
        | F.col("o_sessions").isNull()
    )
    assert bad.count() == 0


def test_stream_stream_interval_join(spark, events, tmp_path):
    """Streaming join (availableNow) produces the same pairs as the
    identical plan run in batch mode."""
    from dbt_analytics_spark.streaming import stream_stream_interval_join
    from dbt_analytics_spark.streaming.incremental import stream_from_parquet_dir

    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("r_ts")
    )
    expected = stream_stream_interval_join(clicks, purchases).count()
    assert expected > 0

    lsrc, rsrc, out, ckpt = (str(tmp_path / d) for d in ("l", "r", "out", "ckpt"))
    clicks.write.parquet(lsrc)
    purchases.write.parquet(rsrc)
    joined = stream_stream_interval_join(
        stream_from_parquet_dir(spark, lsrc), stream_from_parquet_dir(spark, rsrc)
    )
    (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = spark.read.parquet(out).count()
    assert got == expected
