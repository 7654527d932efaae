"""Skew-hardening probe for the window-based event operators (VERDICT r5
item 4): measures what one hot key does to ev1/ev3/ev5-shaped plans and
whether the mitigations (two-phase sessionize / bucketed as-of /
salted_join) and AQE actually engage.

Generates a zipf-ish events table where ONE user holds ~20% of all rows
(the bot/whale scenario), entirely JVM-side (spark.range + hash exprs, no
driver loop), then times:

  - sessionize: single window on user_id  vs  two-phase bucket="6 hours"
  - as-of join: single window on user_id  vs  time_bucket="1 day"
  - funnel (ev5 shape): groupBy/join based — partial aggs absorb value
    skew; joins are AQE-skew-splittable (plan evidence captured)
  - plain sort-merge join on the hot key vs operators/skew.salted_join,
    with AQE skew markers extracted from the final adaptive plans

Emits ONE JSON line. Findings land in BENCH_NOTES.md "Round-6 skew probe";
row-identity of the mitigation paths is pinned by
tests/test_sessionize_skew.py.

Usage: python skew_probe.py            (env: SKEW_N rows, default 4e6;
                                        SPARK_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from dbt_analytics_spark.operators.asof import asof_join
from dbt_analytics_spark.operators.sessionize import sessionize
from dbt_analytics_spark.operators.skew import salted_join
from dbt_analytics_spark.session import get_spark

N = int(float(os.environ.get("SKEW_N", "8000000")))
HOT_SHARE_PCT = int(os.environ.get("SKEW_HOT", "20"))
N_USERS = 50_000
RANGE_DAYS = 30
#: 256 shuffle partitions on local[32]: the average partition is ~0.4% of
#: the data, so the 20% hot key lands ~50× the average — the ratio a
#: 1000-executor cluster sees (where the average partition is ~0.1%).
#: local[32]'s default 32 partitions would understate skew 8× (hot = only
#: ~7× average) and hide the straggler.
SHUFFLE_PARTITIONS = int(os.environ.get("SKEW_PARTITIONS", "256"))


def build_events(spark):
    """~N events over RANGE_DAYS; user 0 owns HOT_SHARE_PCT% of rows."""
    us_range = RANGE_DAYS * 86_400 * 1_000_000
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.when(
                F.pmod(F.xxhash64("id", F.lit("hot")), 100) < HOT_SHARE_PCT, 0
            )
            .otherwise(F.pmod(F.xxhash64("id", F.lit("u")), N_USERS) + 1)
            .cast("bigint")
            .alias("user_id"),
            F.timestamp_micros(
                F.lit(1_709_251_200_000_000)  # 2024-03-01 UTC
                + F.pmod(F.xxhash64("id", F.lit("t")), us_range)
            ).alias("ts"),
            F.element_at(
                F.array(F.lit("view"), F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.pmod(F.xxhash64("id", F.lit("e")), 4) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit("v")), 10_000) / 100.0).alias("value"),
        )
    )
    path = os.path.join(
        os.environ.get("SKEW_DIR", "/tmp/spark_graft_skew"),
        f"events_{N}_h{HOT_SHARE_PCT}",
    )
    if not os.path.exists(path):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def final_plan(df) -> str:
    """Post-execution adaptive plan (isFinalPlan=true) as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    spark = get_spark(
        "skew-probe",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        # Local-scale AQE skew thresholds: the hot partition here is ~40 MB,
        # below the 256 MB default split threshold — at cluster scale the
        # same 20% share is far past it. Lowered so the probe exercises the
        # code path the defaults would take at real volume.
        extra_conf={
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        },
    )
    ev = build_events(spark)
    hot = ev.filter(F.col("user_id") == 0)
    out: dict = {
        "n_rows": ev.count(),
        "hot_rows": hot.count(),
    }
    out["hot_share"] = round(out["hot_rows"] / out["n_rows"], 4)

    # The scale-limiting quantity: the largest row count any ONE window
    # task must buffer+sort. Windows are never split by AQE, so for the
    # single-window plan this grows linearly with the hot key forever
    # (OOM at cluster scale); the bucketed plan bounds it by bucket width.
    bucket_us = 6 * 3600 * 1_000_000
    out["window_max_partition_rows_single"] = (
        ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    out["window_max_partition_rows_bucketed"] = (
        ev.groupBy(
            "user_id", F.floor(F.unix_micros("ts") / F.lit(bucket_us))
        )
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

    # --- sessionize: single window vs two-phase ---------------------------
    results: dict = {}

    def run_sessionize(bucket):
        s = sessionize(ev, gap="30 minutes", order_cols=["event_id"], bucket=bucket)
        results[f"sess_{bucket}"] = s.agg(F.sum("session_id")).collect()[0][0]

    out["sessionize_single_window_sec"] = timed(lambda: run_sessionize(None))
    out["sessionize_two_phase_sec"] = timed(lambda: run_sessionize("6 hours"))
    assert results["sess_None"] == results["sess_6 hours"]  # same result

    # --- as-of join: single window vs bucketed ----------------------------
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )

    def run_asof(bucket):
        j = asof_join(
            clicks, purchases, time_col="ts", by=["user_id"],
            value_cols=["purchase_value"], time_bucket=bucket,
        )
        results[f"asof_{bucket}"] = tuple(
            j.agg(
                F.count(F.lit(1)), F.round(F.sum("purchase_value"), 2)
            ).collect()[0]
        )

    out["asof_single_window_sec"] = timed(lambda: run_asof(None))
    out["asof_bucketed_sec"] = timed(lambda: run_asof("1 day"))
    assert results["asof_None"] == results["asof_1 day"]

    # --- funnel (ev5 shape): agg/join based -------------------------------
    def run_funnel():
        v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
            F.min("ts").alias("view_ts")
        )
        c = (
            ev.filter(F.col("event_type") == "click")
            .join(v, "user_id")
            .filter(F.col("ts") >= F.col("view_ts"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("click_ts"))
        )
        res = v.join(c, "user_id", "left").agg(
            F.count("view_ts"), F.count("click_ts")
        )
        res.collect()
        return res

    out["funnel_sec"] = timed(run_funnel)

    # --- LSH hot-bucket salting (dd3's pathological-corpus dial) ----------
    # Boilerplate-heavy corpus: one near-identical doc group lands every
    # member in the SAME (band, bucket) for every band, so one reducer
    # generates the whole O(hot²) pair set. n_salts spreads generation;
    # the pair SET is identical by construction.
    from dbt_analytics_spark.operators.dedup import minhash_lsh_pairs

    n_docs = int(os.environ.get("SKEW_DOCS", "30000"))
    hot_docs = int(os.environ.get("SKEW_HOT_DOCS", "2500"))
    word = lambda i: F.substring(  # noqa: E731
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"w{i}"))), 1, 8
    )
    uniq = F.concat_ws(" ", *[word(i) for i in range(12)])
    boiler = F.concat(
        F.lit(
            "terms of service agreement standard boilerplate clause "
            "applies to all users without exception "
        ),
        F.pmod(F.col("id"), 5).cast("string"),
    )
    docs_path = os.path.join(
        os.environ.get("SKEW_DIR", "/tmp/spark_graft_skew"),
        f"docs_{n_docs}_h{hot_docs}",
    )
    if not os.path.exists(docs_path):
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < hot_docs, boiler).otherwise(uniq).alias("text"),
        ).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    def run_lsh(salts):
        results[f"lsh_{salts}"] = minhash_lsh_pairs(
            docs, "doc_id", "text", n_salts=salts
        ).count()

    out["lsh_unsalted_sec"] = timed(lambda: run_lsh(None))
    out["lsh_salted16_sec"] = timed(lambda: run_lsh(16))
    assert results["lsh_None"] == results["lsh_16"]
    out["lsh_pairs"] = results["lsh_None"]

    # --- hot-key join: plain (AQE) vs salted ------------------------------
    dim = spark.range(N_USERS + 1).select(
        F.col("id").alias("user_id"),
        F.md5(F.col("id").cast("string")).alias("segment"),
    )
    dim_path = os.path.join(
        os.environ.get("SKEW_DIR", "/tmp/spark_graft_skew"), "dim"
    )
    if not os.path.exists(dim_path):
        dim.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    def run_join(salted: bool):
        d = dim.hint("merge")  # force SMJ: the skew-split-eligible path
        j = (
            salted_join(ev, d, on=["user_id"], n_salts=32)
            if salted
            else ev.join(d, "user_id")
        )
        # Aggregate over fact payload so the shuffled fact rows keep their
        # width (column pruning would otherwise shrink the hot partition
        # below any skew threshold — a fact-dim join carries fact payload).
        agg = j.agg(
            F.count(F.lit(1)), F.min("segment"), F.sum("value"), F.max("ts")
        )
        agg.collect()
        return agg

    plain = run_join(False)
    out["join_plain_smj_sec"] = timed(lambda: run_join(False))
    out["join_salted_sec"] = timed(lambda: run_join(True))
    plan = final_plan(plain)
    out["aqe_skew_split_engaged"] = "skew=true" in plan
    # Windows are never AQE-split: capture for the record.
    sess = sessionize(ev, gap="30 minutes", order_cols=["event_id"])
    sess_agg = sess.agg(F.sum("session_id"))
    sess_agg.collect()
    out["window_plan_has_skew_handling"] = "skew=true" in final_plan(sess_agg)

    print(json.dumps(out))


def longdoc_main() -> None:
    """`python skew_probe.py longdoc` — the text-family twin of the hot-user
    probe: ONE pathological multi-million-token document serializes the
    per-doc k-gram window (windows are never split), and
    gram_rows(segment_tokens=...) parallelizes it. Row-identity of the two
    plans is pinned by tests/test_dedup_crosscheck.py; this measures the
    wall-clock effect and emits one JSON line."""
    from dbt_analytics_spark.operators.dedup import gram_rows

    spark = get_spark("longdoc-probe", shuffle_partitions=32)
    n_big = int(float(os.environ.get("LONGDOC_TOKENS", "2000000")))
    normal = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") % 97).cast("string"))
                for j in range(30)
            ],
        ).alias("text"),
    )
    big_tokens = " ".join(f"t{i % 5003}" for i in range(n_big))
    big = spark.createDataFrame(
        [(10**9, big_tokens)], "doc_id long, text string"
    )
    docs = normal.union(big).localCheckpoint()
    out = {"n_docs": 50_001, "big_doc_tokens": n_big}
    counts = {}
    for label, kw in [
        ("unsegmented", {}),
        ("segmented_65536", {"segment_tokens": 65536}),
    ]:
        t = time.time()
        counts[label] = gram_rows(
            docs, "doc_id", "text", 13, distinct=False, **kw
        ).count()
        out[f"{label}_sec"] = round(time.time() - t, 2)
        out[f"{label}_grams"] = counts[label]
    # The probe is only meaningful if the plans are equivalent.
    assert counts["unsegmented"] == counts["segmented_65536"], counts
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "longdoc":
        longdoc_main()
    else:
        main()
