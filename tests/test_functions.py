"""PG-compatibility semantics: the traps SURVEY.md §5 lists — ISO week
boundaries, regex dialect audit, nulls-last ordering."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.functions.pg import (
    date_trunc_pg,
    extract_pg,
    month_end,
    pg_regex_to_java,
)


def test_week_truncation_matches_postgres_iso(spark):
    """PG date_trunc('week') is ISO Monday-start; check year boundaries
    (reference D1: models/metrics_weekly.sql)."""
    dates = [
        dt.date(2024, 1, 1),   # Monday
        dt.date(2023, 1, 1),   # Sunday → week of 2022-12-26
        dt.date(2022, 1, 1),   # Saturday → week of 2021-12-27
        dt.date(2024, 12, 31),
        dt.date(2025, 6, 15),
    ]
    df = spark.createDataFrame([(d,) for d in dates], ["d"])
    got = {
        r["d"]: (r["wk"], r["iso"])
        for r in df.select(
            "d",
            date_trunc_pg("week", "d").alias("wk"),
            extract_pg("week", "d").alias("iso"),
        ).collect()
    }
    con = duckdb.connect()
    for d in dates:
        wk, iso = con.execute(
            f"SELECT CAST(date_trunc('week', DATE '{d}') AS DATE), CAST(EXTRACT(week FROM DATE '{d}') AS INT)"
        ).fetchone()
        assert got[d] == (wk, iso), d
        assert got[d][0].isoweekday() == 1


def test_month_end(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 2, 1),), (dt.date(2023, 2, 1),), (dt.date(2024, 12, 1),)], ["d"]
    )
    got = [r["e"] for r in df.select(month_end("d").alias("e")).collect()]
    assert got == [dt.date(2024, 2, 29), dt.date(2023, 2, 28), dt.date(2024, 12, 31)]


def test_pg_regex_translation():
    assert pg_regex_to_java(r"^NATERA\y") == r"^NATERA\b"
    assert pg_regex_to_java(r"\yWHOLEFDS\y") == r"\bWHOLEFDS\b"
    assert pg_regex_to_java(r"^MAF\s+\d{4}\y") == r"^MAF\s+\d{4}\b"
    assert pg_regex_to_java(r"A\\yB") == r"A\\yB"[:2] + r"\yB"  # escaped backslash untouched


def test_all_seed_patterns_compile_in_java(spark):
    """Every merchant_regex pattern must compile and behave under rlike
    after translation (the T2 dialect audit SURVEY.md asks for)."""
    import csv
    import os

    from dbt_analytics_spark.workload.models import SEEDS_DIR

    with open(os.path.join(SEEDS_DIR, "merchant_regex.csv")) as f:
        patterns = [pg_regex_to_java(r["pattern_regex"]) for r in csv.DictReader(f)]
    df = spark.createDataFrame([(p,) for p in patterns], ["p"])
    # rlike with each pattern against a probe string: throws on bad syntax.
    n = df.select(
        F.rlike(F.lit("PROBE STRING 123"), F.concat(F.lit("(?i)"), F.col("p"))).alias("m")
    ).filter(F.col("m").isNotNull()).count()
    assert n == len(patterns)


def test_nulls_last_ordering(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    got = [r["v"] for r in df.orderBy(F.desc_nulls_last("v")).collect()]
    assert got == [3, 1, None]


def test_ilike_matches_pg_semantics(spark):
    df = spark.createDataFrame([("Whole Foods Market",), ("WHOLEFDS 123",)], ["s"])
    assert df.filter(F.col("s").ilike("%whole%")).count() == 2
    assert df.filter(F.col("s").ilike("whole!_%")).count() == 0  # no escape char by default


def test_approx_distinct_accuracy(spark):
    from dbt_analytics_spark.queries.llm import f2_approx_distinct
    from .conftest import SF_DIR

    for r in f2_approx_distinct(spark, SF_DIR).collect():
        exact = r["exact_users"]
        assert exact > 0
        assert abs(r["approx_users"] - exact) / exact < 0.1, r


def test_approx_distinct_accuracy_driver_scale(spark):
    # f2's HLL sketch is engine-specific, so it can never hash-match a
    # DuckDB oracle; its correctness claim is an ERROR BOUND. Assert it at
    # driver scale (sf0.01): |approx - exact| / exact <= 3*rsd per group
    # (rsd=0.02 in the query; 3 sigma of the HLL++ relative error).
    from dbt_analytics_spark.queries.llm import f2_approx_distinct

    rows = f2_approx_distinct(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) >= 3
    for r in rows:
        exact = r["exact_users"]
        assert exact > 0
        rel_err = abs(r["approx_users"] - exact) / exact
        assert rel_err <= 3 * 0.02, (r, rel_err)


def test_ts_us_accepts_both_timestamp_types(spark, tmp_path):
    """ts_us must yield identical epoch-micros whether the parquet column
    reads back as TIMESTAMP (isAdjustedToUTC=true) or TIMESTAMP_NTZ
    (isAdjustedToUTC=false) — the 2026-08 testdata regeneration switched
    formats and broke raw unix_micros (VERDICT r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dbt_analytics_spark.functions.pg import ts_us

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    utc_path = str(tmp_path / "utc.parquet")
    ntz_path = str(tmp_path / "ntz.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(micros, pa.timestamp("us", tz="UTC"))}), utc_path
    )
    pq.write_table(
        pa.table({"ts": pa.array(micros, pa.timestamp("us"))}), ntz_path
    )

    utc_df = spark.read.parquet(utc_path)
    ntz_df = spark.read.parquet(ntz_path)
    assert utc_df.schema["ts"].dataType.typeName() == "timestamp"
    assert ntz_df.schema["ts"].dataType.typeName() == "timestamp_ntz"

    got_utc = [r[0] for r in utc_df.select(ts_us("ts")).collect()]
    got_ntz = [r[0] for r in ntz_df.select(ts_us("ts")).collect()]
    assert sorted(got_utc) == sorted(micros)
    assert sorted(got_ntz) == sorted(micros)

    # DATE input also resolves (midnight UTC).
    date_df = spark.sql("SELECT DATE'2024-01-01' AS d")
    (got_date,) = [r[0] for r in date_df.select(ts_us("d")).collect()]
    assert got_date == 1_704_067_200_000_000


def test_approx_percentiles_accuracy(spark):
    # f3's GK sketch is engine-specific (no oracle hash); its correctness
    # claim is the epsilon bound. With accuracy=10000 the rank error is
    # <= n/10000, tiny at test scale — assert approx within 2% of exact in
    # value terms per group and quantile.
    from dbt_analytics_spark.queries.llm import f3_approx_percentiles
    from .conftest import SF_DIR

    rows = f3_approx_percentiles(spark, SF_DIR).collect()
    assert len(rows) >= 3
    for r in rows:
        for q in (50, 90, 99):
            exact = r[f"exact_p{q}"]
            assert exact > 0
            assert abs(r[f"approx_p{q}"] - exact) / exact < 0.02, (r, q)


def test_cms_overestimate_invariant(spark):
    # Count-Min's one-sided guarantee: est >= true ALWAYS; and with
    # depth=4 x 4096 buckets over this vocabulary, absent terms estimate
    # small (bounded by collision mass, not by the corpus).
    from pyspark.sql import functions as F

    from dbt_analytics_spark.operators.text import (
        cms_estimate,
        cms_sketch,
        tokens,
    )
    from dbt_analytics_spark.sources import load_testdata

    docs = load_testdata(spark, "/root/testdata/sf0.001")["documents"]
    truth = {
        r["term"]: r["cnt"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    terms = sorted(truth, key=truth.get, reverse=True)[:10] + ["zz_absent"]
    sk = cms_sketch(docs)
    est = {r["term"]: r["est_count"] for r in cms_estimate(sk, terms).collect()}
    n_tokens = sum(truth.values())
    for t in terms:
        true = truth.get(t, 0)
        assert est[t] >= true, (t, est[t], true)
        # eps = e/width with width=4096 -> est - true <= ~2.7e-4 * N
        # per the CMS bound at delta = e^-4; allow 10x slack.
        assert est[t] - true <= max(10, 10 * 2.7e-4 * n_tokens), (t, est[t], true)
