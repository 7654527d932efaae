"""Workload parity tests: run the 27-model DAG on FIXTURES.md-shaped data
and check the semantics SURVEY.md §5 calls out as traps — union dedup,
lateral top-1 tie-breaks (validated against a real LATERAL LIMIT 1 in
DuckDB), injectable clock spines, count-distinct aggregates."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.workload import build_project
from dbt_analytics_spark.workload import fixtures
from dbt_analytics_spark.workload.models import normalize_description, clean_type_expr

RUN_DATE = dt.date(2025, 8, 31)


@pytest.fixture(scope="module")
def sources(spark):
    return fixtures.all_sources(spark)


@pytest.fixture(scope="module")
def built(spark, sources):
    p = build_project(spark, sources, run_date=RUN_DATE)
    results = p.run()
    return p, {r.node: r for r in results}


def test_all_models_succeed(built):
    p, results = built
    failed = [(n, r.message) for n, r in results.items() if r.status != "success"]
    assert not failed, failed
    # 27 models + 4 seeds materialized
    assert len(results) == 31


def test_union_dedup_collapses_duplicates(built, spark, sources):
    # fixtures include txn_dup_a/txn_dup_b: identical in all output columns.
    classified = spark.table("classified_card_transactions")
    dup = classified.filter(F.col("description") == "DUPLICATED ROW")
    assert dup.count() == 1  # `union` (DISTINCT) collapsed the pair


def test_branches(built, spark):
    c = spark.table("classified_card_transactions")
    venmo = c.filter(F.col("merchant_key") == "venmo")
    assert venmo.count() > 0
    # venmo prefix stripped: right(description, length-6)
    assert venmo.filter(F.col("description").startswith("venmo")).count() == 0
    bank = c.filter(F.col("merchant_key") == "bank_transfer")
    assert bank.count() > 0
    cats = {r["category"] for r in bank.select("category").distinct().collect()}
    assert cats <= {"Travel", "Housing"}
    # card branch: no Payment rows leak through
    assert c.filter(F.col("description").ilike("%Fedwire%")).count() == 0


def test_spend_rollup_consistency(built, spark):
    c = spark.table("classified_card_transactions")
    monthly = spark.table("spend_monthly")
    total_c = c.agg(F.sum("amount")).collect()[0][0]
    total_m = monthly.agg(F.sum("total_spend")).collect()[0][0]
    assert total_c == total_m


def test_metrics_monthly_spine(built, spark):
    m = spark.table("metrics_monthly")
    rows = m.select("month_start", "month_end", "month").collect()
    months = sorted(r["month_start"] for r in rows)
    assert months[0] == dt.date(2022, 1, 1)
    assert months[-1] == dt.date(2025, 8, 1)  # <= run_date bound
    assert len(months) == 44  # 2022-01 .. 2025-08, dense
    by_start = {r["month_start"]: r for r in rows}
    assert by_start[dt.date(2024, 2, 1)]["month_end"] == dt.date(2024, 2, 29)  # leap
    assert by_start[dt.date(2024, 2, 1)]["month"] == 2


def test_metrics_weekly_spine_is_monday(built, spark):
    w = spark.table("metrics_weekly")
    starts = [r["week_start"] for r in w.select("week_start").collect()]
    assert all(s.isoweekday() == 1 for s in starts)
    assert min(starts) == dt.date(2022, 1, 3)


def test_workouts_count_distinct_dates(built, spark, sources):
    got = {
        (r["exercise"], r["date_period"]): r["total_count"]
        for r in spark.table("workouts_monthly").collect()
    }
    flat = spark.table("exercise_log_flattened")
    expected = (
        flat.groupBy("Exercise", F.date_trunc("month", F.col("Date")).cast("date").alias("p"))
        .agg(F.countDistinct("Date").alias("n"))
        .collect()
    )
    for r in expected:
        assert got[(r["Exercise"], r["p"])] == r["n"]


def test_regex_top1_matches_duckdb_lateral(spark, sources, built):
    """The J3 rewrite (broadcast join + window) must agree with a REAL
    `LEFT JOIN LATERAL ... ORDER BY ... LIMIT 1` executed by DuckDB on the
    same inputs (reference semantics:
    classified_card_transactions.sql:126-147)."""
    p, _ = built
    ct = sources["card_transactions"]
    base = ct.filter(
        clean_type_expr(include_online_payment=True, include_thank_you=True) == "Sale"
    )
    norm = normalize_description(base).select(
        "key", "desc_keep", "desc_nohyphen", "desc_noagg",
        "desc_noagg_nohyphen", "desc_tail", "desc_alias",
    )
    norm_pdf = norm.toPandas()
    regex_pdf = p.compile_node("merchant_regex").toPandas()
    # DuckDB's RE2 lacks PG's \y too — match on the translated pattern but
    # rank by the ORIGINAL pattern length (reference orders by
    # length(pattern_regex)), same as the Spark model.
    from dbt_analytics_spark.functions.pg import pg_regex_to_java

    regex_pdf["pattern_java"] = regex_pdf["pattern_regex"].map(pg_regex_to_java)
    # RE2 (DuckDB) has no lookahead; PG and Java both do. Exclude the 5
    # lookahead patterns from BOTH engines — the comparison validates the
    # lateral→window rewrite, which is regex-set-agnostic.
    lookahead = regex_pdf["pattern_regex"].str.contains(r"\(\?\!", regex=True)
    regex_pdf = regex_pdf[~lookahead].reset_index(drop=True)

    con = duckdb.connect()
    con.register("norm", norm_pdf)
    con.register("merchant_regex", regex_pdf)
    oracle = con.execute(
        """
        SELECT n.key, mr.merchant_key AS rx_merchant_key
        FROM norm n
        LEFT JOIN LATERAL (
          SELECT r.merchant_key,
                 (COALESCE(r.priority, 0)
                  + CASE WHEN r.merchant_key IN ('restaurants_misc','unknown','misc')
                         THEN -100000 ELSE 0 END) AS prio,
                 r.pattern_regex, r.regex_key
          FROM merchant_regex r
          WHERE regexp_matches(n.desc_keep, r.pattern_java, 'i')
             OR regexp_matches(n.desc_nohyphen, r.pattern_java, 'i')
             OR regexp_matches(n.desc_noagg, r.pattern_java, 'i')
             OR regexp_matches(n.desc_noagg_nohyphen, r.pattern_java, 'i')
             OR regexp_matches(n.desc_tail, r.pattern_java, 'i')
             OR (n.desc_alias IS NOT NULL AND regexp_matches(n.desc_alias, r.pattern_java, 'i'))
          ORDER BY prio DESC, LENGTH(r.pattern_regex) DESC, r.regex_key DESC
          LIMIT 1
        ) mr ON TRUE
        """
    ).fetchdf()
    want = {r.key: r.rx_merchant_key for r in oracle.itertuples()}

    classified = spark.table("classified_card_transactions")
    # Rebuild the rx assignment through the model's own path: join key→merchant
    # is not exposed in the final table, so recompute via the operator.
    from dbt_analytics_spark.operators.top1 import top1_per_group

    from dbt_analytics_spark.functions.pg import pg_regex_to_java_col

    regex = p.compile_node("merchant_regex").filter(
        ~F.col("pattern_regex").contains("(?!")
    ).select(
        "regex_key",
        F.col("merchant_key").alias("rx_merchant_key"),
        F.col("pattern_regex").alias("rx_pattern"),
        pg_regex_to_java_col("pattern_regex").alias("rx_pattern_java"),
        (
            F.coalesce(F.col("priority"), F.lit(0))
            + F.when(F.col("merchant_key").isin("restaurants_misc", "unknown", "misc"), F.lit(-100000)).otherwise(F.lit(0))
        ).alias("rx_priority"),
    )
    pat = F.concat(F.lit("(?i)"), F.col("rx_pattern_java"))
    cond = (
        F.rlike(F.col("desc_keep"), pat)
        | F.rlike(F.col("desc_nohyphen"), pat)
        | F.rlike(F.col("desc_noagg"), pat)
        | F.rlike(F.col("desc_noagg_nohyphen"), pat)
        | F.rlike(F.col("desc_tail"), pat)
        | (F.col("desc_alias").isNotNull() & F.rlike(F.col("desc_alias"), pat))
    )
    cands = normalize_description(base).join(F.broadcast(regex), on=cond, how="inner")
    best = top1_per_group(
        cands, ["key"], [F.desc("rx_priority"), F.desc(F.length("rx_pattern")), F.desc("regex_key")]
    ).select("key", "rx_merchant_key")
    got_rows = normalize_description(base).select("key").join(best, "key", "left").collect()
    got = {r["key"]: r["rx_merchant_key"] for r in got_rows}

    assert set(got) == set(want)
    mismatches = {k: (got[k], want[k]) for k in got if got[k] != want[k] and not (got[k] is None and want[k] != want[k])}
    # NaN from pandas → normalize
    import pandas as pd

    mismatches = {
        k: v
        for k, v in mismatches.items()
        if not (v[0] is None and (v[1] is None or pd.isna(v[1])))
    }
    assert not mismatches, dict(list(mismatches.items())[:10])


def test_map_one_deterministic(built, spark):
    """merchant_account_map has duplicate merchant_keys; map_one must pick
    exactly one account per key (reference tie-break
    classified_card_transactions.sql:211-217)."""
    p, _ = built
    from dbt_analytics_spark.operators.top1 import top1_per_group

    mam = p.compile_node("merchant_account_map")
    picked = top1_per_group(
        mam,
        ["merchant_key"],
        [
            F.desc(F.coalesce(F.col("is_default"), F.lit("TRUE"))),
            F.desc_nulls_last("effective_from"),
            F.desc("account_id"),
        ],
    )
    assert picked.groupBy("merchant_key").count().filter(F.col("count") > 1).count() == 0
    assert picked.count() == mam.select("merchant_key").distinct().count()


def test_lateral_top1_empty_dim_left_outer(spark):
    """An empty pattern dim honors the left-outer contract in BOTH
    matchers: every left row survives with NULL payloads typed from the
    dim schema (ADVICE r7: the CASE variant raised AttributeError;
    ADVICE r8: the UDF variant emitted void/NullType payload columns,
    diverging from the CASE matcher and breaking downstream unionByName/
    parquet writes against typed columns)."""
    from dbt_analytics_spark.operators.top1 import (
        lateral_top1_case,
        lateral_top1_udf,
    )

    left = spark.createDataFrame([(1, "abc"), (2, "def")], ["id", "descr"])
    dim = spark.createDataFrame(
        [], "pattern string, label string, priority int"
    )
    for matcher in (lateral_top1_case, lateral_top1_udf):
        out = matcher(
            left,
            dim,
            text_cols=["descr"],
            order_by=[F.col("priority")],
            pattern_col="pattern",
            payload_cols=["label", "priority"],
        )
        rows = {r["id"]: r for r in out.collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["label"] is None and rows[1]["priority"] is None
        # typed, not void — the two matchers must agree schema-for-schema
        assert dict(out.dtypes)["priority"] == "int", matcher.__name__
        assert dict(out.dtypes)["label"] == "string", matcher.__name__


def test_lateral_top1_udf_rejects_java_only_pattern(spark):
    """The Arrow matcher runs Python re — Java-only constructs in the
    user-editable pattern seed must fail fast on the DRIVER with the
    offending pattern named, not as an opaque executor traceback
    (ADVICE r7)."""
    from dbt_analytics_spark.operators.top1 import lateral_top1_udf

    left = spark.createDataFrame([(1, "ABC")], ["id", "descr"])
    dim = spark.createDataFrame(
        [(r"\p{Lu}+", "upper", 1)], ["pattern", "label", "priority"]
    )
    with pytest.raises(ValueError, match=r"\\p\{Lu\}"):
        lateral_top1_udf(
            left,
            dim,
            text_cols=["descr"],
            order_by=[F.col("priority")],
            pattern_col="pattern",
            payload_cols=["label"],
        )
