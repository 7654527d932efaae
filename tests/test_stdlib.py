"""E15 cross-db macro stdlib semantics (SURVEY.md §2b): each helper mirrors
the default__/Postgres macro in dbt's macros/utils/*.sql. DuckDB (Postgres
dialect) is the oracle for the date macros' boundary behavior."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from dbt_analytics_spark.functions import stdlib as S


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_dateadd(spark):
    df = spark.createDataFrame([Row(d=dt.date(2023, 1, 31))])
    r = _one(
        df.select(
            S.dateadd("month", 1, "d").alias("m"),
            S.dateadd("year", -1, "d").alias("y"),
            S.dateadd("week", 2, "d").alias("w"),
            S.dateadd("day", 1, "d").alias("dd"),
        )
    )
    assert r["m"] == dt.date(2023, 2, 28)  # month-end clamp, PG behavior
    assert r["y"] == dt.date(2022, 1, 31)
    assert r["w"] == dt.date(2023, 2, 14)
    assert r["dd"] == dt.date(2023, 2, 1)


def test_datediff_boundary_crossing(spark, ddb):
    # Dec 31 -> Jan 1: 1 day elapsed but crosses every boundary.
    a, b = dt.date(2022, 12, 31), dt.date(2023, 1, 1)
    df = spark.createDataFrame([Row(a=a, b=b)])
    r = _one(
        df.select(
            *[S.datediff("a", "b", p).alias(p) for p in ("year", "quarter", "month", "week", "day")]
        )
    )
    for part in ("year", "quarter", "month", "week", "day"):
        expected = ddb.execute(
            f"SELECT datediff('{part}', DATE '2022-12-31', DATE '2023-01-01')"
        ).fetchone()[0]
        assert r[part] == expected, part


def test_last_day(spark):
    df = spark.createDataFrame([Row(d=dt.date(2023, 2, 11))])
    r = _one(
        df.select(
            S.last_day("d", "month").alias("m"),
            S.last_day("d", "quarter").alias("q"),
            S.last_day("d", "year").alias("y"),
        )
    )
    assert r["m"] == dt.date(2023, 2, 28)
    assert r["q"] == dt.date(2023, 3, 31)
    assert r["y"] == dt.date(2023, 12, 31)


def test_date_spine_half_open(spark):
    days = [r["date_day"] for r in S.date_spine(spark, "day", "2023-01-30", "2023-02-02").collect()]
    assert days == [dt.date(2023, 1, 30), dt.date(2023, 1, 31), dt.date(2023, 2, 1)]
    months = [r["date_day"] for r in S.date_spine(spark, "month", "2023-01-01", "2023-04-01").collect()]
    assert months == [dt.date(2023, 1, 1), dt.date(2023, 2, 1), dt.date(2023, 3, 1)]


def test_generate_series(spark):
    assert [r["generated_number"] for r in S.generate_series(spark, 4).collect()] == [1, 2, 3, 4]


def test_string_macros(spark):
    df = spark.createDataFrame([Row(s="a_b_c", t="O'Hara")])
    r = _one(
        df.select(
            S.split_part("s", "_", 2).alias("p2"),
            S.split_part("s", "_", 9).alias("p9"),
            S.position("b", F.col("s")).alias("pos"),
            S.replace("s", "_", "-").alias("rep"),
            S.right("s", 3).alias("r3"),
            S.length("s").alias("len"),
            S.concat("s", F.lit("!")).alias("cat"),
            S.hash("s").alias("h"),
            S.safe_cast("s", "int").alias("bad_cast"),
        )
    )
    assert r["p2"] == "b"
    assert r["p9"] == ""  # PG: out-of-range part -> empty string
    assert r["pos"] == 3
    assert r["rep"] == "a-b-c"
    assert r["r3"] == "b_c"
    assert r["len"] == 5
    assert r["cat"] == "a_b_c!"
    assert r["h"] == "8d28cddc274233853a82eae1c6c7f0b3"  # md5('a_b_c')
    assert r["bad_cast"] is None
    assert S.escape_single_quotes("O'Hara") == "O''Hara"
    assert S.string_literal("O'Hara") == "'O''Hara'"


def test_bool_and_equals(spark):
    df = spark.createDataFrame(
        [Row(g=1, b=True, x=None), Row(g=1, b=False, x="v"), Row(g=2, b=False, x=None)]
    )
    agg = {r["g"]: r for r in df.groupBy("g").agg(S.bool_or("b").alias("any_b")).collect()}
    assert agg[1]["any_b"] is True and agg[2]["any_b"] is False
    r = _one(
        spark.createDataFrame([(None, None)], "a string, b string").select(
            S.equals("a", "b").alias("null_eq"),
            S.cast_bool_to_text(F.lit(True)).alias("txt"),
        )
    )
    assert r["null_eq"] is True
    assert r["txt"] == "true"


def test_listagg_ordered(spark):
    df = spark.createDataFrame(
        [Row(g=1, v="b", k=2), Row(g=1, v="a", k=1), Row(g=1, v="c", k=3)]
    )
    r = _one(df.groupBy("g").agg(S.listagg("v", "|", order_by="k").alias("s")))
    assert r["s"] == "a|b|c"
    r = _one(df.groupBy("g").agg(S.listagg("v", ",", order_by="k", descending=True).alias("s")))
    assert r["s"] == "c,b,a"


def test_set_ops(spark):
    a = spark.createDataFrame([Row(x=1), Row(x=1), Row(x=2), Row(x=3)])
    b = spark.createDataFrame([Row(x=2)])
    assert sorted(r["x"] for r in S.except_distinct(a, b).collect()) == [1, 3]
    assert [r["x"] for r in S.intersect_distinct(a, b).collect()] == [2]


def test_array_macros(spark):
    df = spark.createDataFrame([Row(a=[1, 2], b=[3])])
    r = _one(
        df.select(
            S.array_concat("a", "b").alias("cc"),
            S.array_append("a", F.lit(9)).alias("ap"),
            S.array_construct(F.lit(7), F.lit(8)).alias("ctor"),
        )
    )
    assert r["cc"] == [1, 2, 3]
    assert r["ap"] == [1, 2, 9]
    assert r["ctor"] == [7, 8]
