"""Cross-database macro stdlib: dbt's ``macros/utils/*`` surface (SURVEY.md
§2b E15) re-expressed as native Spark helpers.

Reference: the 29 files under
``dbt-env/Lib/site-packages/dbt/include/global_project/macros/utils/``
(e.g. ``date_spine.sql:1-31``, ``dateadd.sql``, ``datediff.sql``,
``split_part.sql``, ``listagg.sql``, ``hash.sql``, ``safe_cast.sql``,
``any_value.sql``, ``bool_or.sql``, ``escape_single_quotes.sql``,
``cast_bool_to_text.sql``, ``equals.sql``). Each helper mirrors the
``default__``/Postgres macro's semantics; nearly all compile to a single
built-in JVM expression, so everything here stays inside whole-stage
codegen — no UDFs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Date/time macros
# ---------------------------------------------------------------------------

def dateadd(datepart: str, interval: int, from_col: Column | str) -> Column:
    """``dateadd.sql``: ``from + interval 'N <part>'``."""
    c = _c(from_col)
    part = datepart.lower()
    if part == "year":
        return F.add_months(c, 12 * interval)
    if part == "quarter":
        return F.add_months(c, 3 * interval)
    if part == "month":
        return F.add_months(c, interval)
    if part == "week":
        return F.date_add(c, 7 * interval)
    if part == "day":
        return F.date_add(c, interval)
    if part in ("hour", "minute", "second"):
        return c + F.expr(f"interval {int(interval)} {part}")
    raise ValueError(f"dateadd: unsupported datepart {datepart!r}")


def datediff(first: Column | str, second: Column | str, datepart: str) -> Column:
    """``datediff.sql`` (Postgres flavor): boundary-crossing counts, not
    elapsed-time rounding — e.g. Dec 31 → Jan 1 is 1 year."""
    a, b = _c(first), _c(second)
    part = datepart.lower()
    if part == "year":
        return (F.year(b) - F.year(a)).cast("long")
    if part == "quarter":
        return ((F.year(b) - F.year(a)) * 4 + (F.quarter(b) - F.quarter(a))).cast("long")
    if part == "month":
        return ((F.year(b) - F.year(a)) * 12 + (F.month(b) - F.month(a))).cast("long")
    if part == "week":
        # PG: (date_trunc('week', b)::date - date_trunc('week', a)::date) / 7
        return (
            F.datediff(F.date_trunc("week", b), F.date_trunc("week", a)) / 7
        ).cast("long")
    if part == "day":
        return F.datediff(b, a).cast("long")
    raise ValueError(f"datediff: unsupported datepart {datepart!r}")


def date_trunc(datepart: str, col: Column | str) -> Column:
    """``date_trunc.sql``: passthrough (PG grain names match Spark's)."""
    return F.date_trunc(datepart, _c(col))


def last_day(col: Column | str, datepart: str = "month") -> Column:
    """``last_day.sql``: last date of the period containing ``col``."""
    c = _c(col)
    part = datepart.lower()
    if part == "month":
        return F.last_day(c)
    if part in ("quarter", "year"):
        next_start = dateadd(part, 1, F.date_trunc(part, c).cast("date"))
        return F.date_add(next_start, -1)
    raise ValueError(f"last_day: unsupported datepart {datepart!r}")


def date_spine(
    spark: SparkSession,
    datepart: str,
    start_date: dt.date | str,
    end_date: dt.date | str,
    col_name: str = "date_day",
) -> DataFrame:
    """``date_spine.sql:1-31``: dense calendar of period starts in
    ``[start_date, end_date)``.

    The reference macro cross-joins powers-of-2 ``generate_series`` rows to
    fabricate the row count; Spark fabricates it directly with
    ``sequence() + explode`` — one expression, no join, and at 100 TB a
    spine is still driver-trivial (it scales with the date range, not the
    data).
    """
    step = {
        "year": "interval 1 year",
        "quarter": "interval 3 months",
        "month": "interval 1 month",
        "week": "interval 1 week",
        "day": "interval 1 day",
    }[datepart.lower()]
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(str(start_date)).cast("date"),
                    F.lit(str(end_date)).cast("date"),
                    F.expr(step),
                )
            ).alias(col_name)
        )
        .filter(F.col(col_name) < F.lit(str(end_date)).cast("date"))
    )


def generate_series(spark: SparkSession, upper_bound: int, col_name: str = "generated_number") -> DataFrame:
    """``generate_series.sql``: integers 1..upper_bound (the macro builds
    them from cross-joined powers of 2; ``spark.range`` is the native way)."""
    return spark.range(1, upper_bound + 1).select(F.col("id").alias(col_name))


# ---------------------------------------------------------------------------
# String macros
# ---------------------------------------------------------------------------

def split_part(col: Column | str, delimiter: str, part: int) -> Column:
    """``split_part.sql``: 1-based field extraction; '' when out of range
    (PG semantics — Spark's builtin ``split_part`` matches)."""
    return F.split_part(_c(col), F.lit(delimiter), F.lit(part))


def position(substring: Column | str, string: Column | str) -> Column:
    """``position.sql``: 1-based index of substring, 0 if absent."""
    if isinstance(substring, str):
        return F.locate(substring, _c(string))
    return F.call_function("locate", substring, _c(string))


def replace(col: Column | str, old: str, new: str) -> Column:
    """``replace.sql``: literal (non-regex) substring replacement."""
    return F.replace(_c(col), F.lit(old), F.lit(new))


def right(col: Column | str, n: Column | int) -> Column:
    """``right.sql``: last N characters."""
    return F.right(_c(col), F.lit(n) if isinstance(n, int) else n)


def length(col: Column | str) -> Column:
    """``length.sql``."""
    return F.length(_c(col))


def concat(*cols: Column | str) -> Column:
    """``concat.sql``."""
    return F.concat(*[_c(c) for c in cols])


def escape_single_quotes(value: str) -> str:
    """``escape_single_quotes.sql``: SQL-literal escaping ('' doubling)."""
    return value.replace("'", "''")


def string_literal(value: str) -> str:
    """``literal.sql``: render a python string as a SQL string literal."""
    return f"'{escape_single_quotes(value)}'"


def cast_bool_to_text(col: Column | str) -> Column:
    """``cast_bool_to_text.sql``: boolean → 'true'/'false' (PG ::text)."""
    return _c(col).cast("string")


def hash(col: Column | str) -> Column:
    """``hash.sql``: ``md5(cast(field as varchar))``."""
    return F.md5(_c(col).cast("string"))


def safe_cast(col: Column | str, to_type: str) -> Column:
    """``safe_cast.sql``: cast that yields NULL instead of erroring."""
    return _c(col).try_cast(to_type)


# ---------------------------------------------------------------------------
# Aggregate / predicate macros
# ---------------------------------------------------------------------------

def any_value(col: Column | str) -> Column:
    """``any_value.sql``."""
    return F.any_value(_c(col))


def bool_or(col: Column | str) -> Column:
    """``bool_or.sql``."""
    return F.bool_or(_c(col))


def listagg(
    col: Column | str,
    delimiter: str = ",",
    order_by: Column | str | None = None,
    descending: bool = False,
) -> Column:
    """``listagg.sql``: ordered string aggregation within a group.

    Deterministic ordering is built by collecting ``struct(order_key,
    value)`` pairs, array-sorting (JVM-side), then projecting the value —
    the Spark-native rewrite of ``string_agg(... order by ...)``.
    """
    c = _c(col)
    key = c if order_by is None else _c(order_by)
    pairs = F.array_sort(F.collect_list(F.struct(key.alias("k"), c.alias("v"))))
    if descending:
        pairs = F.reverse(pairs)
    return F.array_join(F.transform(pairs, lambda s: s["v"]), delimiter)


def equals(a: Column | str, b: Column | str) -> Column:
    """``equals.sql``: null-safe equality (NULL = NULL is TRUE)."""
    return _c(a).eqNullSafe(_c(b))


# ---------------------------------------------------------------------------
# Set-operation macros (DataFrame-level)
# ---------------------------------------------------------------------------

def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """``except.sql``: SQL EXCEPT (distinct rows of a not in b)."""
    return a.subtract(b)


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """``intersect.sql``: SQL INTERSECT (distinct)."""
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Array macros
# ---------------------------------------------------------------------------

def array_construct(*cols: Column) -> Column:
    """``array_construct.sql``."""
    return F.array(*cols)


def array_append(arr: Column | str, elem: Column) -> Column:
    """``array_append.sql``."""
    return F.array_append(_c(arr), elem)


def array_concat(a: Column | str, b: Column | str) -> Column:
    """``array_concat.sql``."""
    return F.concat(_c(a), _c(b))
