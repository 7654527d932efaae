"""Generic data tests: unique / not_null / accepted_values / relationships.

Each returns a *violations DataFrame* — the exact contract of dbt's generic
test macros, which compile to a SELECT of failing rows and pass iff the
count is 0 (reference: SP/dbt/include/global_project/macros/generic_test_sql/
{unique,not_null,accepted_values,relationships}.sql; evaluation in
SP/dbt/task/test.py:142-325).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique(*cols: str):
    """Violations: values appearing more than once
    (reference: generic_test_sql/unique.sql — group by value having count>1)."""

    def check(df: DataFrame) -> DataFrame:
        key = list(cols)
        return (
            df.filter(F.struct(*key).isNotNull())
            .groupBy(*key)
            .agg(F.count(F.lit(1)).alias("n_records"))
            .filter(F.col("n_records") > 1)
        )

    return check


def not_null(col: str):
    """Violations: rows where col IS NULL
    (reference: generic_test_sql/not_null.sql)."""

    def check(df: DataFrame) -> DataFrame:
        return df.filter(F.col(col).isNull())

    return check


def accepted_values(col: str, values: Sequence, quote: bool = True):
    """Violations: distinct values outside the accepted set
    (reference: generic_test_sql/accepted_values.sql — group-by field,
    filter not-in list)."""

    def check(df: DataFrame) -> DataFrame:
        c = F.col(col) if quote else F.col(col).cast("string")
        return (
            df.groupBy(c.alias("value_field"))
            .agg(F.count(F.lit(1)).alias("n_records"))
            .filter(~F.col("value_field").isin(*list(values)))
        )

    return check


def relationships(col: str, to_df_fn, to_col: str):
    """Violations: child values with no parent (left anti join) —
    (reference: generic_test_sql/relationships.sql: from child left join
    parent where parent is null). ``to_df_fn`` is a zero-arg callable
    returning the parent DataFrame (lazily resolved at test time)."""

    def check(df: DataFrame) -> DataFrame:
        parent = to_df_fn().select(F.col(to_col).alias("__parent_key")).distinct()
        return (
            df.filter(F.col(col).isNotNull())
            .join(parent, F.col(col) == F.col("__parent_key"), "left_anti")
        )

    return check
