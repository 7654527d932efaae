"""Snapshots: SCD-2 change tracking (dbt snapshot re-expressed on Spark).

Reference: SP/.../materializations/snapshots/snapshot.sql:1-109 +
strategies.sql:38-142 — strategies ``timestamp`` (updated_at column) and
``check`` (column-diff, including check_cols='all'); tracked columns
``dbt_scd_id`` (md5 of key+updated_at), ``dbt_valid_from``, ``dbt_valid_to``,
``dbt_updated_at``, optional ``dbt_is_deleted``.

Implementation: instead of the reference's staging-table + MERGE dance
(snapshot_merge.sql), each snapshot run computes the new SCD-2 state as a
pure DataFrame transform (close current rows whose tracked values changed /
disappeared; insert new versions), then rewrites the snapshot table via a
staging swap. Window-free: one full outer join per run, keyed on the
snapshot unique key.
"""

from __future__ import annotations

import datetime as dt
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from .registry import Project

META_COLS = ("dbt_scd_id", "dbt_valid_from", "dbt_valid_to", "dbt_updated_at", "dbt_is_deleted")

# concat_ws silently DROPS nulls, so ('a', NULL) and (NULL, 'a') would hash
# identically and a null-involved change would be missed. The reference
# compares check columns null-safely (SP/.../snapshots/strategies.sql);
# mirror that by substituting a sentinel no real cast('string') can produce.
_NULL_TOKEN = "\x00dbt_null\x00"


def _null_safe(col: F.Column) -> F.Column:
    return F.coalesce(col.cast("string"), F.lit(_NULL_TOKEN))


def _scd_id(unique_key: str, stamp_col) -> F.Column:
    return F.md5(
        F.concat_ws("|", _null_safe(F.col(unique_key)), _null_safe(stamp_col))
    )


def snapshot(
    project: "Project",
    name: str,
    source: DataFrame,
    unique_key: str,
    strategy: str = "timestamp",
    updated_at: str | None = None,
    check_cols: list[str] | str = "all",
    at: dt.datetime | None = None,
    hard_deletes: str = "ignore",  # ignore | invalidate | new_record
) -> DataFrame:
    """Run one snapshot pass; returns the new snapshot table state."""
    now = at or dt.datetime.now()
    now_lit = F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")

    if strategy == "timestamp":
        if not updated_at:
            raise ValueError("timestamp strategy requires updated_at")
        stamp = F.col(updated_at).cast("timestamp")
    elif strategy == "check":
        cols = (
            [c for c in source.columns if c != unique_key]
            if check_cols == "all"
            else list(check_cols)
        )
        stamp = now_lit
    else:
        raise ValueError(f"unknown snapshot strategy {strategy!r}")

    # Check strategy: hash a STRUCTURAL encoding of the tracked columns.
    # A '|'-joined string is delimiter-injectable — ('a|b','c') vs
    # ('a','b|c') would collide and the change would be missed; to_json
    # escapes values and keys them by field name, so boundaries survive.
    staged = source.select(
        "*",
        _scd_id(
            unique_key,
            stamp
            if strategy == "timestamp"
            else F.to_json(
                F.struct(*[_null_safe(F.col(c)).alias(c) for c in cols])
            ),
        ).alias("dbt_scd_id"),
        stamp.alias("dbt_updated_at"),
        stamp.alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )
    if hard_deletes != "ignore":
        staged = staged.withColumn("dbt_is_deleted", F.lit("False"))

    target = project.qualified(name)
    if not project.relation_exists(name):
        staged.write.mode("overwrite").saveAsTable(target)
        return project.read_relation(name)

    existing = project.read_relation(name)
    closed = existing.filter(F.col("dbt_valid_to").isNotNull())
    current = existing.filter(F.col("dbt_valid_to").isNull())

    # One full outer join per run decides inserts / updates / deletes.
    src = staged.alias("src")
    cur = current.alias("cur")
    joined = cur.join(
        src, F.col(f"cur.{unique_key}") == F.col(f"src.{unique_key}"), "full_outer"
    )

    changed = F.col("src.dbt_scd_id") != F.col("cur.dbt_scd_id")
    src_cols = [F.col(f"src.{c}").alias(c) for c in staged.columns]
    cur_cols = [F.col(f"cur.{c}").alias(c) for c in existing.columns]

    # 1) brand-new keys + new versions of changed keys → insert as current.
    inserts = joined.filter(
        F.col(f"cur.{unique_key}").isNull() | (F.col(f"src.{unique_key}").isNotNull() & changed)
    ).select(*src_cols)

    # 2) unchanged current rows pass through.
    unchanged = joined.filter(
        F.col(f"src.{unique_key}").isNotNull() & F.col(f"cur.{unique_key}").isNotNull() & ~changed
    ).select(*cur_cols)

    # 3) changed current rows get closed out at the new version's stamp.
    closed_out = (
        joined.filter(
            F.col(f"src.{unique_key}").isNotNull()
            & F.col(f"cur.{unique_key}").isNotNull()
            & changed
        )
        .select(*cur_cols, F.col("src.dbt_valid_from").alias("__new_from"))
        .withColumn("dbt_valid_to", F.col("__new_from"))
        .drop("__new_from")
    )

    # 4) keys gone from the source (hard deletes).
    gone = joined.filter(F.col(f"src.{unique_key}").isNull()).select(*cur_cols)
    if hard_deletes == "invalidate":
        gone = gone.withColumn("dbt_valid_to", now_lit)
    # 'new_record' deletion markers (reference strategies.sql dbt_is_deleted)
    elif hard_deletes == "new_record":
        marker = (
            gone.withColumn("dbt_valid_to", now_lit)
        )
        deleted_marker = (
            gone.withColumn("dbt_is_deleted", F.lit("True"))
            .withColumn("dbt_valid_from", now_lit)
            .withColumn("dbt_valid_to", F.lit(None).cast("timestamp"))
        )
        gone = marker.unionByName(deleted_marker)

    new_state = closed.unionByName(unchanged).unionByName(inserts, allowMissingColumns=True)
    new_state = new_state.unionByName(closed_out, allowMissingColumns=True)
    new_state = new_state.unionByName(gone, allowMissingColumns=True)

    staging_name = f"{name}__snapshot_tmp"
    new_state.write.mode("overwrite").saveAsTable(project.qualified(staging_name))
    project.spark.table(project.qualified(staging_name)).write.mode("overwrite").saveAsTable(target)
    project.spark.sql(f"DROP TABLE IF EXISTS {project.qualified(staging_name)}")
    return project.read_relation(name)


def unit_test(actual: DataFrame, expected: DataFrame) -> tuple[bool, DataFrame, DataFrame]:
    """dbt unit-test comparison: EXCEPT-style diff both directions
    (reference: SP/.../materializations/tests/unit.sql:1-30,
    SP/dbt/task/test.py:205-283). Returns (passed, missing, unexpected)."""
    missing = expected.exceptAll(actual.select(*expected.columns))
    unexpected = actual.select(*expected.columns).exceptAll(expected)
    return missing.isEmpty() and unexpected.isEmpty(), missing, unexpected
