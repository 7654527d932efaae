"""Mirror of the driver's correctness gate: every catalog query with an
oracle must hash-match DuckDB on the same parquet tables (at sf0.001 here
for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from dbt_analytics_spark.queries import REGISTRY

from .conftest import SF_DIR, assert_frames_match

ORACLED = sorted(name for name, (_, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY = sorted(name for name, (_, sql) in REGISTRY.items() if sql is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, ddb, name):
    builder, sql = REGISTRY[name]
    spark_pdf = builder(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    # Vacuity guard (VERDICT r6): an empty oracle result proves only 0 = 0
    # (u3's 1994 window was empty at every sf). Every oracled query must
    # exercise at least one real row even at the smallest scale factor.
    assert len(oracle_pdf) >= 1, f"{name}: vacuous oracle (0 rows at {SF_DIR})"
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    builder, _ = REGISTRY[name]
    df = builder(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    # Determinism: a second run must produce the identical row multiset.
    assert builder(spark, SF_DIR).count() == n


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
