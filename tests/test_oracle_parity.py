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


def test_j5_preserves_null_lang_groups(spark, tmp_path):
    """ADVICE r15: the j5 vocabulary-bounded rewrite joins its occ and
    doc_freq legs on [lang, word]; a null-rejecting equi-join silently
    dropped NULL-lang documents, which form their own group under both
    Spark's groupBy and the oracle's GROUP BY. The join is now
    null-safe on lang — prove parity on a corpus where lang IS NULL."""
    import os

    import duckdb

    from .conftest import assert_frames_match

    d = str(tmp_path / "sfj5")
    os.makedirs(d)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha", None, "s", 16),
            (2, "beta gamma", "en", "s", 10),
            (3, "alpha", None, "s", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pq = os.path.join(d, "documents.parquet")
    docs.coalesce(1).write.parquet(pq)

    from dbt_analytics_spark.queries.core import J5_SQL, j5_explode_split

    got = j5_explode_split(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pq}/*.parquet')"
    )
    oracle = con.execute(J5_SQL).fetchdf()
    con.close()
    assert got["lang"].isna().any(), "NULL-lang groups missing from result"
    assert_frames_match(got, oracle, "j5_null_lang")
