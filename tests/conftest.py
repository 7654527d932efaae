from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_analytics_spark.session import get_spark  # noqa: E402
from dbt_analytics_spark.sources.readers import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("spark-warehouse"))
    spark = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Engine-neutral canonical form: columns sorted by name, every value a
    canonical string (dates as ISO, floats as 17-sig-digit repr), rows
    sorted. Mirrors an order-insensitive value-hash comparison."""
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.dt.date.astype(str)
        elif pd.api.types.is_bool_dtype(s):
            out[col] = s.astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.map(lambda x: "nan" if pd.isna(x) else f"{x:.17g}")
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype(str)
        else:
            out[col] = s.map(_canon_obj)
    res = pd.DataFrame(out)
    res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)
    return res


def _canon_obj(x) -> str:
    import datetime
    import decimal

    if x is None:
        return "null"
    if isinstance(x, float):
        return "nan" if pd.isna(x) else f"{x:.17g}"
    if isinstance(x, decimal.Decimal):
        return f"{float(x):.17g}"
    if isinstance(x, bool):
        return str(x)
    if isinstance(x, datetime.datetime):
        return x.date().isoformat() if (x.hour, x.minute, x.second, x.microsecond) == (0, 0, 0, 0) else x.isoformat()
    if isinstance(x, datetime.date):
        return x.isoformat()
    try:
        if pd.isna(x):
            return "nan"
    except (TypeError, ValueError):
        pass
    return str(x)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    neq = (a != b).any(axis=1)
    if neq.any():
        idx = neq[neq].index[:5]
        raise AssertionError(
            f"{name}: {int(neq.sum())}/{len(a)} rows differ; first diffs:\n"
            f"spark:\n{a.loc[idx]}\noracle:\n{b.loc[idx]}"
        )
