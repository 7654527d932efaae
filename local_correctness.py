"""Local replica of the driver's correctness gate, with NO 50-query cap.

The driver checks only the first 50 entries of ``queries()`` (root cause:
CORRECTNESS_r01/r02 key lists are byte-identical to the registry's first-50
prefix; see dbt_analytics_spark/queries/__init__.py).  This script runs ALL
registered queries at driver conditions (sf0.01, DuckDB oracle, row-count +
schema + order-insensitive value-hash) and writes CORRECTNESS_LOCAL_r{N}.json
so the six past-cap queries still have committed, reproducible evidence.

Usage:  python local_correctness.py [round_number]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

from dbt_analytics_spark.queries import REGISTRY
from dbt_analytics_spark.session import get_spark
from dbt_analytics_spark.sources.readers import TABLES
from tests.conftest import canonicalize

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def value_hash(pdf) -> str:
    canon = canonicalize(pdf)
    h = hashlib.sha256()
    h.update("|".join(canon.columns).encode())
    for row in canon.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("local-correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    results: dict[str, dict] = {}
    failures = 0
    for name, (builder, sql) in REGISTRY.items():
        row: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            spark_pdf = builder(spark, SF_DIR).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                oracle_pdf = con.execute(sql).fetchdf()
                row["oracle_rows"] = len(oracle_pdf)
                row["rows_match"] = len(spark_pdf) == len(oracle_pdf)
                row["schema_match"] = sorted(spark_pdf.columns) == sorted(
                    oracle_pdf.columns
                )
                row["hash_match"] = value_hash(spark_pdf) == value_hash(
                    oracle_pdf
                )
                # Vacuity guard (VERDICT r6): a 0-row oracle proves only
                # 0 = 0 — every oracled query must exercise real rows.
                if len(oracle_pdf) == 0:
                    row["err"] = "vacuous_oracle: 0 rows"
                    failures += 1
                elif not (row["rows_match"] and row["schema_match"] and row["hash_match"]):
                    failures += 1
        except Exception as exc:  # pragma: no cover - diagnostic path
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            failures += 1
        results[name] = row
        status = row["err"] or ("ok" if row["hash_match"] else "MISMATCH")
        print(f"{name:28s} {status}")

    # The artifact must cover the WHOLE registry — guard against a future
    # early-exit or filter making n_queries silently drift from the catalog.
    assert len(results) == len(REGISTRY), (
        f"gate covered {len(results)} queries but registry holds {len(REGISTRY)}"
    )
    out = f"CORRECTNESS_LOCAL_r{rnd:02d}.json"
    with open(out, "w") as f:
        json.dump({"sf_dir": SF_DIR, "n_queries": len(results), "results": results}, f, indent=2)
    print(f"\nwrote {out}: {len(results)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
