"""End-to-end: the FULL 27-model reference DAG as an ON-DISK dbt-style
project tree, run through the CLI — the exact workflow of a reference
user pointing their dbt project at this engine:

    models/*.sql (27 Jinja-SQL files) + seeds/*.csv (4 seeds) +
    dbt_project.yml (sources bound to parquet) → python -m
    dbt_analytics_spark build

The materialized relations are then diffed against the DataFrame-first
DAG (workload/models.py) computed from the SAME parquet inputs —
proving file-loading, seed registration, source binding, ref/source
rendering, and DAG scheduling end-to-end, not just the in-process
registration path that tests/test_sql_dag_parity.py covers.

Reference: dbt_project.yml:1-16 (model-paths/seed-paths layout),
SP/dbt/cli/main.py:171-200 (`dbt run`).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pandas as pd
import pytest

from dbt_analytics_spark.cli import main
from dbt_analytics_spark.workload.models import SEEDS_DIR

RUN_DATE = dt.date(2025, 8, 31)
RAW_TABLES = (
    "card_transactions",
    "exercise_log",
    "recipe_log",
    "shopping_log",
    "weights",
)
# Spot-checked relations: the boss-fight classifier, one spend grain, one
# metrics grain (spine + conditional aggs + windows).
CHECKED = ("classified_card_transactions", "spend_monthly", "metrics_monthly")


def _canon(pdf: pd.DataFrame):
    from tests.conftest import canonicalize

    canon = canonicalize(pdf)
    return tuple(canon.columns), sorted(
        tuple(row) for row in canon.itertuples(index=False)
    )


@pytest.fixture(scope="module")
def ref_project_dir(tmp_path_factory, spark):
    from dbt_analytics_spark.workload import fixtures
    from dbt_analytics_spark.workload.sql_dag import sql_model_bodies

    d = str(tmp_path_factory.mktemp("ref_proj"))
    # Raw inputs as parquet files — the standalone-engine input format.
    for name, df in fixtures.all_sources(spark).items():
        df.write.mode("overwrite").parquet(os.path.join(d, "data", name))
    os.makedirs(os.path.join(d, "seeds"))
    for f in os.listdir(SEEDS_DIR):
        if f.endswith(".csv"):
            shutil.copy(os.path.join(SEEDS_DIR, f), os.path.join(d, "seeds", f))
    # The 27 models, unsuffixed, as real .sql files.
    os.makedirs(os.path.join(d, "models"))
    for name, sql in sql_model_bodies(
        spark, run_date=RUN_DATE, suffix=""
    ).items():
        with open(os.path.join(d, "models", f"{name}.sql"), "w") as fh:
            fh.write("{{ config(materialized='table') }}\n" + sql)
    sources_yaml = "\n".join(
        f"  {t}: data/{t}" for t in RAW_TABLES
    )
    with open(os.path.join(d, "dbt_project.yml"), "w") as fh:
        fh.write(
            f"name: my_project\nsources:\n{sources_yaml}\n"
            "model-paths: [models]\nseed-paths: [seeds]\n"
        )
    return d


def test_reference_project_via_cli(ref_project_dir, spark):
    rc = main(
        [
            "run",
            "--project-dir",
            ref_project_dir,
            "--database",
            "cli_ref",
            "--run-date",
            str(RUN_DATE),
        ],
        spark=spark,
    )
    assert rc == 0
    import json

    rr = json.load(
        open(os.path.join(ref_project_dir, "target", "run_results.json"))
    )
    statuses = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert len(statuses) == 31  # 27 models + 4 seeds
    assert set(statuses.values()) == {"success"}

    # Diff against the DataFrame-first DAG fed from the SAME parquet.
    from dbt_analytics_spark.workload import build_project

    sources = {
        t: spark.read.parquet(os.path.join(ref_project_dir, "data", t))
        for t in RAW_TABLES
    }
    p = build_project(spark, sources, run_date=RUN_DATE)
    p.compile()
    for name in CHECKED:
        cli_cols, cli_rows = _canon(spark.table(f"cli_ref.{name}").toPandas())
        df_cols, df_rows = _canon(p.compile_node(name).toPandas())
        assert cli_cols == df_cols, name
        assert len(cli_rows) > 0, f"{name}: empty relation proves nothing"
        assert cli_rows == df_rows, name
