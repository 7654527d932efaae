"""CLI surface (dbt_analytics_spark/cli.py): dbt's command line —
run/build/seed/test/ls/compile/show/docs/retry — over a dbt-style
project DIRECTORY (dbt_project.yml + models/ + seeds/ + schema files).
Reference: SP/dbt/cli/main.py:155-164 command group; project layout
dbt_project.yml:1-16 (model-paths/seed-paths).
"""

from __future__ import annotations

import json
import os

import pytest

from dbt_analytics_spark.cli import main


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture()
def project_dir(tmp_path, spark):
    """A small but structurally complete project: one parquet source, one
    seed, a staging model, a mart joining both, schema tests, a selector."""
    d = str(tmp_path / "proj")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "c", 7.0)],
        ["txn_id", "seg", "amount"],
    ).write.mode("overwrite").parquet(os.path.join(d, "data", "raw_txns"))
    _write(
        os.path.join(d, "dbt_project.yml"),
        """
name: cli_proj
vars:
  min_amount: 6
sources:
  raw_txns: data/raw_txns
seed-paths: [seeds]
model-paths: [models]
""",
    )
    _write(
        os.path.join(d, "seeds", "seg_names.csv"),
        "seg,seg_name\na,Alpha\nb,Beta\nc,Gamma\n",
    )
    _write(
        os.path.join(d, "models", "staging", "stg_txns.sql"),
        """
{{ config(materialized='table') }}
SELECT txn_id, seg, amount
FROM {{ source('raw', 'raw_txns') }}
WHERE amount >= {{ var('min_amount') }}
""",
    )
    _write(
        os.path.join(d, "models", "marts", "seg_spend.sql"),
        """
SELECT s.seg, n.seg_name, SUM(s.amount) AS total
FROM {{ ref('stg_txns') }} s
JOIN {{ ref('seg_names') }} n ON n.seg = s.seg
GROUP BY s.seg, n.seg_name
""",
    )
    _write(
        os.path.join(d, "models", "schema.yml"),
        """
models:
  - name: stg_txns
    columns:
      - name: txn_id
        tests: [unique, not_null]
      - name: seg
        data_tests:
          - relationships: {to: "ref('seg_names')", field: seg}
  - name: seg_spend
    columns:
      - name: seg
        tests:
          - accepted_values: {values: [a, b, c]}
""",
    )
    _write(
        os.path.join(d, "selectors.yml"),
        """
selectors:
  - name: marts_only
    definition: {tag: marts}
""",
    )
    return d


def _run(spark, argv, db):
    return main(argv + ["--database", db], spark=spark)


def test_cli_run_end_to_end(project_dir, spark):
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_run")
    assert rc == 0
    spend = {
        r["seg"]: (r["seg_name"], r["total"])
        for r in spark.table("cli_run.seg_spend").collect()
    }
    # min_amount=6 drops the 5.0 row; seg b disappears entirely.
    assert spend == {"a": ("Alpha", 30.0), "c": ("Gamma", 7.0)}
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    statuses = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert statuses["stg_txns"] == "success"
    assert statuses["seg_spend"] == "success"
    assert statuses["seg_names"] == "success"
    assert os.path.exists(os.path.join(project_dir, "target", "manifest.json"))


def test_cli_vars_override(project_dir, spark):
    rc = _run(
        spark,
        ["run", "--project-dir", project_dir, "--vars", "{min_amount: 0}"],
        "cli_vars",
    )
    assert rc == 0
    # With the override nothing is filtered: seg b's 5.0 row survives.
    rows = spark.table("cli_vars.stg_txns").count()
    assert rows == 4


def test_cli_ls_topo_and_selection(project_dir, spark, capsys):
    rc = _run(spark, ["ls", "--project-dir", project_dir, "--output", "json"], "cli_ls")
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    names = [r["name"] for r in rows]
    assert names.index("stg_txns") < names.index("seg_spend")
    assert names.index("seg_names") < names.index("seg_spend")
    # Folder names become tags (dbt folder-scoped selection).
    by_name = {r["name"]: r for r in rows}
    assert "marts" in by_name["seg_spend"]["tags"]

    rc = _run(
        spark,
        ["ls", "--project-dir", project_dir, "--select", "tag:staging"],
        "cli_ls",
    )
    assert capsys.readouterr().out.split() == ["stg_txns"]
    assert rc == 0

    # Named YAML selector from selectors.yml.
    rc = _run(
        spark,
        ["ls", "--project-dir", project_dir, "--selector", "marts_only"],
        "cli_ls",
    )
    assert capsys.readouterr().out.split() == ["seg_spend"]
    assert rc == 0


def test_cli_seed_runs_only_seeds(project_dir, spark):
    rc = _run(spark, ["seed", "--project-dir", project_dir], "cli_seed")
    assert rc == 0
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    assert [r["unique_id"] for r in rr["results"]] == ["seg_names"]
    assert spark.table("cli_seed.seg_names").count() == 3


def test_cli_build_and_test(project_dir, spark):
    rc = _run(spark, ["build", "--project-dir", project_dir], "cli_build")
    assert rc == 0
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    statuses = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert statuses["unique_stg_txns_txn_id__stg_txns"] == "success"
    assert statuses["relationships_stg_txns_seg__stg_txns"] == "success"

    # Standalone `test` against the already-built relations.
    rc = _run(spark, ["test", "--project-dir", project_dir], "cli_build")
    assert rc == 0


def test_cli_build_failing_test_skips_downstream(project_dir, spark):
    # A duplicate txn_id breaks the unique test; the mart must SKIP (bad
    # data never propagates — the dbt build gating contract).
    _write(
        os.path.join(project_dir, "models", "staging", "stg_txns.sql"),
        """
{{ config(materialized='table') }}
SELECT txn_id, seg, amount FROM {{ source('raw', 'raw_txns') }}
UNION ALL
SELECT txn_id, seg, amount FROM {{ source('raw', 'raw_txns') }}
""",
    )
    rc = _run(spark, ["build", "--project-dir", project_dir], "cli_fail")
    assert rc == 1
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    statuses = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert statuses["unique_stg_txns_txn_id__stg_txns"] == "error"
    assert statuses["seg_spend"] == "skipped"


def test_cli_retry_reruns_only_failures(project_dir, spark):
    # Break the staging model with a SQL error, run (fails), fix the file,
    # retry — only the failed/skipped nodes re-run (SP/dbt/task/retry.py).
    good = open(os.path.join(project_dir, "models", "staging", "stg_txns.sql")).read()
    _write(
        os.path.join(project_dir, "models", "staging", "stg_txns.sql"),
        "SELECT nonexistent_col FROM {{ source('raw', 'raw_txns') }}",
    )
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_retry")
    assert rc == 1
    _write(os.path.join(project_dir, "models", "staging", "stg_txns.sql"), good)
    rc = _run(spark, ["retry", "--project-dir", project_dir], "cli_retry")
    assert rc == 0
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    rerun = {r["unique_id"] for r in rr["results"]}
    assert rerun == {"stg_txns", "seg_spend"}  # seed was fine; not re-run

    rc = _run(spark, ["retry", "--project-dir", project_dir], "cli_retry")
    assert rc == 0  # clean previous run -> nothing to retry


def test_cli_state_modified_selection(project_dir, spark, capsys):
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_state")
    assert rc == 0
    capsys.readouterr()
    # Edit the mart's SQL text: state:modified must see it — checksums
    # track the SQL body, not the (shared) wrapper closure source.
    path = os.path.join(project_dir, "models", "marts", "seg_spend.sql")
    _write(path, open(path).read() + "\n-- comment changes the checksum\n")
    rc = _run(
        spark,
        [
            "ls",
            "--project-dir",
            project_dir,
            "--select",
            "state:modified",
            "--state",
            os.path.join(project_dir, "target"),
        ],
        "cli_state",
    )
    assert rc == 0
    assert capsys.readouterr().out.split() == ["seg_spend"]


def test_cli_show_inline_and_node(project_dir, spark, capsys):
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_show")
    capsys.readouterr()
    rc = _run(
        spark,
        [
            "show",
            "--project-dir",
            project_dir,
            "--inline",
            "SELECT COUNT(*) AS n FROM {{ ref('seg_spend') }}",
        ],
        "cli_show",
    )
    assert rc == 0
    assert "n" in capsys.readouterr().out
    rc = _run(spark, ["show", "seg_spend", "--project-dir", project_dir], "cli_show")
    assert rc == 0
    assert "seg_name" in capsys.readouterr().out
    # No node and no --inline is a usage error.
    rc = _run(spark, ["show", "--project-dir", project_dir], "cli_show")
    assert rc == 2


def test_cli_docs_generate(project_dir, spark):
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_docs")
    rc = _run(spark, ["docs", "generate", "--project-dir", project_dir], "cli_docs")
    assert rc == 0
    target = os.path.join(project_dir, "target")
    manifest = json.load(open(os.path.join(target, "manifest.json")))
    assert any(k.endswith("seg_spend") for k in manifest["nodes"])
    assert os.path.exists(os.path.join(target, "catalog.json"))
    assert os.path.exists(os.path.join(target, "index.html"))


def test_cli_compile_reports_errors(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "models", "broken.sql"),
        "SELECT * FROM {{ ref('does_not_exist') }}",
    )
    rc = _run(spark, ["compile", "--project-dir", project_dir], "cli_compile")
    out = capsys.readouterr().out
    assert rc == 1
    assert "broken" in out


def test_cli_model_contract_enforced(project_dir, spark):
    # Enforced contract from the schema file: matching schema passes;
    # a violated data_type fails the node BEFORE materialization.
    _write(
        os.path.join(project_dir, "models", "contracted.sql"),
        "SELECT CAST(1 AS BIGINT) AS id, 'x' AS name",
    )
    _write(
        os.path.join(project_dir, "models", "contract_schema.yml"),
        """
models:
  - name: contracted
    config:
      contract: {enforced: true}
    columns:
      - name: id
        data_type: bigint
        constraints: [{type: not_null}]
      - name: name
        data_type: string
""",
    )
    rc = _run(
        spark,
        ["run", "--project-dir", project_dir, "--select", "contracted"],
        "cli_contract",
    )
    assert rc == 0
    assert spark.table("cli_contract.contracted").count() == 1

    # Break the contract: id becomes a string.
    _write(
        os.path.join(project_dir, "models", "contracted.sql"),
        "SELECT 'oops' AS id, 'x' AS name",
    )
    rc = _run(
        spark,
        ["run", "--project-dir", project_dir, "--select", "contracted"],
        "cli_contract",
    )
    assert rc == 1
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    msg = [r for r in rr["results"] if r["unique_id"] == "contracted"][0]
    assert msg["status"] == "error"
    assert "contract" in msg["message"]


def test_cli_source_freshness(tmp_path, spark, capsys):
    d = str(tmp_path / "fresh_proj")
    spark.createDataFrame(
        [(1, "2025-08-30 12:00:00"), (2, "2025-08-25 00:00:00")],
        ["id", "loaded_at"],
    ).selectExpr("id", "CAST(loaded_at AS TIMESTAMP) AS loaded_at").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "data", "events_raw"))
    _write(
        os.path.join(d, "dbt_project.yml"),
        """
name: fresh_proj
sources:
  events_raw:
    path: data/events_raw
    loaded_at_field: loaded_at
    freshness:
      warn_after: {count: 12, period: hour}
      error_after: {count: 7, period: day}
""",
    )
    # Pinned 'now' = 2025-08-31T00:00Z: newest row is 12h old on the nose
    # (not > 12h, so PASS), far from the 7-day error bar.
    rc = main(
        ["source", "freshness", "--project-dir", d, "--run-date", "2025-08-31"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "PASS" in out
    srcs = json.load(open(os.path.join(d, "target", "sources.json")))
    assert srcs["results"][0]["status"] == "pass"
    assert srcs["results"][0]["age_seconds"] == 12 * 3600

    # A week later the source has gone stale past the error bar.
    rc = main(
        ["source", "freshness", "--project-dir", d, "--run-date", "2025-09-08"],
        spark=spark,
    )
    assert rc == 1
    srcs = json.load(open(os.path.join(d, "target", "sources.json")))
    assert srcs["results"][0]["status"] == "error"


def test_cli_snapshot_scd2_across_invocations(tmp_path, spark):
    # dbt snapshots/ surface: a timestamp-strategy snapshot run twice via
    # the CLI, with the source changing between invocations — the second
    # pass closes the old version and opens the new one (SCD-2).
    d = str(tmp_path / "snap_proj")
    src = os.path.join(d, "data", "people")

    def write_src(rows):
        spark.createDataFrame(rows, ["id", "name", "updated_at"]).selectExpr(
            "id", "name", "CAST(updated_at AS TIMESTAMP) AS updated_at"
        ).write.mode("overwrite").parquet(src)

    write_src([(1, "alice", "2025-01-01 00:00:00"), (2, "bob", "2025-01-01 00:00:00")])
    _write(
        os.path.join(d, "dbt_project.yml"),
        "name: snap_proj\nsources:\n  people: data/people\n",
    )
    _write(
        os.path.join(d, "snapshots", "people_snap.sql"),
        """
{{ config(unique_key='id', strategy='timestamp', updated_at='updated_at') }}
SELECT id, name, updated_at FROM {{ source('people') }}
""",
    )
    rc = main(
        ["snapshot", "--project-dir", d, "--database", "cli_snap"], spark=spark
    )
    assert rc == 0
    t = spark.table("cli_snap.people_snap")
    assert t.count() == 2
    assert t.filter("dbt_valid_to IS NULL").count() == 2

    # v2: alice renamed; bob unchanged.
    write_src([(1, "alicia", "2025-02-01 00:00:00"), (2, "bob", "2025-01-01 00:00:00")])
    rc = main(
        ["snapshot", "--project-dir", d, "--database", "cli_snap"], spark=spark
    )
    assert rc == 0
    t = spark.table("cli_snap.people_snap")
    assert t.count() == 3
    cur = {r["id"]: r["name"] for r in t.filter("dbt_valid_to IS NULL").collect()}
    assert cur == {1: "alicia", 2: "bob"}
    closed = t.filter("dbt_valid_to IS NOT NULL").collect()
    assert len(closed) == 1 and closed[0]["name"] == "alice"

    # Snapshot nodes are selectable DAG members (config.kind:snapshot).
    rr = json.load(open(os.path.join(d, "target", "run_results.json")))
    assert [r["unique_id"] for r in rr["results"]] == ["people_snap"]


def test_cli_yaml_unit_tests(project_dir, spark):
    # dbt >= 1.8 YAML unit tests: mocked refs, EXCEPT-style diff. One
    # passing and one failing spec; the test command reports both.
    _write(
        os.path.join(project_dir, "models", "unit_tests.yml"),
        """
unit_tests:
  - name: agg_is_right
    model: seg_spend
    given:
      - input: ref('stg_txns')
        rows:
          - {txn_id: 1, seg: a, amount: 10.0}
          - {txn_id: 2, seg: a, amount: 5.0}
      - input: ref('seg_names')
        rows:
          - {seg: a, seg_name: Alpha}
    expect:
      rows:
        - {seg: a, seg_name: Alpha, total: 15.0}
  - name: agg_is_wrong
    model: seg_spend
    given:
      - input: ref('stg_txns')
        rows:
          - {txn_id: 1, seg: a, amount: 10.0}
      - input: ref('seg_names')
        rows:
          - {seg: a, seg_name: Alpha}
    expect:
      rows:
        - {seg: a, seg_name: Alpha, total: 999.0}
""",
    )
    rc = _run(spark, ["test", "--project-dir", project_dir], "cli_unit")
    assert rc == 1  # the wrong expectation fails
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    statuses = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert statuses["unit_agg_is_right__seg_spend"] == "success"
    assert statuses["unit_agg_is_wrong__seg_spend"] == "error"


def test_cli_exposures_lineage_selection(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "models", "exposures.yml"),
        """
exposures:
  - name: spend_dashboard
    depends_on: [ref('seg_spend')]
    owner: {name: data-team}
    url: https://dash.example/spend
""",
    )
    # +exposure selects its full upstream closure (lineage-only node).
    rc = _run(
        spark,
        ["ls", "--project-dir", project_dir, "--select", "+spend_dashboard"],
        "cli_expo",
    )
    assert rc == 0
    names = set(capsys.readouterr().out.split())
    assert {"spend_dashboard", "seg_spend", "stg_txns", "seg_names"} <= names

    # run on the exposure materializes the models but not the exposure.
    rc = _run(
        spark,
        ["run", "--project-dir", project_dir, "--select", "+spend_dashboard"],
        "cli_expo",
    )
    assert rc == 0
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    ids = {r["unique_id"] for r in rr["results"]}
    assert "seg_spend" in ids and "spend_dashboard" not in ids


def test_cli_project_config_tree(tmp_path, spark):
    # dbt_project.yml models: tree — the reference's own surface
    # (dbt_project.yml:14-16 '+materialized: table'): folder-scoped
    # +keys with header-wins precedence, +tags accumulating.
    d = str(tmp_path / "tree_proj")
    _write(
        os.path.join(d, "dbt_project.yml"),
        """
name: tree_proj
models:
  tree_proj:
    +materialized: table
    staging:
      +materialized: view
      +tags: [layer_staging]
""",
    )
    _write(os.path.join(d, "models", "plain.sql"), "SELECT 1 AS x")
    _write(os.path.join(d, "models", "staging", "stg_a.sql"), "SELECT 2 AS x")
    _write(
        os.path.join(d, "models", "staging", "stg_override.sql"),
        "{{ config(materialized='table') }} SELECT 3 AS x",
    )
    from dbt_analytics_spark.cli import load_project

    p = load_project(spark, d, database="cli_tree")
    assert p.nodes["plain"].materialized == "table"
    assert p.nodes["stg_a"].materialized == "view"       # folder default
    assert p.nodes["stg_override"].materialized == "table"  # header wins
    assert "layer_staging" in p.nodes["stg_a"].tags
    assert "staging" in p.nodes["stg_a"].tags  # folder name still a tag


def test_cli_fail_fast(project_dir, spark):
    # --fail-fast: a RUNTIME failure (compile passes; the error fires
    # during materialization) stops scheduling at the next level — every
    # not-yet-run node is recorded skipped with the fail-fast marker.
    _write(
        os.path.join(project_dir, "models", "staging", "stg_txns.sql"),
        """
SELECT txn_id, seg, amount,
       CASE WHEN amount IS NOT NULL THEN raise_error('boom') END AS z
FROM {{ source('raw', 'raw_txns') }}
""",
    )
    rc = _run(
        spark,
        ["run", "--project-dir", project_dir, "--fail-fast"],
        "cli_ff",
    )
    assert rc == 1
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    statuses = {r["unique_id"]: r["status"] for r in rr["results"]}
    msgs = {r["unique_id"]: r["message"] for r in rr["results"]}
    assert statuses["stg_txns"] == "error"
    assert statuses["seg_names"] == "success"  # same level, already ran
    assert statuses["seg_spend"] == "skipped"
    assert msgs["seg_spend"] == "fail-fast"


def test_cli_debug_and_clean(project_dir, spark, capsys):
    rc = _run(spark, ["debug", "--project-dir", project_dir], "cli_dbg")
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 models" in out and "1 seeds" in out
    assert "All checks passed!" in out

    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_dbg")
    assert os.path.isdir(os.path.join(project_dir, "target"))
    rc = _run(spark, ["clean", "--project-dir", project_dir], "cli_dbg")
    assert rc == 0
    assert not os.path.isdir(os.path.join(project_dir, "target"))


def test_cli_compile_artifacts_and_analyses(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "analyses", "big_spenders.sql"),
        "SELECT seg FROM {{ ref('seg_spend') }} WHERE total > {{ var('min_amount') }}",
    )
    rc = _run(spark, ["compile", "--project-dir", project_dir], "cli_comp")
    assert rc == 0
    compiled = os.path.join(project_dir, "target", "compiled")
    # Model: ref() renders to the QUALIFIED relation, var() to its value.
    mart = open(os.path.join(compiled, "seg_spend.sql")).read()
    assert "cli_comp.stg_txns" in mart and "{{" not in mart
    stg = open(os.path.join(compiled, "stg_txns.sql")).read()
    assert "amount >= 6" in stg
    # Analysis: compiled but never materialized (absent from run).
    ana = open(os.path.join(compiled, "big_spenders.sql")).read()
    assert "cli_comp.seg_spend" in ana
    capsys.readouterr()
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_comp")
    assert rc == 0
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    assert "big_spenders" not in {r["unique_id"] for r in rr["results"]}


def test_cli_empty_dry_run(project_dir, spark):
    # --empty: full-DAG schema validation with LIMIT 0 models; seeds keep
    # rows so dry models still have real inputs to select from.
    rc = _run(spark, ["run", "--project-dir", project_dir, "--empty"], "cli_empty")
    assert rc == 0
    assert spark.table("cli_empty.stg_txns").count() == 0
    assert spark.table("cli_empty.seg_spend").count() == 0
    assert spark.table("cli_empty.seg_names").count() == 3  # seed kept
    # Schemas are the real ones.
    assert set(spark.table("cli_empty.seg_spend").columns) == {
        "seg", "seg_name", "total",
    }


def test_cli_incremental_model_across_invocations(tmp_path, spark):
    # Incremental SQL model through the CLI: first invocation full-builds,
    # the second appends only rows newer than max({{ this }}) via the
    # is_incremental() block — state carried by the warehouse, not the
    # process.
    d = str(tmp_path / "inc_proj")
    src = os.path.join(d, "data", "events_raw")

    def write_src(rows):
        spark.createDataFrame(rows, ["id", "day"]).write.mode(
            "overwrite"
        ).parquet(src)

    write_src([(1, "2025-01-01"), (2, "2025-01-02")])
    _write(
        os.path.join(d, "dbt_project.yml"),
        "name: inc_proj\nsources:\n  events_raw: data/events_raw\n",
    )
    _write(
        os.path.join(d, "models", "events_inc.sql"),
        """
{{ config(materialized='incremental', unique_key='id', incremental_strategy='append') }}
SELECT id, day FROM {{ source('events_raw') }}
{% if is_incremental() %}
WHERE day > (SELECT MAX(day) FROM {{ this }})
{% endif %}
""",
    )
    rc = main(["run", "--project-dir", d, "--database", "cli_inc"], spark=spark)
    assert rc == 0
    assert spark.table("cli_inc.events_inc").count() == 2

    write_src([(1, "2025-01-01"), (2, "2025-01-02"), (3, "2025-01-03")])
    rc = main(["run", "--project-dir", d, "--database", "cli_inc"], spark=spark)
    assert rc == 0
    got = sorted(r["id"] for r in spark.table("cli_inc.events_inc").collect())
    assert got == [1, 2, 3]  # only id=3 appended; 1/2 not duplicated


def test_cli_semantic_layer_query(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('stg_txns')
    dimensions:
      - {name: seg, type: categorical}
    measures:
      - {name: total_amount, agg: sum, expr: amount}
      - {name: n_txns, agg: count}
metrics:
  - {name: revenue, type: simple, measure: total_amount}
  - {name: txn_count, type: simple, measure: n_txns}
  - name: avg_txn
    type: ratio
    type_params: {numerator: revenue, denominator: txn_count}
""",
    )
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_sl")
    capsys.readouterr()
    rc = _run(spark, ["sl", "list", "--project-dir", project_dir], "cli_sl")
    assert rc == 0
    out = capsys.readouterr().out
    assert "revenue (simple)" in out and "avg_txn (ratio)" in out
    rc = _run(
        spark,
        [
            "sl", "query", "--project-dir", project_dir,
            "--metrics", "revenue,avg_txn", "--group-by", "seg",
        ],
        "cli_sl",
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "30.0" in out and "15.0" in out  # seg a: revenue 30, avg 15


def test_cli_test_selection_filters_unit_tests(project_dir, spark):
    _write(
        os.path.join(project_dir, "models", "unit_sel.yml"),
        """
unit_tests:
  - name: will_fail
    model: seg_spend
    given:
      - {input: "ref('stg_txns')", rows: [{txn_id: 1, seg: a, amount: 1.0}]}
      - {input: "ref('seg_names')", rows: [{seg: a, seg_name: Alpha}]}
    expect:
      rows: [{seg: a, seg_name: Alpha, total: 42.0}]
""",
    )
    # Selecting only the staging model excludes seg_spend's failing unit
    # test AND seg_spend's generic test.
    rc = _run(
        spark,
        ["test", "--project-dir", project_dir, "--select", "stg_txns"],
        "cli_tsel",
    )
    assert rc == 0
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    ids = {r["unique_id"] for r in rr["results"]}
    assert all("seg_spend" not in i for i in ids)


def test_cli_semantic_timespine_offset_from_yaml(tmp_path, spark, capsys):
    # The MetricFlow measure-input params (fill_nulls_with /
    # join_to_timespine) and derived offset_window inputs must round-trip
    # from on-disk schema YAML through the CLI sl action — the data has a
    # month gap (Jan, Mar) the spine must synthesize.
    d = str(tmp_path / "spine_proj")
    src = os.path.join(d, "data", "txns_raw")
    spark.createDataFrame(
        [(1, 10.0, "2025-01-05"), (2, 5.0, "2025-03-20")],
        ["txn_id", "amount", "day"],
    ).selectExpr("txn_id", "amount", "CAST(day AS DATE) AS day").write.mode(
        "overwrite"
    ).parquet(src)
    _write(
        os.path.join(d, "dbt_project.yml"),
        "name: spine_proj\nsources:\n  txns_raw: data/txns_raw\n",
    )
    _write(
        os.path.join(d, "models", "txns.sql"),
        "SELECT * FROM {{ source('txns_raw') }}",
    )
    _write(
        os.path.join(d, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('txns')
    dimensions:
      - {name: day, type: time, grain: month}
    measures:
      - {name: total_amount, agg: sum, expr: amount}
metrics:
  - name: rev_filled
    type: simple
    type_params:
      measure: {name: total_amount, fill_nulls_with: 0, join_to_timespine: true}
  - name: mom_delta
    type: derived
    type_params:
      expr: rev_filled - prev_rev
      metrics:
        - name: rev_filled
        - {name: rev_filled, alias: prev_rev, offset_window: 1 month}
""",
    )
    rc = _run(spark, ["run", "--project-dir", d], "cli_spine")
    assert rc == 0
    capsys.readouterr()
    rc = _run(
        spark,
        [
            "sl", "query", "--project-dir", d,
            "--metrics", "rev_filled,mom_delta", "--group-by", "day",
        ],
        "cli_spine",
    )
    assert rc == 0
    out = capsys.readouterr().out
    # Feb synthesized by the spine: rev 0, delta -10; Mar delta reads
    # Feb's filled 0 (time shift), not Jan's 10 (row lag).
    assert "2025-02" in out
    assert "-10.0" in out and "5.0" in out


def test_cli_singular_data_tests(project_dir, spark, capsys):
    # dbt singular tests: tests/*.sql files, each a violations SELECT
    # rendered with ref(); pass iff 0 rows, config() header honors
    # severity like schema tests.
    _write(
        os.path.join(project_dir, "tests", "no_negative_totals.sql"),
        "SELECT * FROM {{ ref('seg_spend') }} WHERE total < 0",
    )
    _write(
        os.path.join(project_dir, "tests", "warn_small_corpus.sql"),
        "{{ config(severity='warn') }}\n"
        "SELECT * FROM {{ ref('seg_spend') }} WHERE total > 1",
    )
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_sing")
    assert rc == 0
    rc = _run(spark, ["test", "--project-dir", project_dir], "cli_sing")
    assert rc == 0  # violations test passes; warn test warns, not errors
    rr = json.load(open(os.path.join(project_dir, "target", "run_results.json")))
    by_id = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert by_id["no_negative_totals__seg_spend"] == "success"
    assert by_id["warn_small_corpus__seg_spend"] == "warn"

    # An error-severity singular test with violations fails the command.
    _write(
        os.path.join(project_dir, "tests", "strict_totals.sql"),
        "SELECT * FROM {{ ref('seg_spend') }} WHERE total > 1",
    )
    rc = _run(spark, ["test", "--project-dir", project_dir], "cli_sing")
    assert rc != 0


def test_cli_singular_test_without_ref_fails_loud(tmp_path, spark):
    d = str(tmp_path / "sing_proj")
    _write(os.path.join(d, "dbt_project.yml"), "name: sing_proj\n")
    _write(
        os.path.join(d, "tests", "orphan.sql"), "SELECT 1 WHERE 1 = 0"
    )
    with pytest.raises(ValueError, match="ref"):
        _run(spark, ["test", "--project-dir", d], "cli_sing2")


def test_cli_macros_dir_and_run_operation(project_dir, spark, capsys):
    # macros/*.sql {% macro %} blocks register as SQL-fragment macros:
    # usable from model SQL (render-time expansion) AND invocable via
    # `run-operation` with YAML kwargs.
    _write(
        os.path.join(project_dir, "macros", "helpers.sql"),
        """
{% macro cents(col) %}CAST({{ col }} * 100 AS BIGINT){% endmacro %}

{% macro seg_rollup(min_total=0) %}
SELECT seg, SUM(total) AS total
FROM {{ ref('seg_spend') }}
WHERE total >= {{ min_total }}
GROUP BY seg
{% endmacro %}
""",
    )
    _write(
        os.path.join(project_dir, "models", "cents_model.sql"),
        "SELECT txn_id, {{ cents('amount') }} AS amount_cents "
        "FROM {{ ref('stg_txns') }}",
    )
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_mac")
    assert rc == 0
    got = {
        r["txn_id"]: r["amount_cents"]
        for r in spark.table("cli_mac.cents_model").collect()
    }
    assert got[1] == 1000  # 10.0 -> 1000 cents via the file macro

    capsys.readouterr()
    rc = _run(
        spark,
        [
            "run-operation", "seg_rollup", "--args", "{min_total: 8}",
            "--project-dir", project_dir,
        ],
        "cli_mac",
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "'seg': 'a'" in out and "30.0" in out
    # seg c (total 7.0) filtered by min_total=8
    assert "'seg': 'c'" not in out

    # unknown macro: loud failure, lists known names
    rc = _run(
        spark,
        ["run-operation", "nope", "--project-dir", project_dir],
        "cli_mac",
    )
    assert rc == 2


def test_cli_init_then_run_then_parse(tmp_path, spark, capsys):
    # init scaffolds a runnable starter project; parse validates without
    # executing; run builds the example model.
    base = str(tmp_path)
    rc = main(["init", "newproj", "--project-dir", base], spark=spark)
    assert rc == 0
    d = os.path.join(base, "newproj")
    assert os.path.exists(os.path.join(d, "dbt_project.yml"))
    rc = _run(spark, ["parse", "--project-dir", d], "cli_init")
    assert rc == 0
    rc = _run(spark, ["run", "--project-dir", d], "cli_init")
    assert rc == 0
    assert spark.table("cli_init.example").collect()[0]["greeting"] == "hello"
    # init refuses to clobber
    rc = main(["init", "newproj", "--project-dir", base], spark=spark)
    assert rc == 2


def test_cli_parse_reports_errors_without_running(project_dir, spark):
    _write(
        os.path.join(project_dir, "models", "broken.sql"),
        "SELECT * FROM {{ ref('does_not_exist') }}",
    )
    rc = _run(spark, ["parse", "--project-dir", project_dir], "cli_parse")
    assert rc == 1
    # parse never materializes anything
    assert not spark.catalog.tableExists("cli_parse.stg_txns")


def test_cli_manifest_carries_semantic_layer(project_dir, spark):
    _write(
        os.path.join(project_dir, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('stg_txns')
    dimensions: [{name: seg, type: categorical}]
    measures: [{name: total_amount, agg: sum, expr: amount}]
metrics:
  - {name: revenue, type: simple, measure: total_amount}
saved_queries:
  - name: seg_rev
    query_params: {metrics: [revenue], group_by: [seg]}
""",
    )
    rc = _run(spark, ["compile", "--project-dir", project_dir], "cli_man")
    assert rc == 0
    man = json.load(open(os.path.join(project_dir, "target", "manifest.json")))
    assert man["semantic_models"]["txn_sem"]["measures"] == ["total_amount"]
    assert man["metrics"]["revenue"] == {"type": "simple", "measure": "total_amount"}
    assert man["saved_queries"]["seg_rev"]["metrics"] == ["revenue"]


def test_cli_show_explain_prints_physical_plan(project_dir, spark, capfd):
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_expl")
    assert rc == 0
    rc = _run(
        spark,
        ["show", "seg_spend", "--explain", "--project-dir", project_dir],
        "cli_expl",
    )
    assert rc == 0
    out = capfd.readouterr().out
    assert "Physical Plan" in out and "Scan" in out
    rc = _run(
        spark,
        [
            "show", "--inline",
            "SELECT seg FROM {{ ref('seg_spend') }} WHERE seg = 'a'",
            "--explain", "--project-dir", project_dir,
        ],
        "cli_expl",
    )
    assert rc == 0
    assert "Physical Plan" in capfd.readouterr().out


def test_cli_sl_validate(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('stg_txns')
    dimensions:
      - {name: seg, type: categorical}
    measures:
      - {name: total_amount, agg: sum, expr: amount}
metrics:
  - {name: revenue, type: simple, measure: total_amount}
  - name: quick_convert
    type: conversion
    type_params:
      conversion_type_params:
        base_measure: total_amount
        conversion_measure: total_amount
        entity: seg
        window: 1 hour
""",
    )
    # The conversion window '1 hour' compiles through _grain_interval
    # (which accepts hour); validate must use the SAME parser, not the
    # stricter cumulative-window one — a false FAIL here contradicted
    # validate's purpose (the metric runs fine in query()).
    rc = _run(spark, ["sl", "validate", "--project-dir", project_dir], "cli_slv")
    assert rc == 0
    assert "OK: 2 metrics" in capsys.readouterr().out

    # Broken definitions: missing measure, reference cycle, bad window,
    # unaliased offset input — all reported in one pass, rc 2.
    _write(
        os.path.join(project_dir, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('stg_txns')
    dimensions:
      - {name: seg, type: categorical}
      - {name: day, type: time, grain: day}
    measures:
      - {name: total_amount, agg: sum, expr: amount}
metrics:
  - {name: revenue, type: simple, measure: total_amount}
  - {name: ghost, type: simple, measure: does_not_exist}
  - {name: loop_a, type: derived, type_params: {expr: "loop_b + 1"}}
  - {name: loop_b, type: derived, type_params: {expr: "loop_a + 1"}}
  - name: bad_window
    type: cumulative
    type_params: {measure: total_amount, window: "3 fortnights"}
  - name: bad_offset
    type: derived
    type_params:
      expr: revenue - x
      metrics:
        - {name: revenue, offset_window: 1 month}
saved_queries:
  - name: sq_bad
    query_params: {metrics: [nope]}
""",
    )
    rc = _run(spark, ["sl", "validate", "--project-dir", project_dir], "cli_slv")
    assert rc == 2
    out = capsys.readouterr().out
    assert "ghost:" in out
    assert "cycle" in out
    assert "bad_window:" in out
    assert "bad_offset:" in out
    assert "sq_bad" in out and "nope" in out
    assert "FAIL revenue" not in out


def test_cli_sl_rollup_builds_and_later_queries_route(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('stg_txns')
    dimensions:
      - {name: seg, type: categorical}
    measures:
      - {name: total_amount, agg: sum, expr: amount}
      - {name: n_txns, agg: count}
metrics:
  - {name: revenue, type: simple, measure: total_amount}
  - {name: txn_count, type: simple, measure: n_txns}
""",
    )
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_slr")
    assert rc == 0
    capsys.readouterr()
    rc = _run(
        spark,
        [
            "sl", "rollup", "--project-dir", project_dir,
            "--name", "seg_ru", "--model", "txn_sem", "--dims", "seg",
        ],
        "cli_slr",
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "seg_ru" in out and "total_amount" in out
    # a SEPARATE invocation (fresh Project + SemanticLayer) still answers
    # correctly — and routes, per the discovery registry
    rc = _run(
        spark,
        [
            "sl", "query", "--project-dir", project_dir,
            "--metrics", "revenue,txn_count", "--group-by", "seg",
        ],
        "cli_slr",
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "30.0" in out  # seg a: 10 + 20
    # discovery registers the persisted spec into a brand-new layer
    from dbt_analytics_spark.plans.semantics import SemanticLayer
    from dbt_analytics_spark.plans import Project as _P

    p = _P(spark, name="slr_check", database="cli_slr")
    import yaml as _yaml

    doc = _yaml.safe_load(open(os.path.join(project_dir, "models", "semantics.yml")))
    p.source_table("stg_txns", spark.table("cli_slr.stg_txns"))
    lay = SemanticLayer(p)
    lay.load(doc)
    assert lay.discover_rollups() >= 1
    lay.query(["revenue"], group_by=["seg"]).count()
    assert lay.last_rollup_used == "seg_ru"


def test_cli_sl_rollup_refresh(project_dir, spark, capsys):
    _write(
        os.path.join(project_dir, "models", "semantics.yml"),
        """
semantic_models:
  - name: txn_sem
    model: ref('stg_txns')
    dimensions:
      - {name: seg, type: categorical}
    measures:
      - {name: total_amount, agg: sum, expr: amount}
metrics:
  - {name: revenue, type: simple, measure: total_amount}
""",
    )
    rc = _run(spark, ["run", "--project-dir", project_dir], "cli_slrf")
    assert rc == 0
    capsys.readouterr()
    rc = _run(
        spark,
        [
            "sl", "rollup", "--project-dir", project_dir,
            "--name", "seg_rf", "--model", "txn_sem", "--dims", "seg",
        ],
        "cli_slrf",
    )
    assert rc == 0
    capsys.readouterr()
    # fresh source: refresh is a no-op; a later invocation refreshes
    # the discovered rollup without rebuilding
    rc = _run(
        spark,
        [
            "sl", "rollup", "--refresh", "--project-dir", project_dir,
            "--name", "seg_rf", "--model", "txn_sem",
        ],
        "cli_slrf",
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "seg_rf" in out and "noop" in out


def test_cli_layout_ensure_list_refresh(spark, tmp_path, capsys, monkeypatch):
    """The `layout` command: ensure builds the family over a data dir,
    list shows catalog-discovered layouts with freshness verdicts,
    refresh reports fresh/refreshed/rebuilt per kind."""
    import shutil as _sh
    import uuid as _uuid

    from dbt_analytics_spark.plans import star_layout

    monkeypatch.setattr(star_layout, "ROUTE_MIN_FACT_BYTES", 0)
    d = str(tmp_path / f"sfcli_{_uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    for t in ("orders", "customer", "nation", "region", "lineitem"):
        _sh.copy(f"/root/testdata/sf0.001/{t}.parquet", d)
    rc = main(["layout", "ensure", "--data", d, "--kind", "all"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "star:" in out and "q1-rollup:" in out
    rc = main(["layout", "list"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert f"covers=orders" in out and "FRESH" in out
    rc = main(["layout", "refresh", "--data", d], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "fresh" in out  # nothing changed: every kind reports fresh
    rc = main(["layout", "refresh"], spark=spark)
    assert rc == 2  # --data required
