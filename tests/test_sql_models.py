"""SQL-string models (plans/sql_models.py): the reference's authoring
surface — config header, ref/source resolution with DAG-edge capture,
{{ this }} / is_incremental() rendering — run as one spark.sql statement.
"""

from __future__ import annotations

import pytest

from dbt_analytics_spark.plans import Project
from dbt_analytics_spark.plans.sql_models import parse_config


def test_parse_config_literals():
    cfg, rest = parse_config(
        "{{ config(materialized='incremental', unique_key='id', tags=('a','b')) }}\nSELECT 1"
    )
    assert cfg == {
        "materialized": "incremental",
        "unique_key": "id",
        "tags": ("a", "b"),
    }
    assert rest.strip() == "SELECT 1"


def test_parse_config_rejects_calls():
    with pytest.raises(ValueError):
        parse_config("{{ config(**kwargs) }} SELECT 1")


def test_sql_model_ref_chain_and_edges(spark):
    p = Project(spark, name="sqlm")
    p.source_table(
        "raw_orders",
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)],
            ["id", "seg", "amount"],
        ),
    )
    p.sql_model(
        """
        {{ config(materialized='table') }}
        SELECT seg, SUM(amount) AS total
        FROM {{ source('raw', 'raw_orders') }}
        GROUP BY seg
        """,
        name="seg_totals",
    )
    p.sql_model(
        """
        SELECT seg FROM {{ ref('seg_totals') }} WHERE total > 12
        """,
        name="big_segs",
    )
    results = {r.node: r.status for r in p.run()}
    assert results["seg_totals"] == "success"
    assert results["big_segs"] == "success"
    # DAG edges captured through the rendered refs.
    assert "seg_totals" in p.nodes["big_segs"].depends_on
    assert "raw_orders" in p.nodes["seg_totals"].depends_on
    got = {r["seg"]: r["total"] for r in spark.table("seg_totals").collect()}
    assert got == {"a": 30.0, "b": 5.0}
    assert [r["seg"] for r in spark.table("big_segs").collect()] == ["a"]


def test_sql_model_incremental_this_block(spark):
    # The classic dbt incremental SQL pattern: first run takes everything,
    # later runs filter to ids beyond MAX(id) in {{ this }}.
    p = Project(spark, name="sqlinc")
    state = {"rows": [(1, "x"), (2, "y")]}
    p.source_table("events_src", spark.createDataFrame(state["rows"], ["id", "v"]))

    sql = """
    {{ config(materialized='incremental', incremental_strategy='append') }}
    SELECT id, v FROM {{ source('events_src') }}
    {% if is_incremental() %}
      WHERE id > (SELECT MAX(id) FROM {{ this }})
    {% endif %}
    """
    p.sql_model(sql, name="inc_sql_t")
    p.run(select="inc_sql_t")
    assert spark.table("inc_sql_t").count() == 2

    # Second run: source now has overlap + one new row; only id=3 appends.
    p2 = Project(spark, name="sqlinc")
    p2.source_table(
        "events_src",
        spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "v"]),
    )
    p2.sql_model(sql, name="inc_sql_t")
    p2.run(select="inc_sql_t")
    got = sorted(r["id"] for r in spark.table("inc_sql_t").collect())
    assert got == [1, 2, 3]


def test_sql_model_versioned_ref(spark):
    p = Project(spark, name="sqlv")

    @p.model(version=1, name="dim")
    def dim_v1(ctx):
        return ctx.spark.createDataFrame([(1, "old")], ["id", "label"])

    @p.model(version=2, name="dim")
    def dim_v2(ctx):
        return ctx.spark.createDataFrame([(1, "new")], ["id", "label"])

    p.sql_model("SELECT label FROM {{ ref('dim', v=1) }}", name="pinned")
    p.sql_model("SELECT label FROM {{ ref('dim') }}", name="latest")
    p.run()
    assert spark.table("pinned").collect()[0]["label"] == "old"
    assert spark.table("latest").collect()[0]["label"] == "new"


def test_sql_model_plan_quality(spark):
    # The rendered spark.sql statement goes through the same Catalyst
    # pipeline as DataFrame models: the filter must reach the scan of the
    # upstream temp view's underlying relation.
    p = Project(spark, name="sqlpq")
    p.source_table(
        "wide_src",
        spark.range(0, 1000).selectExpr("id", "id * 2 AS a", "id * 3 AS b"),
    )
    p.sql_model(
        "SELECT id, a FROM {{ source('wide_src') }} WHERE id < 10",
        name="pruned",
    )
    p.run(select="pruned")
    assert spark.table("pruned").count() == 10


def test_sql_model_matches_workload_dataframe_model(spark):
    # Author the reference's spend_monthly (models/spend_monthly.sql:1-29)
    # AS SQL through the sql_model surface and diff it row-for-row against
    # the DataFrame-built workload model — the authoring surfaces must be
    # interchangeable.
    import datetime as dt

    from dbt_analytics_spark.workload import build_project, fixtures

    p = build_project(
        spark, fixtures.all_sources(spark), run_date=dt.date(2025, 8, 31)
    )
    p.sql_model(
        """
        {{ config(materialized='table') }}
        SELECT CAST(date_trunc('month', date) AS DATE) AS date_period,
               merchant_name, category, subcategory, billing_model,
               spend_nature, discretion, gl_code, account_name, account_id,
               SUM(amount) AS total_spend
        FROM {{ ref('classified_card_transactions') }}
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
        ORDER BY date_period DESC, total_spend ASC
        """,
        name="spend_monthly_sql",
    )
    p.run(select="+spend_monthly +spend_monthly_sql")
    a = sorted(map(tuple, spark.table("spend_monthly").collect()))
    b = sorted(map(tuple, spark.table("spend_monthly_sql").collect()))
    assert a == b and len(a) > 0


def test_sql_model_vars(spark):
    p = Project(spark, name="sqlvars", vars={"min_total": 12})
    p.source_table(
        "v_src", spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "total"])
    )
    p.sql_model(
        "SELECT id FROM {{ source('v_src') }} "
        "WHERE total > {{ var('min_total') }} "
        "AND id < {{ var('max_id', 100) }}",
        name="var_model",
    )
    p.run(select="var_model")
    assert [r["id"] for r in spark.table("var_model").collect()] == [2]

    # ctx.var in Python models + undefined var raises.
    @p.model(name="pyvar")
    def pyvar(ctx):
        assert ctx.var("min_total") == 12
        assert ctx.var("missing", "d") == "d"
        # dbt's var('x', none): an explicit None default is a real default
        # (ADVICE r7 — the old code treated None as "no default" and raised).
        assert ctx.var("missing", None) is None
        with pytest.raises(KeyError):
            ctx.var("missing")
        return ctx.spark.range(1)

    p.run(select="pyvar")


def test_load_sql_models_dir(spark, tmp_path):
    # A dbt-style models/ tree: staging/ + marts/, filename = model name,
    # folder = tag.
    (tmp_path / "staging").mkdir()
    (tmp_path / "marts").mkdir()
    (tmp_path / "staging" / "stg_orders.sql").write_text(
        "{{ config(materialized='view') }}\n"
        "SELECT id, amount FROM {{ source('raw_tbl') }} WHERE amount > 0"
    )
    (tmp_path / "marts" / "order_totals.sql").write_text(
        "SELECT SUM(amount) AS total FROM {{ ref('stg_orders') }}"
    )
    p = Project(spark, name="sqldir")
    p.source_table(
        "raw_tbl",
        spark.createDataFrame([(1, 5.0), (2, -1.0), (3, 7.0)], ["id", "amount"]),
    )
    from dbt_analytics_spark.plans.sql_models import load_sql_models_dir

    names = load_sql_models_dir(p, str(tmp_path))
    assert set(names) == {"stg_orders", "order_totals"}
    assert "staging" in p.nodes["stg_orders"].tags
    assert p.nodes["stg_orders"].materialized == "view"
    p.run()
    assert spark.table("order_totals").collect()[0]["total"] == 12.0
    assert "stg_orders" in p.nodes["order_totals"].depends_on


def test_sql_macros(spark):
    p = Project(spark, name="sqlmac", vars={"fx": 100})
    p.source_table(
        "m_src", spark.createDataFrame([(1, 2.5), (2, 4.0)], ["id", "amt"])
    )

    @p.sql_macro()
    def cents(col):
        return f"CAST({col} * {{{{ var('fx') }}}} AS BIGINT)"

    @p.sql_macro("amounts_rel")
    def amounts_rel():
        return "{{ source('m_src') }}"

    p.sql_model(
        "SELECT id, {{ cents('amt') }} AS amt_cents FROM {{ amounts_rel() }}",
        name="macro_model",
    )
    p.run(select="macro_model")
    got = {r["id"]: r["amt_cents"] for r in spark.table("macro_model").collect()}
    assert got == {1: 250, 2: 400}
    assert "m_src" in p.nodes["macro_model"].depends_on


def test_sql_macro_cycle_raises(spark):
    p = Project(spark, name="sqlcyc")

    @p.sql_macro()
    def a():
        return "{{ b() }}"

    @p.sql_macro()
    def b():
        return "{{ a() }}"

    p.sql_model("SELECT {{ a() }}", name="cyc")
    results = {r.node: r for r in p.run(select="cyc")}
    assert results["cyc"].status == "error"
    assert "converge" in results["cyc"].message


def test_project_query_adhoc(spark):
    p = Project(spark, name="sqladhoc", vars={"cut": 10})
    p.source_table(
        "q_src", spark.createDataFrame([(1, 5.0), (2, 15.0)], ["id", "amt"])
    )
    p.sql_model(
        "SELECT id, amt FROM {{ source('q_src') }}", name="amounts"
    )
    # Before any run: query compiles the unbuilt node.
    pre = p.query(
        "SELECT COUNT(*) AS n FROM {{ ref('amounts') }} WHERE amt > {{ var('cut') }}"
    ).collect()
    assert pre[0]["n"] == 1
    p.run(select="amounts")
    # After the run: resolves from the materialized relation.
    post = p.query("SELECT SUM(amt) AS s FROM {{ ref('amounts') }}").collect()
    assert post[0]["s"] == 20.0


def test_file_macro_backslash_argument_is_literal(tmp_path, spark):
    """A macro argument containing backslashes (regex patterns — the
    dbt_utils idiom) must substitute LITERALLY: a plain-string re.sub
    repl would raise 'bad escape' on '\\d+' and silently inject group
    references on '\\1'."""
    from dbt_analytics_spark.plans.sql_models import load_macros_dir

    p = Project(spark, name="macre")
    d = tmp_path / "macros"
    d.mkdir()
    (d / "m.sql").write_text(
        "{% macro strip(col, pat) %}"
        "regexp_replace({{ col }}, '{{ pat }}', '')"
        "{% endmacro %}"
    )
    assert load_macros_dir(p, str(d)) == ["strip"]
    assert (
        p.sql_macros["strip"]("x", r"\d+")
        == r"regexp_replace(x, '\d+', '')"
    )
    assert (
        p.sql_macros["strip"]("x", r"\1")
        == r"regexp_replace(x, '\1', '')"
    )
