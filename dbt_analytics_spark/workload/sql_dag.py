"""The full 27-model reference DAG authored on the SQL-STRING surface.

``workload/models.py`` rebuilds the reference project DataFrame-first;
this module authors the SAME 27 models as Jinja-SQL strings through
``Project.sql_model`` (plans/sql_models.py) — the surface a dbt user
actually writes — so the two authoring paths can be diffed
relation-for-relation (tests/test_sql_dag_parity.py, VERDICT r8 item 5).

Authoring notes (Spark-SQL dialect, written from the reference's
semantics — citations per model; NOT transcriptions of the reference
Jinja-SQL, which is Postgres dialect):

- ``LATERAL ... ORDER BY ... LIMIT 1`` (classified_card_transactions.sql
  :118-148) becomes the documented window rewrite IN SQL: left theta-join
  against the pattern dim, ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY
  rank...) = 1``. The DataFrame DAG uses the measured-faster Arrow
  matcher; row-identity of the two matchers is pinned elsewhere, so the
  parity diff ALSO re-proves matcher equivalence end-to-end.
- PG ``\\y`` word boundaries in the seed patterns become Java ``\\b`` via
  the same translation rule as functions/pg.py:pg_regex_to_java_col,
  expressed as a SQL ``regexp_replace`` over the pattern column.
- PG ``union`` = UNION DISTINCT (the U1 trap): spelled ``UNION`` in
  Spark SQL, which is also distinct.
- ``current_date`` → the injectable run date, interpolated as a literal
  at registration (dbt's compile-time var pattern).
- The 500+-arm merchant CASE (card_merchants_model.sql:2-617) is
  generated from the merchants seed at registration time — the Jinja
  ``for``-loop-over-seed idiom — identical arm order to the DataFrame
  model.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import types as T

from ..sources.seeds import read_seed_csv
from .models import AGG_PREFIX, BANK_NUMBERS, CARD_NUMBERS, SEEDS_DIR

SQL_MODEL_NAMES = (
    "card_transactions_model",
    "card_names_model",
    "card_merchants_model",
    "classified_card_transactions",
    "exercise_log_flattened",
    "recipe_log_flattened",
    "spend_daily",
    "spend_weekly",
    "spend_monthly",
    "spend_quarterly",
    "spend_yearly",
    "workouts_weekly",
    "workouts_monthly",
    "workouts_quarterly",
    "workouts_yearly",
    "plants_weekly",
    "plants_monthly",
    "plants_quarterly",
    "plants_yearly",
    "recipes_weekly",
    "recipes_monthly",
    "recipes_quarterly",
    "recipes_yearly",
    "metrics_weekly",
    "metrics_monthly",
    "metrics_quarterly",
    "metrics_yearly",
)


def _esc(s: str) -> str:
    return s.replace("'", "''")


def _sqlre(s: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal: the
    parser eats single backslashes ('\\s' parses as 's'), so every
    backslash must be doubled (verified: '\\\\s+' parses to the regex
    \\s+)."""
    return s.replace("\\", "\\\\")


def _clean_type_sql(extra_markers: bool = False) -> str:
    """The Sale/Payment CASE (card_transactions_model.sql:5-14;
    classified_card_transactions.sql:15-27 adds two markers)."""
    markers = [
        "%Online Transfer%",
        "%Edward Jones%",
        "%JPMorgan Chase%",
        "%Fedwire%",
        "%Automatic Payment%",
    ]
    if extra_markers:
        markers += ["%Online Payment%", "%Payment Thank You - Web%"]
    likes = " OR ".join(f"description ILIKE '{m}'" for m in markers)
    cards = ", ".join(str(c) for c in CARD_NUMBERS)
    return f"""CASE
      WHEN type IS NOT NULL THEN type
      WHEN card_last4 NOT IN ({cards}) THEN 'Payment'
      WHEN {likes} THEN 'Payment'
      ELSE 'Sale' END"""


def sql_model_bodies(
    spark,
    run_date: dt.date = dt.date(2025, 8, 31),
    suffix: str = "_sql",
    merchant_case_arms: int | None = None,
) -> dict[str, str]:
    """Author all 27 reference models as Jinja-SQL body strings, keyed by
    ``<model><suffix>`` in dependency-safe order. The bodies are plain
    text with ``{{ ref(...) }}`` / ``{{ source(...) }}`` templates — the
    same artifact a dbt user keeps in ``models/*.sql`` files — so they
    can be registered on a Project (``register_sql_dag``) OR exported as
    an on-disk CLI project tree (tests/test_cli_reference_project.py)."""

    def R(name: str) -> str:  # intra-DAG ref (suffixed)
        return f"{{{{ ref('{name}{suffix}') }}}}"

    bodies: dict[str, str] = {}

    def m(name: str, sql: str) -> None:
        bodies[f"{name}{suffix}"] = sql

    # -- card_transactions_model (card_transactions_model.sql:1-23) -----
    m(
        "card_transactions_model",
        f"""
SELECT key, date, amount, card_last4,
       {_clean_type_sql()} AS clean_type,
       description AS raw_description,
       category AS raw_category,
       type AS raw_type
FROM {{{{ source('card_transactions') }}}}
ORDER BY amount DESC
""",
    )

    # -- card_names_model (card_names_model.sql:1-6) --------------------
    m(
        "card_names_model",
        """
SELECT CAST(card_last4 AS BIGINT) AS card_last4, bank, card_name
FROM VALUES (3221, 'Chase', 'Freedom'),
            (6823, 'Chase', 'Prime'),
            (4245, 'Chase', 'Sapphire'),
            (5083, 'Wells Fargo', 'Bilt') AS t(card_last4, bank, card_name)
""",
    )

    # -- card_merchants_model (card_merchants_model.sql:2-641) ----------
    # CASE arms generated from the merchants seed at registration — the
    # Jinja for-loop-over-seed idiom; same arm order as the DataFrame DAG.
    seed_names = [
        r["merchant_name"]
        for r in read_seed_csv(
            spark, os.path.join(SEEDS_DIR, "merchants.csv")
        ).collect()
    ]
    if merchant_case_arms is not None:
        seed_names = seed_names[:merchant_case_arms]
    arms = "\n      ".join(
        f"WHEN description ILIKE '%{_esc(n)}%' THEN '{_esc(n)}'"
        for n in seed_names
    )
    m(
        "card_merchants_model",
        f"""
WITH sales AS (
  SELECT * FROM {{{{ source('card_transactions') }}}}
  WHERE {_clean_type_sql()} = 'Sale'
), classified AS (
  SELECT CASE
      WHEN description ILIKE 'TST*%' OR description ILIKE 'TST-%'
        THEN 'Restaurants (misc)'
      {arms}
      ELSE 'Uncategorized' END AS merchant_name_modified,
      amount
  FROM sales
), agg AS (
  SELECT merchant_name_modified, SUM(amount) AS total_spend
  FROM classified GROUP BY 1
)
SELECT merchant_name_modified, total_spend,
       SUM(total_spend) OVER () AS cumulative_spend,
       total_spend / SUM(total_spend) OVER () AS percent_spend
FROM agg
""",
    )

    # -- classified_card_transactions (classified_card_transactions.sql) --
    # Normalization CTE (:33-116), regex lateral as theta-join + window
    # (:118-148), name-containment fallback (:150-185), enrichments
    # (:195-245), venmo (:269-318) and bank (:320-363) branches, UNION
    # distinct (:267,320).
    cards = ", ".join(str(c) for c in CARD_NUMBERS)
    banks = ", ".join(str(c) for c in BANK_NUMBERS)
    alpha = "lower(regexp_replace({0}, '[^A-Za-z0-9]+', ' '))"
    nosp = "regexp_replace({0}, '\\\\s+', '')"
    # f-string expressions cannot contain backslashes (<py3.12): prebuild
    # the fragments that embed regex literals.
    base_name = "regexp_replace(merchant_name, '\\\\s*\\\\([^)]*\\\\)\\\\s*', ' ')"
    name_alpha = alpha.format("merchant_name")
    name_base_alpha = alpha.format(base_name)
    name_alpha_nosp = nosp.format(name_alpha)
    name_base_alpha_nosp = nosp.format(name_base_alpha)
    alpha_desc = alpha.format("desc_base")
    alpha_noagg = alpha.format("desc_noagg")
    nosp_alpha_desc = nosp.format(alpha_desc)
    nosp_alpha_noagg = nosp.format(alpha_noagg)
    desc_tail_re = "'(?i)\\\\s*,\\\\s*[A-Z]{2}\\\\s*$'"
    hyphen_re = "'\\\\s*[-/]\\\\s*'"
    ws_re = "'\\\\s+'"
    # \y→\b PG→Java translation, then the (?i) prefix the DataFrame DAG's
    # matcher applies via re.IGNORECASE / the CASE matcher's '(?i)' prefix.
    y2b = (
        "concat('(?i)', "
        "regexp_replace(regexp_replace(pattern_regex, '\\\\\\\\y', '\\\\\\\\b'), "
        "'\\\\\\\\Y', '\\\\\\\\B'))"
    )
    br_b = "'(?i)^BRITISH A\\\\b'"
    am_b = "'(?i)^AMERICAN AI\\\\b'"
    ua_b = "'(?i)^UA\\\\s*INFLT\\\\b'"
    m(
        "classified_card_transactions",
        f"""
WITH base AS (
  SELECT * FROM {{{{ source('card_transactions') }}}}
  WHERE {_clean_type_sql(extra_markers=True)} = 'Sale'
), norm0 AS (
  SELECT *,
         trim(regexp_replace(translate(regexp_replace(description, '&amp;', '&'),
                                       '’`', "''"),
                             {ws_re}, ' ')) AS desc_base
  FROM base
), norm1 AS (
  SELECT *,
         regexp_replace(desc_base, '(?i){_sqlre(AGG_PREFIX)}', '') AS desc_noagg,
         CASE
           WHEN desc_base RLIKE {br_b}
             THEN regexp_replace(desc_base, {br_b}, 'BRITISH AIRWAYS ')
           WHEN desc_base RLIKE {am_b}
             THEN regexp_replace(desc_base, {am_b}, 'AMERICAN AIRLINES ')
           WHEN desc_base RLIKE {ua_b}
             THEN regexp_replace(desc_base, {ua_b}, 'UNITED AIRLINES INFLIGHT ')
           ELSE CAST(NULL AS STRING) END AS desc_alias
  FROM norm0
), norm AS (
  SELECT *,
         desc_base AS desc_keep,
         regexp_replace(desc_base, {hyphen_re}, ' ') AS desc_nohyphen,
         regexp_replace(desc_noagg, {hyphen_re}, ' ') AS desc_noagg_nohyphen,
         regexp_replace(desc_base, {desc_tail_re}, '') AS desc_tail,
         {alpha_desc} AS desc_alpha,
         {alpha_noagg} AS desc_alpha_noagg,
         {nosp_alpha_desc} AS desc_alphanospace,
         {nosp_alpha_noagg} AS desc_alpha_noagg_nospace
  FROM norm1
), rx AS (
  SELECT regex_key,
         merchant_key AS rx_merchant_key,
         pattern_regex AS rx_pattern,
         {y2b} AS rx_pattern_java,
         coalesce(priority, 0)
           + CASE WHEN merchant_key IN ('restaurants_misc', 'unknown', 'misc')
                  THEN -100000 ELSE 0 END AS rx_priority
  FROM {{{{ ref('merchant_regex') }}}}
), rx_candidates AS (
  SELECT n.*, rx.regex_key, rx.rx_merchant_key, rx.rx_pattern, rx.rx_priority,
         ROW_NUMBER() OVER (
           PARTITION BY n.key
           ORDER BY rx.rx_priority DESC, length(rx.rx_pattern) DESC,
                    rx.regex_key DESC
         ) AS rx_rn
  FROM norm n
  LEFT JOIN rx
    ON n.desc_keep RLIKE rx.rx_pattern_java
    OR n.desc_nohyphen RLIKE rx.rx_pattern_java
    OR n.desc_noagg RLIKE rx.rx_pattern_java
    OR n.desc_noagg_nohyphen RLIKE rx.rx_pattern_java
    OR n.desc_tail RLIKE rx.rx_pattern_java
    OR n.desc_alias RLIKE rx.rx_pattern_java
), matched AS (
  SELECT * FROM rx_candidates WHERE rx_rn = 1
), nf_dim AS (
  SELECT merchant_key AS nf_merchant_key,
         {name_alpha} AS name_alpha,
         {name_base_alpha} AS name_base_alpha,
         {name_alpha_nosp} AS name_alpha_nospace,
         {name_base_alpha_nosp} AS name_base_alpha_nospace,
         length(merchant_name) AS name_len
  FROM {{{{ ref('merchants') }}}}
), nf_best AS (
  SELECT key, nf_merchant_key FROM (
    SELECT e.key, d.nf_merchant_key,
           ROW_NUMBER() OVER (
             PARTITION BY e.key ORDER BY d.name_len DESC, d.nf_merchant_key ASC
           ) AS nf_rn
    FROM matched e
    JOIN nf_dim d
      ON (instr(e.desc_alpha_noagg, d.name_alpha) > 0
          OR instr(e.desc_alpha_noagg, d.name_base_alpha) > 0
          OR instr(e.desc_alpha_noagg_nospace, d.name_alpha_nospace) > 0
          OR instr(e.desc_alpha_noagg_nospace, d.name_base_alpha_nospace) > 0)
    WHERE (e.rx_merchant_key IS NULL OR e.rx_merchant_key = 'restaurants_misc')
      AND d.name_len >= 4
      AND trim(d.name_base_alpha) NOT IN ('bar', 'cafe', 'market', 'grill', 'store', 'shop')
  ) WHERE nf_rn = 1
), resolved AS (
  SELECT mt.*, coalesce(mt.rx_merchant_key, nb.nf_merchant_key) AS merchant_key
  FROM matched mt LEFT JOIN nf_best nb ON mt.key = nb.key
), map_one AS (
  SELECT merchant_key, account_id FROM (
    SELECT merchant_key, account_id,
           ROW_NUMBER() OVER (
             PARTITION BY merchant_key
             ORDER BY coalesce(is_default, 'TRUE') DESC,
                      effective_from DESC NULLS LAST,
                      account_id DESC
           ) AS mo_rn
    FROM {{{{ ref('merchant_account_map') }}}}
  ) WHERE mo_rn = 1
), acct AS (
  SELECT r.date, r.amount, r.card_last4, r.description, r.merchant_key,
         me.merchant_name, mo.account_id,
         al.category, al.subcategory, al.billing_model, al.spend_nature,
         al.discretion, al.gl_code, al.account_name
  FROM resolved r
  LEFT JOIN {{{{ ref('merchants') }}}} me ON r.merchant_key = me.merchant_key
  LEFT JOIN map_one mo ON r.merchant_key = mo.merchant_key
  LEFT JOIN {{{{ ref('accounts_leaf') }}}} al ON mo.account_id = al.account_id
), card_branch AS (
  SELECT date, amount, card_last4, description,
         coalesce(merchant_key, 'Unknown') AS merchant_key,
         coalesce(merchant_name, 'Unknown') AS merchant_name,
         coalesce(category, 'Unknown') AS category,
         coalesce(subcategory, 'Unknown') AS subcategory,
         coalesce(billing_model, 'Unknown') AS billing_model,
         coalesce(spend_nature, 'Unknown') AS spend_nature,
         coalesce(discretion, 'Unknown') AS discretion,
         coalesce(account_id, 'Unknown') AS account_id,
         gl_code,
         coalesce(account_name, 'Unknown') AS account_name
  FROM acct WHERE substring(description, 1, 5) != 'venmo'
), venmo_branch AS (
  SELECT date, amount, CAST(0 AS INT) AS card_last4,
         substring(description, 7) AS description,
         'venmo' AS merchant_key, 'Venmo' AS merchant_name,
         CASE WHEN ffund THEN 'Health & Wellness' WHEN lorna THEN 'Food & Groceries'
              WHEN lisa THEN 'Personal Services' WHEN sofia THEN 'Entertainment & Events'
              ELSE 'Personal Services' END AS category,
         CASE WHEN ffund THEN 'Fertility' WHEN lorna THEN 'Groceries'
              WHEN lisa THEN 'Personal Care' WHEN sofia THEN 'Bars & Nightlife'
              ELSE 'Personal Care' END AS subcategory,
         'one_off' AS billing_model, 'consumption' AS spend_nature,
         'discretionary' AS discretion,
         CASE WHEN ffund THEN 'acct_93cc197271' WHEN lorna THEN 'acct_a0f371c808'
              WHEN lisa THEN 'acct_f183bb01ee' WHEN sofia THEN 'acct_252a9dfee6'
              ELSE 'acct_f183bb01ee' END AS account_id,
         CAST(CASE WHEN ffund THEN 5550 WHEN lorna THEN 5110
              WHEN lisa THEN 6110 WHEN sofia THEN 5730 ELSE 6110 END AS INT) AS gl_code,
         CASE WHEN ffund THEN 'Health—Fertility' WHEN lorna THEN 'Food—Groceries'
              WHEN lisa THEN 'Services—Personal Care'
              WHEN sofia THEN 'Entertainment—Bars & Nightlife'
              ELSE 'Services—Personal Care' END AS account_name
  FROM (
    SELECT *,
           description ILIKE '%proto faff surplus seed fund%' AS ffund,
           intermediate_key ILIKE '%Lorna Kerry%' AS lorna,
           intermediate_key ILIKE '%Lisa Raich%' AS lisa,
           intermediate_key ILIKE '%Sofia Mesa%' AS sofia
    FROM {{{{ source('card_transactions') }}}}
    WHERE substring(description, 1, 5) = 'venmo'
  )
), bank_branch AS (
  SELECT date, amount, card_last4, description,
         'bank_transfer' AS merchant_key, 'Bank Transfer' AS merchant_name,
         CASE WHEN amount < 0 THEN 'Travel' WHEN amount > 0 THEN 'Housing' END AS category,
         CASE WHEN amount < 0 THEN 'Flights' WHEN amount > 0 THEN 'Rent' END AS subcategory,
         CASE WHEN amount < 0 THEN 'one_off' WHEN amount > 0 THEN 'subscription' END AS billing_model,
         'consumption' AS spend_nature,
         CASE WHEN amount < 0 THEN 'discretionary' WHEN amount > 0 THEN 'mandatory' END AS discretion,
         CASE WHEN amount < 0 THEN 'acct_1d9ae90683' WHEN amount > 0 THEN 'acct_329a7781bd' END AS account_id,
         CAST(CASE WHEN amount < 0 THEN 5310 WHEN amount > 0 THEN 5010 END AS INT) AS gl_code,
         CASE WHEN amount < 0 THEN 'Travel—Flights' WHEN amount > 0 THEN 'Housing-Rent' END AS account_name
  FROM {{{{ source('card_transactions') }}}}
  WHERE card_last4 IN ({banks}) AND description ILIKE '%Lorna%'
)
SELECT * FROM card_branch
UNION
SELECT * FROM venmo_branch
UNION
SELECT * FROM bank_branch
ORDER BY date DESC, amount ASC
""",
    )

    # -- flatteners ------------------------------------------------------
    m(
        "exercise_log_flattened",
        """
SELECT `Date`, `Exercise Label` AS `Exercise`, trim(ta) AS `Target Area`
FROM {{ source('exercise_log') }}
LATERAL VIEW explode(split(`Target Areas`, ',')) t AS ta
WHERE `Type` != 'Cardio'
ORDER BY `Date` DESC NULLS LAST, `Exercise` ASC
""",
    )
    m(
        "recipe_log_flattened",
        """
SELECT `Dish`, trim(pl) AS `Plant`, `Date`
FROM {{ source('recipe_log') }}
LATERAL VIEW explode(split(`Plants`, ',')) t AS pl
ORDER BY `Date` DESC NULLS LAST
""",
    )

    # -- grain families --------------------------------------------------
    for grain, name in [
        ("day", "spend_daily"),
        ("week", "spend_weekly"),
        ("month", "spend_monthly"),
        ("quarter", "spend_quarterly"),
        ("year", "spend_yearly"),
    ]:
        m(
            name,
            f"""
SELECT CAST(date_trunc('{grain}', date) AS DATE) AS date_period,
       merchant_name, category, subcategory, billing_model, spend_nature,
       discretion, gl_code, account_name, account_id,
       SUM(amount) AS total_spend
FROM {R('classified_card_transactions')}
GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
ORDER BY date_period DESC, total_spend ASC
""",
        )

    for grain, prefix in [
        ("week", "weekly"),
        ("month", "monthly"),
        ("quarter", "quarterly"),
        ("year", "yearly"),
    ]:
        m(
            f"workouts_{prefix}",
            f"""
SELECT `Exercise` AS exercise,
       CAST(date_trunc('{grain}', `Date`) AS DATE) AS date_period,
       COUNT(DISTINCT `Date`) AS total_count
FROM {R('exercise_log_flattened')}
GROUP BY 1, 2 ORDER BY date_period DESC, total_count DESC
""",
        )
        m(
            f"plants_{prefix}",
            f"""
SELECT `Plant` AS plant,
       CAST(date_trunc('{grain}', `Date`) AS DATE) AS date_period,
       COUNT(*) AS total_count
FROM {R('recipe_log_flattened')}
GROUP BY 1, 2 ORDER BY date_period DESC, total_count DESC
""",
        )
        m(
            f"recipes_{prefix}",
            f"""
SELECT `Dish` AS dish,
       CAST(date_trunc('{grain}', `Date`) AS DATE) AS date_period,
       COUNT(*) AS total_count
FROM {{{{ source('recipe_log') }}}}
GROUP BY 1, 2 ORDER BY date_period DESC, total_count DESC
""",
        )

    # -- metrics family (metrics_monthly.sql:1-133 and siblings) ---------
    rd = str(run_date)
    grain_spec = {
        "week": ("week", "2022-01-03", "INTERVAL 30 DAYS", "INTERVAL 1 WEEK",
                 "date_add(period_start, 6)", "weekofyear(period_start)"),
        "month": ("month", "2022-01-01", "INTERVAL 2 MONTHS", "INTERVAL 1 MONTH",
                  "date_sub(add_months(period_start, 1), 1)", "month(period_start)"),
        "quarter": ("quarter", "2022-01-01", "INTERVAL 6 MONTHS", "INTERVAL 3 MONTHS",
                    "date_sub(add_months(period_start, 3), 1)", "quarter(period_start)"),
        "year": ("year", "2022-01-01", "INTERVAL 1 YEAR", "INTERVAL 1 YEAR",
                 "date_sub(add_months(period_start, 12), 1)", "year(period_start)"),
    }
    for grain, prefix in [
        ("week", "weekly"),
        ("month", "monthly"),
        ("quarter", "quarterly"),
        ("year", "yearly"),
    ]:
        label, start, hz, step, pend, glabel = grain_spec[grain]
        tr = f"CAST(date_trunc('{grain}', {{0}}) AS DATE)"
        m(
            f"metrics_{prefix}",
            f"""
WITH spine AS (
  SELECT period_start AS {label}_start,
         CAST({pend} AS DATE) AS {label}_end,
         CAST({glabel} AS INT) AS {label}
  FROM (
    SELECT explode(sequence(DATE'{start}',
                            CAST(DATE'{rd}' + {hz} AS DATE),
                            {step})) AS period_start
  )
), exercise AS (
  SELECT {tr.format('`Date`')} AS period,
         COUNT(DISTINCT `Date`) AS total_workouts,
         COUNT(CASE WHEN `Exercise Label` = 'Treadmill' THEN 1 END) AS total_runs,
         CAST(SUM(CASE WHEN `Exercise Label` = 'Treadmill' THEN `Distance (mi)` END) AS DOUBLE) AS total_miles,
         CAST(SUM(CASE WHEN `Exercise Label` = 'Treadmill' THEN `Calories` END) AS DOUBLE) AS total_calories,
         CAST(SUM(CASE WHEN `Exercise Label` = 'Treadmill' THEN `Duration (min)` END) AS DOUBLE) AS total_minutes,
         CAST(SUM(CASE WHEN `Type` IN ('Weights', 'Calisthenics') THEN `Reps` END) AS DOUBLE) AS total_reps,
         CAST(SUM(CASE WHEN `Type` IN ('Weights', 'Calisthenics') THEN `Sets` END) AS DOUBLE) AS total_sets
  FROM {{{{ source('exercise_log') }}}} GROUP BY 1
), weight AS (
  SELECT {tr.format('`Measurement Date`')} AS period,
         COUNT(*) AS total_weight_measurements,
         AVG(`Weight`) AS average_weight
  FROM {{{{ source('weights') }}}} GROUP BY 1
), flags AS (
  SELECT CAST(`Date` AS DATE) AS recipe_date, `Dish`,
         CASE WHEN `Date` = FIRST_VALUE(`Date`) OVER (PARTITION BY `Dish` ORDER BY `Date`)
              THEN 'New' ELSE 'Repeat' END AS dish_type
  FROM {{{{ source('recipe_log') }}}}
), recipe AS (
  SELECT {tr.format('f.recipe_date')} AS period,
         COUNT(*) AS total_dishes,
         COUNT(CASE WHEN f.dish_type = 'New' THEN 1 END) AS total_new_dishes,
         COUNT(CASE WHEN f.dish_type = 'Repeat' THEN 1 END) AS total_repeat_dishes,
         SUM(r.`Cost`) AS total_cost
  FROM flags f
  JOIN (SELECT CAST(`Date` AS DATE) AS recipe_date, `Dish`, `Cost`
        FROM {{{{ source('recipe_log') }}}}) r
    ON f.recipe_date = r.recipe_date AND f.`Dish` = r.`Dish`
  GROUP BY 1
), plants AS (
  SELECT {tr.format('`Date`')} AS period,
         COUNT(DISTINCT `Plant`) AS total_unique_plants
  FROM {R('recipe_log_flattened')} GROUP BY 1
), shopping AS (
  SELECT {tr.format('`Date`')} AS period,
         COUNT(DISTINCT `Ingredient`) AS unique_ingredients_purchased,
         SUM(`Quantity`) AS total_ingredients_purchased,
         SUM(`Price`) AS total_ingredients_spend
  FROM {{{{ source('shopping_log') }}}} GROUP BY 1
)
SELECT s.{label}_start, s.{label}_end, s.{label},
       e.total_workouts, e.total_runs, e.total_miles, e.total_calories,
       e.total_minutes, e.total_reps, e.total_sets,
       w.total_weight_measurements, w.average_weight,
       r.total_dishes, r.total_new_dishes, r.total_repeat_dishes, r.total_cost,
       pl.total_unique_plants,
       sh.unique_ingredients_purchased, sh.total_ingredients_purchased,
       sh.total_ingredients_spend
FROM spine s
LEFT JOIN exercise e ON s.{label}_start = e.period
LEFT JOIN weight w ON s.{label}_start = w.period
LEFT JOIN recipe r ON s.{label}_start = r.period
LEFT JOIN plants pl ON s.{label}_start = pl.period
LEFT JOIN shopping sh ON s.{label}_start = sh.period
WHERE s.{label}_start <= DATE'{rd}'
""",
        )

    assert sorted(
        n[: -len(suffix)] if suffix else n for n in bodies
    ) == sorted(SQL_MODEL_NAMES)
    return bodies


def register_sql_dag(
    p,
    run_date: dt.date = dt.date(2025, 8, 31),
    suffix: str = "_sql",
    merchant_case_arms: int | None = None,
) -> list[str]:
    """Register all 27 reference models as SQL-string models named
    ``<model><suffix>`` on an existing Project (which must already carry
    the raw sources and the four seeds — ``workload.build_project`` does).
    Returns the registered names."""
    bodies = sql_model_bodies(
        p.spark, run_date=run_date, suffix=suffix,
        merchant_case_arms=merchant_case_arms,
    )
    for name, sql in bodies.items():
        p.sql_model(
            f"{{{{ config(materialized='table') }}}}\n{sql}", name=name
        )
    return list(bodies)
