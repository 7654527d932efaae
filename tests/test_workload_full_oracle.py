"""End-to-end cross-engine oracle for the boss model.

The full ``classified_card_transactions`` output — card branch (regex
lateral + name-containment fallback + enrichment), venmo branch, bank
branch, and the final UNION-DISTINCT — is recomputed in DuckDB from the
reference SQL's semantics (models/classified_card_transactions.sql:14-363)
and compared row-for-row/value-for-value against the Spark model.

RE2 (DuckDB) lacks lookahead, which PG and Java both have, so the 5
lookahead regex patterns are excluded from BOTH engines (the comparison
validates the whole pipeline, which is regex-set-agnostic; the rx-stage
test in test_workload.py covers the same exclusion rationale).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_analytics_spark.functions.pg import pg_regex_to_java
from dbt_analytics_spark.sources.seeds import read_seed_csv
from dbt_analytics_spark.workload import build_project, fixtures
from dbt_analytics_spark.workload.models import SEEDS_DIR

from .conftest import assert_frames_match

RUN_DATE = dt.date(2025, 8, 31)


@pytest.fixture(scope="module")
def sources(spark):
    return fixtures.all_sources(spark)


def _pdf_dates(pdf: pd.DataFrame, cols: tuple[str, ...] = ("date",)) -> pd.DataFrame:
    for c in cols:
        if c in pdf.columns:
            pdf[c] = pd.to_datetime(pdf[c])
    return pdf


_CCT_SQL = r"""
WITH base AS (           -- Sale filter, wide clean_type (:14-28)
  SELECT * FROM ct
  WHERE (CASE WHEN type IS NOT NULL THEN type
              WHEN card_last4 NOT IN (3221, 4245, 5083, 6823) THEN 'Payment'
              WHEN description ILIKE '%Online Transfer%'
                OR description ILIKE '%Edward Jones%'
                OR description ILIKE '%JPMorgan Chase%'
                OR description ILIKE '%Fedwire%'
                OR description ILIKE '%Automatic Payment%'
                OR description ILIKE '%Online Payment%'
                OR description ILIKE '%Payment Thank You - Web%' THEN 'Payment'
              ELSE 'Sale' END) = 'Sale'
),
norm0 AS (               -- normalization CTE (:33-116)
  SELECT *,
         trim(regexp_replace(
           translate(regexp_replace(description, '&amp;', '&', 'g'), '’`', $$''$$),
           '\s+', ' ', 'g')) AS desc_base
  FROM base
),
norm1 AS (
  SELECT *,
         regexp_replace(desc_base,
           '(?i)^(?:SPO|SQ|EB|PY|TST|SUMUP|ZETTLE)\s*[^A-Za-z0-9]?\s*', '') AS no_agg
  FROM norm0
),
norm AS (
  SELECT key, date, amount, card_last4, description, intermediate_key,
         desc_base AS desc_keep,
         regexp_replace(desc_base, '\s*[-/]\s*', ' ', 'g') AS desc_nohyphen,
         no_agg AS desc_noagg,
         regexp_replace(no_agg, '\s*[-/]\s*', ' ', 'g') AS desc_noagg_nohyphen,
         regexp_replace(desc_base, '(?i)\s*,\s*[A-Z]{2}\s*$', '') AS desc_tail,
         CASE WHEN regexp_matches(desc_base, '(?i)^BRITISH A\b')
                THEN regexp_replace(desc_base, '(?i)^BRITISH A\b', 'BRITISH AIRWAYS ')
              WHEN regexp_matches(desc_base, '(?i)^AMERICAN AI\b')
                THEN regexp_replace(desc_base, '(?i)^AMERICAN AI\b', 'AMERICAN AIRLINES ')
              WHEN regexp_matches(desc_base, '(?i)^UA\s*INFLT\b')
                THEN regexp_replace(desc_base, '(?i)^UA\s*INFLT\b', 'UNITED AIRLINES INFLIGHT ')
              ELSE NULL END AS desc_alias,
         lower(regexp_replace(no_agg, '[^A-Za-z0-9]+', ' ', 'g')) AS desc_alpha_noagg,
         regexp_replace(lower(regexp_replace(no_agg, '[^A-Za-z0-9]+', ' ', 'g')),
                        '\s+', '', 'g') AS desc_alpha_noagg_nospace
  FROM norm1
),
rx AS (                  -- regex best-match lateral (:118-148)
  SELECT n.key, mr.rx_merchant_key
  FROM norm n
  LEFT JOIN LATERAL (
    SELECT r.merchant_key AS rx_merchant_key
    FROM merchant_regex r
    WHERE regexp_matches(n.desc_keep, r.pattern_java, 'i')
       OR regexp_matches(n.desc_nohyphen, r.pattern_java, 'i')
       OR regexp_matches(n.desc_noagg, r.pattern_java, 'i')
       OR regexp_matches(n.desc_noagg_nohyphen, r.pattern_java, 'i')
       OR regexp_matches(n.desc_tail, r.pattern_java, 'i')
       OR (n.desc_alias IS NOT NULL AND regexp_matches(n.desc_alias, r.pattern_java, 'i'))
    ORDER BY (COALESCE(r.priority, 0)
              + CASE WHEN r.merchant_key IN ('restaurants_misc','unknown','misc')
                     THEN -100000 ELSE 0 END) DESC,
             LENGTH(r.pattern_regex) DESC, r.regex_key DESC
    LIMIT 1
  ) mr ON TRUE
),
matched AS (
  SELECT n.*, rx.rx_merchant_key FROM norm n JOIN rx USING (key)
),
merchants_dim AS (       -- name-containment fallback dim (:150-185)
  SELECT merchant_key AS nf_merchant_key,
         lower(regexp_replace(merchant_name, '[^A-Za-z0-9]+', ' ', 'g')) AS name_alpha,
         lower(regexp_replace(regexp_replace(merchant_name, '\s*\([^)]*\)\s*', ' ', 'g'),
                              '[^A-Za-z0-9]+', ' ', 'g')) AS name_base_alpha,
         regexp_replace(lower(regexp_replace(merchant_name, '[^A-Za-z0-9]+', ' ', 'g')),
                        '\s+', '', 'g') AS name_alpha_nospace,
         regexp_replace(lower(regexp_replace(
             regexp_replace(merchant_name, '\s*\([^)]*\)\s*', ' ', 'g'),
             '[^A-Za-z0-9]+', ' ', 'g')), '\s+', '', 'g') AS name_base_alpha_nospace,
         LENGTH(merchant_name) AS name_len
  FROM merchants
),
nf AS (
  SELECT m.key, nb.nf_merchant_key
  FROM matched m
  LEFT JOIN LATERAL (
    SELECT d.nf_merchant_key
    FROM merchants_dim d
    WHERE d.name_len >= 4
      AND trim(d.name_base_alpha) NOT IN ('bar','cafe','market','grill','store','shop')
      AND (strpos(m.desc_alpha_noagg, d.name_alpha) > 0
        OR strpos(m.desc_alpha_noagg, d.name_base_alpha) > 0
        OR strpos(m.desc_alpha_noagg_nospace, d.name_alpha_nospace) > 0
        OR strpos(m.desc_alpha_noagg_nospace, d.name_base_alpha_nospace) > 0)
    ORDER BY d.name_len DESC, d.nf_merchant_key ASC
    LIMIT 1
  ) nb ON TRUE
  WHERE m.rx_merchant_key IS NULL OR m.rx_merchant_key = 'restaurants_misc'
),
resolved AS (            -- resolver coalesce (:187-193)
  SELECT m.*, COALESCE(m.rx_merchant_key, nf.nf_merchant_key) AS merchant_key
  FROM matched m LEFT JOIN nf ON nf.key = m.key
),
map_one AS (             -- account-map dedup (:204-221)
  SELECT merchant_key, account_id FROM (
    SELECT merchant_key, account_id,
           ROW_NUMBER() OVER (
             PARTITION BY merchant_key
             ORDER BY COALESCE(is_default, 'TRUE') DESC,
                      effective_from DESC NULLS LAST,
                      account_id DESC) AS rn
    FROM merchant_account_map
  ) WHERE rn = 1
),
card_branch AS (         -- enrichment + defaults (:195-265)
  SELECT r.date, r.amount, r.card_last4, r.description,
         COALESCE(r.merchant_key, 'Unknown') AS merchant_key,
         COALESCE(me.merchant_name, 'Unknown') AS merchant_name,
         COALESCE(a.category, 'Unknown') AS category,
         COALESCE(a.subcategory, 'Unknown') AS subcategory,
         COALESCE(a.billing_model, 'Unknown') AS billing_model,
         COALESCE(a.spend_nature, 'Unknown') AS spend_nature,
         COALESCE(a.discretion, 'Unknown') AS discretion,
         COALESCE(mo.account_id, 'Unknown') AS account_id,
         a.gl_code AS gl_code,
         COALESCE(a.account_name, 'Unknown') AS account_name
  FROM resolved r
  LEFT JOIN merchants me ON me.merchant_key = r.merchant_key
  LEFT JOIN map_one mo ON mo.merchant_key = r.merchant_key
  LEFT JOIN accounts_leaf a ON a.account_id = mo.account_id
  WHERE substring(r.description, 1, 5) != 'venmo'
),
venmo_branch AS (        -- (:269-318)
  SELECT date, amount, CAST(0 AS INTEGER) AS card_last4,
         substring(description, 7) AS description,
         'venmo' AS merchant_key, 'Venmo' AS merchant_name,
         CASE WHEN description ILIKE '%proto faff surplus seed fund%' THEN 'Health & Wellness'
              WHEN intermediate_key ILIKE '%Lorna Kerry%' THEN 'Food & Groceries'
              WHEN intermediate_key ILIKE '%Lisa Raich%' THEN 'Personal Services'
              WHEN intermediate_key ILIKE '%Sofia Mesa%' THEN 'Entertainment & Events'
              ELSE 'Personal Services' END AS category,
         CASE WHEN description ILIKE '%proto faff surplus seed fund%' THEN 'Fertility'
              WHEN intermediate_key ILIKE '%Lorna Kerry%' THEN 'Groceries'
              WHEN intermediate_key ILIKE '%Lisa Raich%' THEN 'Personal Care'
              WHEN intermediate_key ILIKE '%Sofia Mesa%' THEN 'Bars & Nightlife'
              ELSE 'Personal Care' END AS subcategory,
         'one_off' AS billing_model,
         'consumption' AS spend_nature,
         'discretionary' AS discretion,
         CASE WHEN description ILIKE '%proto faff surplus seed fund%' THEN 'acct_93cc197271'
              WHEN intermediate_key ILIKE '%Lorna Kerry%' THEN 'acct_a0f371c808'
              WHEN intermediate_key ILIKE '%Lisa Raich%' THEN 'acct_f183bb01ee'
              WHEN intermediate_key ILIKE '%Sofia Mesa%' THEN 'acct_252a9dfee6'
              ELSE 'acct_f183bb01ee' END AS account_id,
         CAST(CASE WHEN description ILIKE '%proto faff surplus seed fund%' THEN 5550
                   WHEN intermediate_key ILIKE '%Lorna Kerry%' THEN 5110
                   WHEN intermediate_key ILIKE '%Lisa Raich%' THEN 6110
                   WHEN intermediate_key ILIKE '%Sofia Mesa%' THEN 5730
                   ELSE 6110 END AS INTEGER) AS gl_code,
         CASE WHEN description ILIKE '%proto faff surplus seed fund%' THEN 'Health—Fertility'
              WHEN intermediate_key ILIKE '%Lorna Kerry%' THEN 'Food—Groceries'
              WHEN intermediate_key ILIKE '%Lisa Raich%' THEN 'Services—Personal Care'
              WHEN intermediate_key ILIKE '%Sofia Mesa%' THEN 'Entertainment—Bars & Nightlife'
              ELSE 'Services—Personal Care' END AS account_name
  FROM ct WHERE substring(description, 1, 5) = 'venmo'
),
bank_branch AS (         -- (:320-363)
  SELECT date, amount, card_last4, description,
         'bank_transfer' AS merchant_key, 'Bank Transfer' AS merchant_name,
         CASE WHEN amount < 0 THEN 'Travel' WHEN amount > 0 THEN 'Housing' END AS category,
         CASE WHEN amount < 0 THEN 'Flights' WHEN amount > 0 THEN 'Rent' END AS subcategory,
         CASE WHEN amount < 0 THEN 'one_off' WHEN amount > 0 THEN 'subscription' END AS billing_model,
         'consumption' AS spend_nature,
         CASE WHEN amount < 0 THEN 'discretionary' WHEN amount > 0 THEN 'mandatory' END AS discretion,
         CASE WHEN amount < 0 THEN 'acct_1d9ae90683' WHEN amount > 0 THEN 'acct_329a7781bd' END AS account_id,
         CAST(CASE WHEN amount < 0 THEN 5310 WHEN amount > 0 THEN 5010 END AS INTEGER) AS gl_code,
         CASE WHEN amount < 0 THEN 'Travel—Flights' WHEN amount > 0 THEN 'Housing-Rent' END AS account_name
  FROM ct
  WHERE card_last4 IN (3206, 9155) AND description ILIKE '%Lorna%'
)
SELECT * FROM card_branch
UNION
SELECT * FROM venmo_branch
UNION
SELECT * FROM bank_branch
"""


@pytest.fixture(scope="module")
def cct_setup(spark, sources):
    """Shared cross-engine rig: the Spark project compiled against a
    lookahead-free regex seed + a DuckDB connection with identical frames."""
    regex_full = read_seed_csv(
        spark,
        os.path.join(SEEDS_DIR, "merchant_regex.csv"),
        column_types={"priority": T.IntegerType(), "pattern_regex": T.StringType()},
    )
    regex_filtered = regex_full.filter(~F.col("pattern_regex").contains("(?!"))

    p = build_project(spark, sources, run_date=RUN_DATE)
    p.seed("merchant_regex", regex_filtered)  # re-register pre-compile

    ct = _pdf_dates(sources["card_transactions"].toPandas())
    ct["amount"] = ct["amount"].astype(float)
    regex_pdf = regex_filtered.toPandas()
    regex_pdf["pattern_java"] = regex_pdf["pattern_regex"].map(pg_regex_to_java)

    con = duckdb.connect()
    con.register("ct", ct)
    con.register("merchant_regex", regex_pdf)
    con.register("merchants", p.compile_node("merchants").toPandas())
    con.register("accounts_leaf", p.compile_node("accounts_leaf").toPandas())
    con.register("merchant_account_map", p.compile_node("merchant_account_map").toPandas())
    # Materialize the boss-model oracle once: the regex lateral dominates
    # runtime and every dependent diff reuses the same rows.
    con.execute(f"CREATE TEMP TABLE cct AS {_CCT_SQL}")
    yield p, con
    con.close()


def test_classified_card_transactions_full_duckdb_diff(cct_setup):
    p, con = cct_setup
    spark_pdf = p.compile_node("classified_card_transactions").toPandas()
    oracle_pdf = con.execute("SELECT * FROM cct").fetchdf()
    assert len(spark_pdf) > 400, "fixture should produce a substantial output"
    assert_frames_match(spark_pdf, oracle_pdf, "classified_card_transactions")


def test_spend_rollups_full_duckdb_diff(cct_setup):
    # The rollup family consumes the boss model; diff two grains end-to-end
    # so the aggregate layer is cross-engine-verified too. Sums re-cast to
    # DECIMAL(12,2) so both engines aggregate exactly (float sums are
    # order-dependent).
    p, con = cct_setup
    dims = ("merchant_name, category, subcategory, billing_model, "
            "spend_nature, discretion, gl_code, account_name, account_id")
    for grain in ("month", "year"):
        name = {"month": "spend_monthly", "year": "spend_yearly"}[grain]
        spark_pdf = p.compile_node(name).toPandas()
        oracle_pdf = con.execute(f"""
SELECT CAST(date_trunc('{grain}', date) AS DATE) AS date_period, {dims},
       SUM(CAST(amount AS DECIMAL(12,2))) AS total_spend
FROM cct
GROUP BY ALL
""").fetchdf()
        assert len(spark_pdf) > 100
        assert_frames_match(spark_pdf, oracle_pdf, name)
