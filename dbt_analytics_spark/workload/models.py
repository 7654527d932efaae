"""The reference workload — 27 models + 4 seeds — re-expressed Spark-first
on the engine (SURVEY.md §2a; build plan §7 phase 2).

Model-by-model reference citations are in each function's docstring. Design
departures from the dbt/Postgres original (all documented in SURVEY.md §7):

- LATERAL ... LIMIT 1 joins → broadcast candidate join + ranking window
  (operators/top1.py). Deterministic tiebreaks added (regex_key /
  merchant_key) where the reference's ordering was incomplete.
- ``date_trunc`` grains are emitted as DATE (PG returns timestamp at
  midnight; same instant, simpler joins).
- ``union`` (DISTINCT) across branches → unionByName + dropDuplicates.
- ``current_date`` → ctx.run_date (injectable clock; FIXTURES.md §C).
- The 500+-arm hand-written merchant CASE (card_merchants_model.sql:2-617)
  is generated programmatically from the merchants seed — same operator
  shape (one giant chained CASE classifying descriptions) driven by data
  instead of copied literals.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.pg import pg_regex_to_java_col
from ..operators.top1 import lateral_top1_udf, top1_per_group
from ..plans import Project
from ..sources.seeds import read_seed_csv

SEEDS_DIR = os.path.join(os.path.dirname(__file__), "seeds")

CARD_NUMBERS = (3221, 4245, 5083, 6823)
BANK_NUMBERS = (3206, 9155)

#: Aggregator-prefix strip (reference: classified_card_transactions.sql:60-66).
AGG_PREFIX = r"^(?:SPO|SQ|EB|PY|TST|SUMUP|ZETTLE)\s*[^A-Za-z0-9]?\s*"


# ---------------------------------------------------------------------------
# Shared expressions
# ---------------------------------------------------------------------------

def clean_type_expr(include_online_payment: bool = False, include_thank_you: bool = False) -> Column:
    """The Sale/Payment classifier CASE.

    Reference: models/card_transactions_model.sql:5-14 (six markers) and the
    slightly wider variant in classified_card_transactions.sql:15-27 (adds
    'Online Payment' and 'Payment Thank You - Web')."""
    payment_like = (
        F.col("description").ilike("%Online Transfer%")
        | F.col("description").ilike("%Edward Jones%")
        | F.col("description").ilike("%JPMorgan Chase%")
        | F.col("description").ilike("%Fedwire%")
        | F.col("description").ilike("%Automatic Payment%")
    )
    if include_online_payment:
        payment_like = payment_like | F.col("description").ilike("%Online Payment%")
    if include_thank_you:
        payment_like = payment_like | F.col("description").ilike("%Payment Thank You - Web%")
    return (
        F.when(F.col("type").isNotNull(), F.col("type"))
        .when(~F.col("card_last4").isin(*CARD_NUMBERS), F.lit("Payment"))
        .when(payment_like, F.lit("Payment"))
        .otherwise(F.lit("Sale"))
    )


def _alpha(c: Column) -> Column:
    return F.lower(F.regexp_replace(c, r"[^A-Za-z0-9]+", " "))


def _nospace(c: Column) -> Column:
    return F.regexp_replace(c, r"\s+", "")


def normalize_description(df: DataFrame) -> DataFrame:
    """The normalization CTE: canonical description variants for matching.

    Reference: classified_card_transactions.sql:33-116 — HTML entity and
    curly-apostrophe cleanup, whitespace collapse, hyphen/slash removal,
    aggregator-prefix strip, trailing-state strip, airline alias expansion,
    alphanumeric + no-space projections."""
    desc_base = F.trim(
        F.regexp_replace(
            F.translate(
                F.regexp_replace(F.col("description"), "&amp;", "&"), "’`", "''"
            ),
            r"\s+",
            " ",
        )
    )
    df = df.withColumn("desc_base", desc_base)
    no_agg = F.regexp_replace(F.col("desc_base"), "(?i)" + AGG_PREFIX, "")
    alias = (
        F.when(
            F.col("desc_base").rlike(r"(?i)^BRITISH A\b"),
            F.regexp_replace(F.col("desc_base"), r"(?i)^BRITISH A\b", "BRITISH AIRWAYS "),
        )
        .when(
            F.col("desc_base").rlike(r"(?i)^AMERICAN AI\b"),
            F.regexp_replace(F.col("desc_base"), r"(?i)^AMERICAN AI\b", "AMERICAN AIRLINES "),
        )
        .when(
            F.col("desc_base").rlike(r"(?i)^UA\s*INFLT\b"),
            F.regexp_replace(F.col("desc_base"), r"(?i)^UA\s*INFLT\b", "UNITED AIRLINES INFLIGHT "),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        df.withColumn("desc_keep", F.col("desc_base"))
        .withColumn("desc_nohyphen", F.regexp_replace("desc_base", r"\s*[-/]\s*", " "))
        .withColumn("desc_noagg", no_agg)
        .withColumn("desc_noagg_nohyphen", F.regexp_replace(no_agg, r"\s*[-/]\s*", " "))
        .withColumn("desc_tail", F.regexp_replace("desc_base", r"(?i)\s*,\s*[A-Z]{2}\s*$", ""))
        .withColumn("desc_alias", alias)
        .withColumn("desc_alpha", _alpha(F.col("desc_base")))
        .withColumn("desc_alpha_noagg", _alpha(no_agg))
        .withColumn("desc_alphanospace", _nospace(_alpha(F.col("desc_base"))))
        .withColumn("desc_alpha_noagg_nospace", _nospace(_alpha(no_agg)))
    )


def _grain_label(grain: str) -> Column:
    return {
        "week": F.weekofyear,
        "month": F.month,
        "quarter": F.quarter,
        "year": F.year,
    }[grain]


# ---------------------------------------------------------------------------
# Project assembly
# ---------------------------------------------------------------------------

def build_project(
    spark,
    sources: dict[str, DataFrame],
    run_date: dt.date = dt.date(2025, 8, 31),
    merchant_case_arms: int | None = None,
) -> Project:
    """Register the full 27-model DAG against the given raw source tables.

    ``sources`` must provide: card_transactions, exercise_log, recipe_log,
    shopping_log, weights (FIXTURES.md §A schemas)."""
    p = Project(spark, name="dbt_analytics", run_date=run_date, threads=8)

    for name, df in sources.items():
        p.source_table(name, df)

    # -- seeds (reference: seeds/*.csv; loaded like SP/.../seeds/helpers.sql
    #    but via distributed CSV read — sources/seeds.py)
    p.seed(
        "merchant_regex",
        read_seed_csv(
            spark,
            os.path.join(SEEDS_DIR, "merchant_regex.csv"),
            column_types={"priority": T.IntegerType(), "pattern_regex": T.StringType()},
        ),
    )
    p.seed("merchants", read_seed_csv(spark, os.path.join(SEEDS_DIR, "merchants.csv")))
    p.seed(
        "merchant_account_map",
        read_seed_csv(
            spark,
            os.path.join(SEEDS_DIR, "merchant_account_map.csv"),
            column_types={
                "is_default": T.StringType(),
                "effective_from": T.StringType(),
                "effective_to": T.StringType(),
            },
        ),
    )
    p.seed("accounts_leaf", read_seed_csv(spark, os.path.join(SEEDS_DIR, "accounts_leaf.csv")))

    # ------------------------------------------------------------------
    @p.model(materialized="table")
    def card_transactions_model(ctx):
        """Cleaning projection (reference: models/card_transactions_model.sql:1-23):
        key/date/amount/card_last4 + clean_type CASE + raw_* renames,
        ordered by amount desc (presentation only)."""
        ct = ctx.source("card_transactions")
        return ct.select(
            "key",
            "date",
            "amount",
            "card_last4",
            clean_type_expr().alias("clean_type"),
            F.col("description").alias("raw_description"),
            F.col("category").alias("raw_category"),
            F.col("type").alias("raw_type"),
        ).orderBy(F.desc("amount"))

    # ------------------------------------------------------------------
    @p.model(materialized="table")
    def card_names_model(ctx):
        """Inline 4-row card dimension via UNION ALL
        (reference: models/card_names_model.sql:1-6)."""
        rows = [
            (3221, "Chase", "Freedom"),
            (6823, "Chase", "Prime"),
            (4245, "Chase", "Sapphire"),
            (5083, "Wells Fargo", "Bilt"),
        ]
        return ctx.spark.createDataFrame(rows, ["card_last4", "bank", "card_name"])

    # ------------------------------------------------------------------
    @p.model(materialized="table")
    def card_merchants_model(ctx):
        """Giant chained-CASE merchant classifier + percent-of-total windows.

        Reference: models/card_merchants_model.sql — a 500+-arm hand-written
        ``ilike`` CASE (:2-617), then sum / sum-over-() cumulative and share
        columns (:618-641). Here the CASE arms are generated from the
        merchants seed (same operator shape, data-driven); the TST* fallback
        arm and 'Uncategorized' else-branch mirror :617-620."""
        ct = ctx.source("card_transactions").filter(clean_type_expr() == "Sale")
        merchants = ctx.ref("merchants").collect()
        names = [r["merchant_name"] for r in merchants]
        if merchant_case_arms is not None:
            names = names[:merchant_case_arms]
        classifier = F.when(
            F.col("description").ilike("TST*%") | F.col("description").ilike("TST-%"),
            F.lit("Restaurants (misc)"),
        )
        for name in names:
            classifier = classifier.when(
                F.col("description").ilike(f"%{name}%"), F.lit(name)
            )
        classifier = classifier.otherwise(F.lit("Uncategorized"))
        agg = ct.groupBy(classifier.alias("merchant_name_modified")).agg(
            F.sum("amount").alias("total_spend")
        )
        w = Window.partitionBy()
        return agg.select(
            "merchant_name_modified",
            "total_spend",
            F.sum("total_spend").over(w).alias("cumulative_spend"),
            (F.col("total_spend") / F.sum("total_spend").over(w)).alias("percent_spend"),
        )

    # ------------------------------------------------------------------
    @p.model(materialized="table")
    def classified_card_transactions(ctx):
        """The boss fight (reference: models/classified_card_transactions.sql).

        card branch: Sale filter (:14-28) → normalization (:33-116) → regex
        best-match lateral (:118-148) → name-containment fallback (:150-185)
        → resolver coalesce (:187-193) → merchants enrichment (:195-202) →
        map_one dedup (:204-221) → accounts_leaf enrichment (:223-245) →
        coalesce defaults (:247-265). Then venmo branch (:269-318) and
        bank-transfer branch (:320-363), combined with `union` (DISTINCT).
        """
        ct = ctx.source("card_transactions")
        base = ct.filter(clean_type_expr(include_online_payment=True, include_thank_you=True) == "Sale")
        norm = normalize_description(base)

        # --- regex best-match (LATERAL LIMIT 1 → broadcast join + window) --
        regex = ctx.ref("merchant_regex").select(
            "regex_key",
            F.col("merchant_key").alias("rx_merchant_key"),
            F.col("pattern_regex").alias("rx_pattern"),
            # match on the Java-dialect translation; rank by the ORIGINAL
            # pattern's length (the reference orders by length(pattern_regex))
            pg_regex_to_java_col("pattern_regex").alias("rx_pattern_java"),
            (
                F.coalesce(F.col("priority"), F.lit(0))
                + F.when(
                    F.col("merchant_key").isin("restaurants_misc", "unknown", "misc"),
                    F.lit(-100000),
                ).otherwise(F.lit(0))
            ).alias("rx_priority"),
        )
        # Matcher strategy (probed at 1M/6M rows, scripts/probe_j3_matchers.py,
        # BENCH_NOTES round 7): the rank order is a property of the PATTERN
        # dim alone (priority/length/key — no per-row values), so the top-1
        # is simply the first match in rank order. The Arrow-batched matcher
        # with per-executor precompiled regexes and early exit measured
        # 0.95 s at 1M rows and 1.1 s at 6M vs 21 s / 138 s for the
        # theta-join+window plan (non-literal rlike recompiles per pair and
        # evaluates all 795 patterns per row). Zero joins/shuffles; payloads
        # attach JVM-side via element_at on literal arrays. The window plan
        # remains lateral_top1_join for dims ranked by per-row values.
        matched = lateral_top1_udf(
            norm,
            regex,
            text_cols=[
                "desc_keep", "desc_nohyphen", "desc_noagg",
                "desc_noagg_nohyphen", "desc_tail", "desc_alias",
            ],
            order_by=[
                F.desc("rx_priority"),
                F.desc(F.length("rx_pattern")),
                F.desc("regex_key"),  # determinism beyond the reference's ordering
            ],
            pattern_col="rx_pattern_java",
            payload_cols=["rx_merchant_key", "rx_pattern", "rx_priority"],
        )

        # --- name-containment fallback (reference :150-185); the merchant
        # variants are plain expressions on the broadcast dim (J4 → exprs) --
        mname = F.col("merchant_name")
        base_name = F.regexp_replace(mname, r"\s*\([^)]*\)\s*", " ")
        fallback_dim = ctx.ref("merchants").select(
            F.col("merchant_key").alias("nf_merchant_key"),
            _alpha(mname).alias("name_alpha"),
            _alpha(base_name).alias("name_base_alpha"),
            _nospace(_alpha(mname)).alias("name_alpha_nospace"),
            _nospace(_alpha(base_name)).alias("name_base_alpha_nospace"),
            F.length(mname).alias("name_len"),
        )
        nf_cond = (
            (F.instr(F.col("desc_alpha_noagg"), F.col("name_alpha")) > 0)
            | (F.instr(F.col("desc_alpha_noagg"), F.col("name_base_alpha")) > 0)
            | (F.instr(F.col("desc_alpha_noagg_nospace"), F.col("name_alpha_nospace")) > 0)
            | (F.instr(F.col("desc_alpha_noagg_nospace"), F.col("name_base_alpha_nospace")) > 0)
        )
        nf_eligible = matched.filter(
            F.col("rx_merchant_key").isNull() | (F.col("rx_merchant_key") == "restaurants_misc")
        )
        nf_candidates = nf_eligible.join(
            F.broadcast(
                fallback_dim.filter(
                    (F.col("name_len") >= 4)
                    & ~F.trim(F.col("name_base_alpha")).isin(
                        "bar", "cafe", "market", "grill", "store", "shop"
                    )
                )
            ),
            on=nf_cond,
            how="inner",
        )
        nf_best = top1_per_group(
            nf_candidates, ["key"], [F.desc("name_len"), F.asc("nf_merchant_key")]
        ).select("key", "nf_merchant_key")
        resolved = (
            matched.join(nf_best, "key", "left")
            .withColumn("merchant_key", F.coalesce("rx_merchant_key", "nf_merchant_key"))
        )

        # --- enrichment joins (reference :195-245) ---
        merchants = ctx.ref("merchants")
        enriched = resolved.join(F.broadcast(merchants), "merchant_key", "left")

        map_one = top1_per_group(
            ctx.ref("merchant_account_map"),
            ["merchant_key"],
            [
                F.desc(F.coalesce(F.col("is_default"), F.lit("TRUE"))),
                F.desc_nulls_last("effective_from"),
                F.desc("account_id"),
            ],
        ).select("merchant_key", "account_id")
        keyed = enriched.join(F.broadcast(map_one), "merchant_key", "left")
        accounts = ctx.ref("accounts_leaf").select(
            "account_id",
            "category",
            "subcategory",
            "billing_model",
            "spend_nature",
            "discretion",
            "gl_code",
            "account_name",
        )
        # base carries its own `category` (raw bank category); the accounts
        # join overrides it in the reference's select — drop the raw one.
        acct = keyed.drop("category").join(F.broadcast(accounts), "account_id", "left")

        card_branch = acct.filter(F.substring("description", 1, 5) != "venmo").select(
            "date",
            "amount",
            "card_last4",
            "description",
            F.coalesce("merchant_key", F.lit("Unknown")).alias("merchant_key"),
            F.coalesce("merchant_name", F.lit("Unknown")).alias("merchant_name"),
            F.coalesce("category", F.lit("Unknown")).alias("category"),
            F.coalesce("subcategory", F.lit("Unknown")).alias("subcategory"),
            F.coalesce("billing_model", F.lit("Unknown")).alias("billing_model"),
            F.coalesce("spend_nature", F.lit("Unknown")).alias("spend_nature"),
            F.coalesce("discretion", F.lit("Unknown")).alias("discretion"),
            F.coalesce("account_id", F.lit("Unknown")).alias("account_id"),
            F.col("gl_code"),
            F.coalesce("account_name", F.lit("Unknown")).alias("account_name"),
        )

        # --- venmo branch (reference :269-318) ---
        v = ct.filter(F.substring("description", 1, 5) == "venmo")
        ffund = F.col("description").ilike("%proto faff surplus seed fund%")
        lorna = F.col("intermediate_key").ilike("%Lorna Kerry%")
        lisa = F.col("intermediate_key").ilike("%Lisa Raich%")
        sofia = F.col("intermediate_key").ilike("%Sofia Mesa%")

        def venmo_case(a, b, c, d, e):
            return (
                F.when(ffund, F.lit(a) if not isinstance(a, int) else F.lit(a))
                .when(lorna, F.lit(b))
                .when(lisa, F.lit(c))
                .when(sofia, F.lit(d))
                .otherwise(F.lit(e))
            )

        venmo_branch = v.select(
            "date",
            "amount",
            F.lit(0).cast("int").alias("card_last4"),
            F.expr("substring(description, 7)").alias("description"),
            F.lit("venmo").alias("merchant_key"),
            F.lit("Venmo").alias("merchant_name"),
            venmo_case("Health & Wellness", "Food & Groceries", "Personal Services", "Entertainment & Events", "Personal Services").alias("category"),
            venmo_case("Fertility", "Groceries", "Personal Care", "Bars & Nightlife", "Personal Care").alias("subcategory"),
            F.lit("one_off").alias("billing_model"),
            F.lit("consumption").alias("spend_nature"),
            F.lit("discretionary").alias("discretion"),
            venmo_case("acct_93cc197271", "acct_a0f371c808", "acct_f183bb01ee", "acct_252a9dfee6", "acct_f183bb01ee").alias("account_id"),
            venmo_case(5550, 5110, 6110, 5730, 6110).cast("int").alias("gl_code"),
            venmo_case("Health—Fertility", "Food—Groceries", "Services—Personal Care", "Entertainment—Bars & Nightlife", "Services—Personal Care").alias("account_name"),
        )

        # --- bank-transfer branch (reference :320-363) ---
        neg, pos = F.col("amount") < 0, F.col("amount") > 0

        def sign_case(a, b):
            return F.when(neg, F.lit(a)).when(pos, F.lit(b))

        bank_branch = (
            ct.filter(
                F.col("card_last4").isin(*BANK_NUMBERS)
                & F.col("description").ilike("%Lorna%")
            )
            .select(
                "date",
                "amount",
                "card_last4",
                "description",
                F.lit("bank_transfer").alias("merchant_key"),
                F.lit("Bank Transfer").alias("merchant_name"),
                sign_case("Travel", "Housing").alias("category"),
                sign_case("Flights", "Rent").alias("subcategory"),
                sign_case("one_off", "subscription").alias("billing_model"),
                F.lit("consumption").alias("spend_nature"),
                sign_case("discretionary", "mandatory").alias("discretion"),
                sign_case("acct_1d9ae90683", "acct_329a7781bd").alias("account_id"),
                sign_case(5310, 5010).cast("int").alias("gl_code"),
                sign_case("Travel—Flights", "Housing-Rent").alias("account_name"),
            )
        )

        # PG `union` is UNION DISTINCT — the semantic trap (SURVEY.md U1).
        return (
            card_branch.unionByName(venmo_branch)
            .unionByName(bank_branch)
            .dropDuplicates()
            .orderBy(F.desc("date"), F.asc("amount"))
        )

    # ------------------------------------------------------------------
    # Flatteners (reference: exercise_log_flattened.sql, recipe_log_flattened.sql)
    # ------------------------------------------------------------------

    @p.model(materialized="table")
    def exercise_log_flattened(ctx):
        """UNNEST(string_to_array) flatten of Target Areas, non-Cardio only
        (reference: models/exercise_log_flattened.sql:1-12)."""
        el = ctx.source("exercise_log")
        return (
            el.filter(F.col("Type") != "Cardio")
            .select(
                F.col("Date"),
                F.col("Exercise Label").alias("Exercise"),
                F.explode(F.split(F.col("Target Areas"), ",")).alias("Target Area"),
            )
            .withColumn("Target Area", F.trim(F.col("Target Area")))
            .orderBy(F.desc_nulls_last("Date"), F.asc("Exercise"))
        )

    @p.model(materialized="table")
    def recipe_log_flattened(ctx):
        """Plants flatten (reference: models/recipe_log_flattened.sql:1-9)."""
        rl = ctx.source("recipe_log")
        return (
            rl.select(
                F.col("Dish"),
                F.explode(F.split(F.col("Plants"), ",")).alias("Plant"),
                F.col("Date"),
            )
            .withColumn("Plant", F.trim(F.col("Plant")))
            .select("Dish", "Plant", "Date")
            .orderBy(F.desc_nulls_last("Date"))
        )

    # ------------------------------------------------------------------
    # Grain families
    # ------------------------------------------------------------------

    def register_spend(grain: str, name: str):
        @p.model(name=name, materialized="table")
        def spend_model(ctx, _grain=grain):
            """Spend rollup at one grain (reference: models/spend_monthly.sql:1-29
            and its daily/weekly/quarterly/yearly siblings — ordinal GROUP BY
            over 10 dims + sum(amount))."""
            ct = ctx.ref("classified_card_transactions")
            return (
                ct.groupBy(
                    F.date_trunc(_grain, F.col("date")).cast("date").alias("date_period"),
                    "merchant_name",
                    "category",
                    "subcategory",
                    "billing_model",
                    "spend_nature",
                    "discretion",
                    "gl_code",
                    "account_name",
                    "account_id",
                )
                .agg(F.sum("amount").alias("total_spend"))
                .orderBy(F.desc("date_period"), F.asc("total_spend"))
            )

    for grain, name in [
        ("day", "spend_daily"),
        ("week", "spend_weekly"),
        ("month", "spend_monthly"),
        ("quarter", "spend_quarterly"),
        ("year", "spend_yearly"),
    ]:
        register_spend(grain, name)

    def register_workouts(grain: str, name: str):
        @p.model(name=name, materialized="table")
        def workouts_model(ctx, _grain=grain):
            """Workout counts per exercise/grain (reference:
            models/workouts_monthly.sql:1-11 and siblings —
            count(distinct Date))."""
            elf = ctx.ref("exercise_log_flattened")
            return (
                elf.groupBy(
                    F.col("Exercise").alias("exercise"),
                    F.date_trunc(_grain, F.col("Date")).cast("date").alias("date_period"),
                )
                .agg(F.countDistinct(F.col("Date")).alias("total_count"))
                .orderBy(F.desc("date_period"), F.desc("total_count"))
            )

    def register_plants(grain: str, name: str):
        @p.model(name=name, materialized="table")
        def plants_model(ctx, _grain=grain):
            """Plant counts per grain (reference: models/plants_monthly.sql:1-12)."""
            rlf = ctx.ref("recipe_log_flattened")
            return (
                rlf.groupBy(
                    F.col("Plant").alias("plant"),
                    F.date_trunc(_grain, F.col("Date")).cast("date").alias("date_period"),
                )
                .agg(F.count(F.lit(1)).alias("total_count"))
                .orderBy(F.desc("date_period"), F.desc("total_count"))
            )

    def register_recipes(grain: str, name: str):
        @p.model(name=name, materialized="table")
        def recipes_model(ctx, _grain=grain):
            """Dish counts per grain from the raw log (reference:
            models/recipes_monthly.sql:1-12 — reads public.recipe_log
            directly, no ref)."""
            rl = ctx.source("recipe_log")
            return (
                rl.groupBy(
                    F.col("Dish").alias("dish"),
                    F.date_trunc(_grain, F.col("Date")).cast("date").alias("date_period"),
                )
                .agg(F.count(F.lit(1)).alias("total_count"))
                .orderBy(F.desc("date_period"), F.desc("total_count"))
            )

    for grain, prefix in [("week", "weekly"), ("month", "monthly"), ("quarter", "quarterly"), ("year", "yearly")]:
        register_workouts(grain, f"workouts_{prefix}")
        register_plants(grain, f"plants_{prefix}")
        register_recipes(grain, f"recipes_{prefix}")

    # ------------------------------------------------------------------
    # Metrics family (date-spine left joins)
    # ------------------------------------------------------------------

    # PG mixes month- and day-intervals freely (`interval '1 month - 1 day'`,
    # metrics_monthly.sql:6); Spark's ANSI intervals are typed, so period
    # ends are computed with add_months/date_add instead.
    GRAIN_SPINES = {
        # grain: (label, spine_start, horizon_expr, period_end_fn)
        "week": ("week", "2022-01-03", "interval 30 days", lambda c: F.date_add(c, 6)),
        "month": ("month", "2022-01-01", "interval 2 months", lambda c: F.date_sub(F.add_months(c, 1), 1)),
        "quarter": ("quarter", "2022-01-01", "interval 6 months", lambda c: F.date_sub(F.add_months(c, 3), 1)),
        "year": ("year", "2022-01-01", "interval 1 year", lambda c: F.date_sub(F.add_months(c, 12), 1)),
    }

    def register_metrics(grain: str, name: str):
        label, spine_start, horizon, period_end = GRAIN_SPINES[grain]

        @p.model(name=name, materialized="table")
        def metrics_model(ctx, _grain=grain, _label=label, _start=spine_start, _hz=horizon, _pe=period_end):
            """Cross-domain metrics at one grain (reference:
            models/metrics_monthly.sql:1-133 and weekly/quarterly/yearly
            siblings): generate_series date spine (:3-10) left-joined to
            exercise (:12-26), weight (:28-37), recipe New/Repeat (:39-63),
            flattened-plants (:65-73), and shopping (:75-85) aggregates,
            bounded by the injectable run date (:131-132)."""
            spark, run_date = ctx.spark, ctx.run_date
            start_col = F.lit(_start).cast("date")
            end_col = F.lit(str(run_date)).cast("date") + F.expr(_hz.replace("interval", "INTERVAL"))
            step = {"week": "interval 1 week", "month": "interval 1 month",
                    "quarter": "interval 3 months", "year": "interval 1 year"}[_grain]
            spine = (
                spark.range(1)
                .select(F.explode(F.sequence(start_col, end_col.cast("date"), F.expr(step))).alias("period_start"))
                .select(
                    F.col("period_start").alias(f"{_label}_start"),
                    _pe(F.col("period_start")).cast("date").alias(f"{_label}_end"),
                    _grain_label(_grain)(F.col("period_start")).cast("int").alias(_label),
                )
            )
            trunc = lambda c: F.date_trunc(_grain, c).cast("date")  # noqa: E731

            el = ctx.source("exercise_log")
            treadmill = F.col("Exercise Label") == "Treadmill"
            strength = F.col("Type").isin("Weights", "Calisthenics")
            exercise = el.groupBy(trunc(F.col("Date")).alias("period")).agg(
                F.countDistinct("Date").alias("total_workouts"),
                F.count(F.when(treadmill, 1)).alias("total_runs"),
                F.sum(F.when(treadmill, F.col("Distance (mi)"))).cast("double").alias("total_miles"),
                F.sum(F.when(treadmill, F.col("Calories"))).cast("double").alias("total_calories"),
                F.sum(F.when(treadmill, F.col("Duration (min)"))).cast("double").alias("total_minutes"),
                F.sum(F.when(strength, F.col("Reps"))).cast("double").alias("total_reps"),
                F.sum(F.when(strength, F.col("Sets"))).cast("double").alias("total_sets"),
            )

            w = ctx.source("weights")
            weight = w.groupBy(trunc(F.col("Measurement Date")).alias("period")).agg(
                F.count(F.lit(1)).alias("total_weight_measurements"),
                F.avg("Weight").alias("average_weight"),
            )

            rl = ctx.source("recipe_log")
            dish_w = Window.partitionBy("Dish").orderBy("Date")
            flags = rl.select(
                F.col("Date").cast("date").alias("recipe_date"),
                F.col("Dish"),
                F.when(
                    F.col("Date") == F.first("Date").over(dish_w), F.lit("New")
                ).otherwise(F.lit("Repeat")).alias("dish_type"),
            )
            # The reference re-joins the raw log on (Date, Dish) — duplicate
            # dish-days multiply, exactly as in PG (metrics_monthly.sql:57-60).
            recipe = (
                flags.join(
                    rl.select(F.col("Date").cast("date").alias("recipe_date"), "Dish", "Cost"),
                    ["recipe_date", "Dish"],
                )
                .groupBy(trunc(F.col("recipe_date")).alias("period"))
                .agg(
                    F.count(F.lit(1)).alias("total_dishes"),
                    F.count(F.when(F.col("dish_type") == "New", 1)).alias("total_new_dishes"),
                    F.count(F.when(F.col("dish_type") == "Repeat", 1)).alias("total_repeat_dishes"),
                    F.sum("Cost").alias("total_cost"),
                )
            )

            rlf = ctx.ref("recipe_log_flattened")
            plants = rlf.groupBy(trunc(F.col("Date")).alias("period")).agg(
                F.countDistinct("Plant").alias("total_unique_plants")
            )

            sl = ctx.source("shopping_log")
            shopping = sl.groupBy(trunc(F.col("Date")).alias("period")).agg(
                F.countDistinct("Ingredient").alias("unique_ingredients_purchased"),
                F.sum("Quantity").alias("total_ingredients_purchased"),
                F.sum("Price").alias("total_ingredients_spend"),
            )

            out = spine
            for metric_df in (exercise, weight, recipe, plants, shopping):
                out = out.join(
                    metric_df, out[f"{_label}_start"] == metric_df["period"], "left"
                ).drop("period")
            return out.filter(F.col(f"{_label}_start") <= F.lit(str(run_date)).cast("date"))

    for grain, prefix in [("week", "weekly"), ("month", "monthly"), ("quarter", "quarterly"), ("year", "yearly")]:
        register_metrics(grain, f"metrics_{prefix}")

    return p
