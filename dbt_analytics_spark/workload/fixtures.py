"""Deterministic fixture generators for the workload's five raw warehouse
tables (FIXTURES.md §A). The reference reads these as pre-existing Postgres
tables (``public.card_transactions`` etc. — SURVEY.md §1 'Raw inputs'); here
they are generated with a seeded RNG so workload tests are reproducible.

Column names are kept VERBATIM including spaces/parentheses/mixed case
(``"Distance (mi)"``, ``"Exercise Label"``) — the models reference them
quoted (reference: models/metrics_monthly.sql:15-21).
"""

from __future__ import annotations

import csv
import datetime as dt
import os
import random
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEEDS_DIR = os.path.join(os.path.dirname(__file__), "seeds")

CARD_NUMBERS = [3221, 4245, 5083, 6823]
BANK_NUMBERS = [3206, 9155]

PAYMENT_MARKERS = [
    "Online Transfer to savings",
    "Edward Jones brokerage",
    "JPMorgan Chase credit",
    "Fedwire outgoing",
    "Automatic Payment - thank you",
    "Payment Thank You - Web",
]

VENMO_PEOPLE = ["Lorna Kerry", "Lisa Raich", "Sofia Mesa", "Alex Doe"]

AGG_PREFIXES = ["TST* ", "SQ *", "EB ", "PY ", "SUMUP ", "ZETTLE_"]


def _load_merchant_names(limit: int = 200) -> list[str]:
    with open(os.path.join(SEEDS_DIR, "merchants.csv")) as f:
        rows = list(csv.DictReader(f))
    return [r["merchant_name"] for r in rows[:limit]]


def _noise_description(rng: random.Random, name: str) -> str:
    d = name.upper() if rng.random() < 0.5 else name
    roll = rng.random()
    if roll < 0.2:
        d = rng.choice(AGG_PREFIXES) + d
    elif roll < 0.3:
        d = d.replace(" ", "  ", 1)  # doubled whitespace
    elif roll < 0.4:
        d = d + ", IL"  # trailing state tail
    elif roll < 0.45:
        d = d.replace("&", "&amp;")
    elif roll < 0.5:
        d = d + " - " + str(rng.randint(100, 999))
    return d


def card_transactions(spark: SparkSession, n: int = 600, seed: int = 42) -> DataFrame:
    rng = random.Random(seed)
    names = _load_merchant_names()
    start = dt.date(2022, 1, 1)
    rows = []

    def add(desc, card, amount, category=None, type_=None, ikey=None):
        d = start + dt.timedelta(days=rng.randint(0, 1300))
        rows.append(
            (
                f"txn_{len(rows):06d}",
                d,
                Decimal(f"{amount:.2f}"),
                card,
                desc,
                category,
                type_,
                ikey,
            )
        )

    for _ in range(int(n * 0.7)):  # regular card purchases
        add(
            _noise_description(rng, rng.choice(names)),
            rng.choice(CARD_NUMBERS),
            rng.uniform(2, 400),
            category=rng.choice(["Food & Drink", "Shopping", None]),
        )
    for _ in range(int(n * 0.05)):  # regex-targeted rows
        add(rng.choice(["BRITISH A 2217", "DINES* BRCKWL WHOLEF", "UA INFLT 0162412186807"]),
            rng.choice(CARD_NUMBERS), rng.uniform(50, 900))
    for _ in range(int(n * 0.08)):  # payment rows (filtered out of Sale)
        add(rng.choice(PAYMENT_MARKERS), rng.choice(CARD_NUMBERS), -rng.uniform(100, 2000))
    for _ in range(int(n * 0.04)):  # non-card accounts → 'Payment'
        add("MISC DEBIT", rng.choice([1111, 2222]), rng.uniform(10, 50))
    for _ in range(int(n * 0.06)):  # venmo branch rows
        person = rng.choice(VENMO_PEOPLE)
        desc = ("venmo proto faff surplus seed fund" if rng.random() < 0.2 else f"venmo payment to {person}")
        add(desc, rng.choice(CARD_NUMBERS), rng.uniform(5, 150), ikey=person)
    for _ in range(int(n * 0.05)):  # bank-transfer branch rows (Lorna, both signs)
        amount = rng.uniform(100, 3000) * (1 if rng.random() < 0.5 else -1)
        add("Transfer Lorna household", rng.choice(BANK_NUMBERS), amount)
    for _ in range(int(n * 0.02)):  # typed rows pass type through
        add("MANUAL ADJUSTMENT", rng.choice(CARD_NUMBERS), rng.uniform(5, 60), type_="Adjustment")
    # exact duplicate pair across the union (U1 dedup check — FIXTURES.md §C)
    rows.append(("txn_dup_a", dt.date(2024, 3, 1), Decimal("42.00"), 3221, "DUPLICATED ROW", None, None, None))
    rows.append(("txn_dup_b", dt.date(2024, 3, 1), Decimal("42.00"), 3221, "DUPLICATED ROW", None, None, None))

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("date", T.DateType()),
            T.StructField("amount", T.DecimalType(12, 2)),
            T.StructField("card_last4", T.IntegerType()),
            T.StructField("description", T.StringType()),
            T.StructField("category", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("intermediate_key", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


EXERCISES = [
    ("Treadmill", "Cardio", "Legs"),
    ("Bench Press", "Weights", "Chest, Triceps"),
    ("Squat", "Weights", "Legs, Glutes"),
    ("Pull Up", "Calisthenics", "Back, Biceps"),
    ("Plank", "Calisthenics", "Core"),
]


def exercise_log(spark: SparkSession, n_days: int = 260, seed: int = 43) -> DataFrame:
    rng = random.Random(seed)
    start = dt.date(2022, 1, 1)
    rows = []
    for _ in range(n_days):
        d = start + dt.timedelta(days=rng.randint(0, 1300))
        for _ in range(rng.randint(1, 4)):
            label, type_, areas = rng.choice(EXERCISES)
            treadmill = label == "Treadmill"
            rows.append(
                (
                    d,
                    label,
                    type_,
                    round(rng.uniform(1, 6), 2) if treadmill else None,
                    round(rng.uniform(80, 500), 1) if treadmill else None,
                    round(rng.uniform(10, 60), 1) if treadmill else None,
                    float(rng.randint(5, 15)) if not treadmill else None,
                    float(rng.randint(2, 5)) if not treadmill else None,
                    areas,
                )
            )
    schema = T.StructType(
        [
            T.StructField("Date", T.DateType()),
            T.StructField("Exercise Label", T.StringType()),
            T.StructField("Type", T.StringType()),
            T.StructField("Distance (mi)", T.DoubleType()),
            T.StructField("Calories", T.DoubleType()),
            T.StructField("Duration (min)", T.DoubleType()),
            T.StructField("Reps", T.DoubleType()),
            T.StructField("Sets", T.DoubleType()),
            T.StructField("Target Areas", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


DISHES = [
    ("Pasta Primavera", "Tomato, Basil, Zucchini"),
    ("Green Curry", "Eggplant, Pepper, Basil"),
    ("Lentil Soup", "Lentil, Carrot, Celery, Onion"),
    ("Stir Fry", "Broccoli, Pepper, Garlic"),
    ("Salad Bowl", "Lettuce, Tomato, Cucumber"),
]


def recipe_log(spark: SparkSession, n: int = 300, seed: int = 44) -> DataFrame:
    rng = random.Random(seed)
    start = dt.date(2022, 1, 1)
    rows = []
    for _ in range(n):
        dish, plants = rng.choice(DISHES)
        d = start + dt.timedelta(days=rng.randint(0, 1300))
        rows.append((d, dish, Decimal(f"{rng.uniform(4, 30):.2f}"), plants))
    schema = T.StructType(
        [
            T.StructField("Date", T.DateType()),
            T.StructField("Dish", T.StringType()),
            T.StructField("Cost", T.DecimalType(10, 2)),
            T.StructField("Plants", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def shopping_log(spark: SparkSession, n: int = 250, seed: int = 45) -> DataFrame:
    rng = random.Random(seed)
    start = dt.date(2022, 1, 1)
    ingredients = ["Tomato", "Basil", "Lentil", "Rice", "Pepper", "Olive Oil", "Garlic"]
    rows = [
        (
            start + dt.timedelta(days=rng.randint(0, 1300)),
            rng.choice(ingredients),
            float(rng.randint(1, 5)),
            Decimal(f"{rng.uniform(1, 20):.2f}"),
        )
        for _ in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("Date", T.DateType()),
            T.StructField("Ingredient", T.StringType()),
            T.StructField("Quantity", T.DoubleType()),
            T.StructField("Price", T.DecimalType(10, 2)),
        ]
    )
    return spark.createDataFrame(rows, schema)


def weights(spark: SparkSession, n: int = 200, seed: int = 46) -> DataFrame:
    rng = random.Random(seed)
    start = dt.date(2022, 1, 1)
    rows = [
        (start + dt.timedelta(days=rng.randint(0, 1300)), round(rng.uniform(150, 190), 1))
        for _ in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("Measurement Date", T.DateType()),
            T.StructField("Weight", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def all_sources(spark: SparkSession) -> dict[str, DataFrame]:
    # SPARK_GRAFT_FIXTURE_N scales the transaction fixture (default 600) so
    # the boss-model cross-engine diff can run at probe scales — see
    # BENCH_NOTES.md round-7 workload-scale probe.
    n = int(os.environ.get("SPARK_GRAFT_FIXTURE_N", "600"))
    return {
        "card_transactions": card_transactions(spark, n=n),
        "exercise_log": exercise_log(spark),
        "recipe_log": recipe_log(spark),
        "shopping_log": shopping_log(spark),
        "weights": weights(spark),
    }
