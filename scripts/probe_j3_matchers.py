#!/usr/bin/env python
"""J3 probe: 795 regex patterns x millions of descriptions — which matcher?

SURVEY.md §4 calls the regex lateral join (reference:
models/classified_card_transactions.sql:126-147, `desc ~* r.pattern_regex`
ORDER BY priority/length LIMIT 1) the one pathological workload operator.
This probe measures the three candidate physical strategies at 1M / 6M
synthetic card-transaction descriptions:

  window  theta broadcast join (rlike on the pattern COLUMN) + row_number
          — the round-1..6 default (operators/top1.py:lateral_top1_join).
          Non-literal rlike recompiles the java.util.regex.Pattern per
          evaluated pair, and every pattern is evaluated for every row
          (no early exit).
  case    one nested CASE WHEN chain with LITERAL patterns in rank order
          (priority DESC, length DESC, key DESC) — patterns compile once
          in codegen init, evaluation short-circuits at the first match,
          no join/window/shuffle at all. Dim must be collected (795 rows —
          broadcast-sized by contract, same as the reference seed).
  udf     Arrow-batched pandas UDF, `re` patterns precompiled per worker,
          rank-order scan with early exit per row (Python loop).

Descriptions are generated deterministically from the merchant_regex seed:
literalized pattern prefixes (regex syntax stripped) + noise suffixes, plus
pure-noise rows, so match-rate and match-position are realistic (~70%
match, winners spread over the whole priority range).

All three matchers must agree row-for-row before timings count.

Usage: python scripts/probe_j3_matchers.py [n_rows ...]
Writes one JSON line per size; paste into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.functions.pg import pg_regex_to_java  # noqa: E402
from dbt_analytics_spark.operators.top1 import (  # noqa: E402
    lateral_top1_case,
    lateral_top1_join,
    lateral_top1_udf,
)
from dbt_analytics_spark.session import get_spark  # noqa: E402
from dbt_analytics_spark.workload.models import SEEDS_DIR  # noqa: E402

NOISE = [
    "POS DEBIT", "CARD 1234", "SEATTLE WA", "AUSTIN TX", "ONLINE",
    "REF 99812", "USD", "RECURRING", "NYC", "845-555-0100",
]


def literalize(pattern: str) -> str:
    """Strip regex syntax to produce a string the pattern is likely to match."""
    s = pattern
    s = re.sub(r"\\[yYmMbB]", "", s)
    s = re.sub(r"\\[sd]\+?", " ", s)
    s = re.sub(r"\(([^()|]*)\|[^()]*\)", r"\1", s)  # keep first alternative
    s = re.sub(r"[\^\$\(\)\?\*\+\[\]\{\}\\\.]", "", s)
    return re.sub(r"\s+", " ", s).strip()


def build_descriptions(spark, n_rows: int):
    import csv

    with open(os.path.join(SEEDS_DIR, "merchant_regex.csv")) as f:
        rows = list(csv.DictReader(f))
    branches = []
    for r in rows:
        lit = literalize(r["pattern_regex"])
        if lit:
            branches.append(lit)
    spark.conf.set("probe.n_branches", str(len(branches)))
    base = spark.createDataFrame(
        [(i, b) for i, b in enumerate(branches)], "branch_id long, stem string"
    )
    # id -> (stem cycled over branches, deterministic noise suffix); 30% of
    # rows are pure noise (no stem) so the no-match path is exercised.
    ids = spark.range(0, n_rows, 1, 32)
    noise = F.concat_ws(
        " ",
        F.element_at(F.array(*[F.lit(x) for x in NOISE]), (F.col("id") % 10 + 1).cast("int")),
        F.element_at(F.array(*[F.lit(x) for x in NOISE]), (F.col("id") % 7 + 1).cast("int")),
    )
    with_branch = ids.withColumn(
        "branch_id",
        F.when(F.col("id") % 10 < 7, F.col("id") % len(branches)).otherwise(F.lit(-1)),
    )
    docs = (
        with_branch.join(F.broadcast(base), "branch_id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.upper(
                F.concat_ws(" ", F.coalesce(F.col("stem"), F.lit("")), noise)
            ).alias("text"),
        )
    )
    return docs


def load_dim(spark):
    import csv

    with open(os.path.join(SEEDS_DIR, "merchant_regex.csv")) as f:
        rows = list(csv.DictReader(f))
    dim = [
        (
            r["regex_key"],
            r["merchant_key"],
            pg_regex_to_java(r["pattern_regex"]),
            int(r["priority"] or 0),
        )
        for r in rows
    ]
    return spark.createDataFrame(
        dim, "regex_key string, merchant_key string, pattern string, priority int"
    )


def main() -> None:
    from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet

    load_gate = wait_for_quiet()  # quiet host BEFORE any timing starts
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 6_000_000]
    spark = get_spark("j3probe")
    dim = load_dim(spark)
    order = [F.desc("priority"), F.desc(F.length("pattern")), F.desc("regex_key")]

    def run_window(docs):
        best = lateral_top1_join(
            docs, dim,
            match=F.regexp_like(F.col("text"), F.concat(F.lit("(?i)"), F.col("pattern"))),
            order_by=order, left_key=["doc_id"], how="left",
        )
        return best.select("doc_id", F.coalesce("merchant_key", F.lit("none")).alias("best"))

    def run_case(docs):
        best = lateral_top1_case(
            docs, dim, text_cols=["text"], order_by=order,
            pattern_col="pattern", payload_cols=["merchant_key"],
        )
        return best.select(
            "doc_id", F.coalesce("merchant_key", F.lit("none")).alias("best")
        )

    def run_udf(docs):
        best = lateral_top1_udf(
            docs, dim, text_cols=["text"], order_by=order,
            pattern_col="pattern", payload_cols=["merchant_key"],
        )
        return best.select("doc_id", F.coalesce("merchant_key", F.lit("none")).alias("best"))

    matchers = {"window": run_window, "case": run_case, "udf": run_udf}

    # correctness gate at 100k before timing
    docs_small = build_descriptions(spark, 100_000).cache()
    docs_small.count()
    outs = {k: fn(docs_small).toPandas().sort_values("doc_id").reset_index(drop=True)
            for k, fn in matchers.items()}
    for k in ("case", "udf"):
        if not outs["window"].equals(outs[k]):
            diff = outs["window"]["best"] != outs[k]["best"]
            print(f"MISMATCH window vs {k}: {int(diff.sum())} rows", file=sys.stderr)
            print(outs["window"][diff].head(10), file=sys.stderr)
            print(outs[k][diff].head(10), file=sys.stderr)
            sys.exit(1)
    print("# correctness: window == case == udf on 100k rows", file=sys.stderr)
    docs_small.unpersist()

    for n in sizes:
        docs = build_descriptions(spark, n).localCheckpoint()
        result = {"metric": "j3_matcher_probe", "n_rows": n, "n_patterns": 795,
                  "times_sec": {}}
        repeats = int(os.environ.get("PROBE_REPEATS", "3"))
        raw: dict[str, list[float]] = {}
        for k, fn in matchers.items():
            fn(docs).count()  # warm
            raw[k] = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn(docs).count()
                raw[k].append(round(time.perf_counter() - t0, 4))
            result["times_sec"][k] = round(min(raw[k]), 3)
            print(f"# n={n} {k}: {min(raw[k]):.2f}s", file=sys.stderr)
        result["raw_times"] = raw
        emit_gated(result, load_gate, samples=raw)


if __name__ == "__main__":
    main()
