#!/usr/bin/env python
"""j5 exec-series decomposition (VERDICT r13 item 4: j5 reads 2.65x vs
DuckDB through the noop sink while the count() series read 0.58x — the
count action prunes the aggregate tail, and for j5 the PRUNED tail is
the expensive part: count() over a groupBy computes the GROUPS only, so
`count(*)` and `count(distinct doc_id)` never run).

Variants (all through the noop sink so nothing is pruned, except the
counted canary):

  scan_floor     documents scan -> noop (commit + scan overhead)
  explode_only   split+explode+trim+filter words -> noop
  group_only     groupBy(lang, word).count -> noop (one shuffle, no
                 distinct)
  full           the shipped j5 (count + countDistinct) -> noop
  predistinct    two-level rewrite: groupBy(lang, word, doc_id) partial
                 then re-aggregate -- distinct via pre-aggregation
                 instead of Spark's expand
  full_counted   the shipped j5 under count() (the old series' number,
                 for the pruning delta)

DuckDB runs the full J5_SQL as the denominator. min-of-N interleaved;
shared load/drift gate (the artifact refuses to emit on failure).

Usage: python scripts/probe_j5_decomp.py [repeats]  (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.operators.flatten import explode_csv_cell  # noqa: E402
from dbt_analytics_spark.queries.core import J5_SQL, j5_explode_split  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from pyspark.sql import functions as F

    load_gate = wait_for_quiet()
    spark = get_spark("j5_decomp_probe")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_rows = docs.count()
    print(f"# documents rows: {n_rows}", file=sys.stderr)

    def words():
        return explode_csv_cell(
            docs.select("doc_id", "lang", "text"), "text", "word", sep=" "
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def variants():
        return {
            "scan_floor": lambda: noop(docs.select("doc_id", "lang", "text")),
            "explode_only": lambda: noop(words()),
            "group_only": lambda: noop(
                words().groupBy("lang", "word").agg(
                    F.count(F.lit(1)).alias("n")
                )
            ),
            "full": lambda: noop(j5_explode_split(spark, SF_DIR)),
            "predistinct": lambda: noop(
                words()
                .groupBy("lang", "word", "doc_id")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("lang", "word")
                .agg(
                    F.sum("c").cast("long").alias("n"),
                    F.count(F.lit(1)).alias("n_docs"),
                )
            ),
            "full_counted": lambda: j5_explode_split(spark, SF_DIR).count(),
        }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )

    vs = variants()
    for fn in vs.values():  # warm
        fn()
    con.execute(J5_SQL).fetchall()

    sp = {k: [] for k in vs}
    dk: list[float] = []
    for _ in range(REPEATS):
        for k, fn in vs.items():
            t0 = time.perf_counter()
            fn()
            sp[k].append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        con.execute(J5_SQL).fetchall()
        dk.append(round(time.perf_counter() - t0, 4))
    con.close()

    duck_min = min(dk)
    band = lambda v: round((max(v) - min(v)) / min(v), 3)  # noqa: E731
    emit_gated(
        {
            "metric": "j5_exec_decomposition",
            "protocol": f"min-of-{REPEATS}, variants interleaved with a "
            "DuckDB J5 canary per round, one warm session, noop sink",
            "rows": n_rows,
            "sf_dir": SF_DIR,
            "duckdb_j5_min": duck_min,
            "spark_min": {k: min(v) for k, v in sp.items()},
            "ratio_vs_duck_j5": {
                k: round(min(v) / duck_min, 2) for k, v in sp.items()
            },
            "spark_drift_band": {k: band(v) for k, v in sp.items()},
            "duckdb_drift_band": band(dk),
            "spark_raw": sp,
            "duckdb_raw": dk,
        },
        load_gate,
        samples={**{f"spark/{k}": v for k, v in sp.items()}, "duckdb": dk},
    )
    spark.stop()


if __name__ == "__main__":
    main()
