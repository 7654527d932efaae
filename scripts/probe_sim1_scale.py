#!/usr/bin/env python
"""sim1_cosine_topk scale probe (round 11 — the ev1 treatment).

The r11 fix (stored-float Arrow transfer + mapInArrow flat reshape +
threshold cut) brought sim1 to 1.87x in its own min-of-9 session and
2.37x in the standing interleaved sf10 bench — borderline at the 2x
bar. The decomposition names ~0.4 s of scale-independent floors
(query-set collect job, top-k merge, scheduling) against compute terms
(scan+transfer, GEMM) that grow with corpus rows. If that reading is
right, a 4x corpus must pull the ratio DOWN (both engines' compute
quadruples; only Spark carries the flat floors).

This probe measures it directly: the same REGISTRY query at sf10
(200k x 64) and on a 4x key-offset corpus (800k x 64, same 20-vector
query set — copies get vec_id >= 200k so `vec_id < 20` still selects
the original queries), interleaved Spark/DuckDB min-of-N in one warm
session, per-query drift bands.

Usage: python scripts/probe_sim1_scale.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from dbt_analytics_spark.queries import REGISTRY  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SCALES = {
    "sf10_200k": "/root/repo/.scratch/sf10",
    "sf40_800k": "/root/repo/.scratch/sf40",
}
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
NAME = "sim1_cosine_topk"


def main() -> None:
    from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet

    load_gate = wait_for_quiet()  # quiet host BEFORE any timing starts
    spark = get_spark("sim1_scale_probe")
    builder, sql = REGISTRY[NAME]
    out: dict[str, dict] = {}
    for tag, sf_dir in SCALES.items():
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
        builder(spark, sf_dir).count()  # warm both engines
        con.execute(sql).fetchall()
        sp, dk = [], []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            rows = builder(spark, sf_dir).count()
            sp.append(round(time.perf_counter() - t0, 4))
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dk.append(round(time.perf_counter() - t0, 4))
        con.close()
        band = lambda v: round((max(v) - min(v)) / min(v), 3)  # noqa: E731
        out[tag] = {
            "corpus_rows": n,
            "result_rows": rows,
            "spark_min": min(sp),
            "duckdb_min": min(dk),
            "ratio": round(min(sp) / min(dk), 2),
            "spark_drift_band": band(sp),
            "duckdb_drift_band": band(dk),
            "spark_raw": sp,
            "duckdb_raw": dk,
        }
        print(
            f"# {tag}: spark {min(sp):.3f}s duckdb {min(dk):.3f}s "
            f"ratio {out[tag]['ratio']}",
            file=sys.stderr,
        )
    merged = {}
    for tag, rec in out.items():
        merged[f"{tag}/spark"] = rec["spark_raw"]
        merged[f"{tag}/duckdb"] = rec["duckdb_raw"]
    emit_gated(
        {
            "metric": "sim1_scale_amortization",
            "protocol": f"min-of-{REPEATS}, interleaved spark/duckdb A/B, "
                        "one warm session",
            "scales": out,
        },
        load_gate,
        samples=merged,
    )
    spark.stop()


if __name__ == "__main__":
    main()
