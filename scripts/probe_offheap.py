#!/usr/bin/env python
"""Off-heap A/B for the fact-join class (round 11).

r10 measured the 240M-row plateau as partly GC (8g->32g heap: j1b
6.74 -> 4.66 s) and raised the session default. Tungsten can take the
agg/join buffers off-heap entirely (`spark.memory.offHeap.*`), which on
GC-bound shapes is worth measuring, not guessing. This probe times
j1b/w3b/q13b at sf160 (240M rows, bucketed layout cached) under two
fresh sessions — baseline heap vs heap+off-heap — with DuckDB re-timed
inside each block as a host-drift canary (its code and data never
change; if ITS min moves, the block comparison is contaminated).

Usage: python scripts/probe_offheap.py [repeats]
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

SF_DIR = "/root/repo/.scratch/sf160"
QUERIES = [
    "j1b_join_agg_bucketed",
    "w3b_pct_of_total_bucketed",
    "q13b_custdist_bucketed",
]
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

CONFIGS = {
    "heap48": {},
    "heap24_offheap24": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
    },
}


def main() -> None:
    from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet

    load_gate = wait_for_quiet()  # quiet host BEFORE any timing starts
    out: dict[str, dict] = {}
    for tag, extra in CONFIGS.items():
        os.environ["SPARK_DRIVER_MEMORY"] = (
            "48g" if tag == "heap48" else "24g"
        )
        spark = get_spark(f"offheap_probe_{tag}", extra_conf=extra)
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        for name in QUERIES:  # warm both engines
            builder, sql = REGISTRY[name]
            builder(spark, SF_DIR).count()
            con.execute(sql).fetchall()
        sp = {n: [] for n in QUERIES}
        dk = {n: [] for n in QUERIES}
        for _ in range(REPEATS):
            for name in QUERIES:
                builder, sql = REGISTRY[name]
                t0 = time.perf_counter()
                builder(spark, SF_DIR).count()
                sp[name].append(round(time.perf_counter() - t0, 4))
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dk[name].append(round(time.perf_counter() - t0, 4))
        con.close()
        spark.stop()
        out[tag] = {
            "spark_min": {k: min(v) for k, v in sp.items()},
            "duckdb_canary_min": {k: min(v) for k, v in dk.items()},
            "spark_raw": sp,
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }
        for k in QUERIES:
            print(
                f"# {tag} {k}: spark {min(sp[k]):.3f}s "
                f"(duck canary {min(dk[k]):.3f}s)",
                file=sys.stderr,
            )
    merged = {}
    for tag, rec in out.items():
        for k, v in rec["spark_raw"].items():
            merged[f"{tag}/{k}"] = v
    emit_gated(
        {"metric": "offheap_ab_sf160", "repeats": REPEATS, "configs": out},
        load_gate,
        samples=merged,
    )


if __name__ == "__main__":
    main()
