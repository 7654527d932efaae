#!/usr/bin/env python
"""Stage-term decomposition of the j1b/w3b residual (VERDICT r11 item 1).

BENCH_SCANFLOOR_r11 closed every other >2x row by measurement; the one
data-bound constant left is the bucketed fact-join class at 960M rows:
j1b 22.6 s vs DuckDB 8.8 s (2.57x) with the bare scan floor at 1.13x.
So ~21.6 s of Spark time is join+agg, vs ~7.9 s for DuckDB. This probe
splits that lump into stage terms by timing PARTIAL plans of the same
bucketed layout, then A/Bs the candidate levers on the full shape:

Stage terms (each min-of-N, interleaved with a DuckDB canary):
  floor_orders   scan+agg count/sum(o_cents) over bucketed orders
  floor_custmap  scan count + max(n_name) over bucketed custmap
  join_keys      keys-only bucket-local join, count(*) — pure build+probe
  join_carry     join carrying o_cents + both name strings, agg to 1 row
                 (adds payload copy through the probe, no string groupBy)
  full           shipped j1b (adds the 960M-row groupBy on two strings)

Levers (full-query shape, same layout unless noted):
  smj            merge hint on the sorted buckets instead of shuffle_hash
  intkey         build side stores c_nationkey INT only (bucketed variant
                 table); groupBy the int key; names attached post-agg by a
                 broadcast join against the 25-row nation x region frame
  batch16k       spark.sql.parquet.columnarReaderBatchSize 4096 -> 16384
  maxpb512       spark.sql.files.maxPartitionBytes 128m -> 512m (expected
                 inert on a bucketed scan - one task per bucket regardless;
                 measured to close the verdict's named lever honestly)
  b64 / b128     bucket count 32 -> 64 / 128 (smaller, cache-resident hash
                 builds; more waves on 32 cores). Layout rewrite per count,
                 so gated behind J1B_STAGE_BUCKETS.

Usage:
  J1B_STAGE_SCALES=sf160 python scripts/probe_j1b_stages.py [repeats]
  J1B_STAGE_BUCKETS=64,128 ...   # also build+test alternate bucket counts

Writes one JSON line to stdout; stderr narrates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from probe_scan_floor import SF10, SF40, SF160, SF640, build_scaled  # noqa: E402

from dbt_analytics_spark.session import get_spark  # noqa: E402
from dbt_analytics_spark.sources.readers import load_testdata  # noqa: E402
from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.plans.star_layout import (  # noqa: E402
    ensure_star_layout,
    ensure_bucketed_table,
    guarded_cents_spend,
    _tag,
    LAYOUT_VERSION,
)

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
_SCALE_DIRS = {"sf10": SF10, "sf40": SF40, "sf160": SF160, "sf640": SF640}
SCALES = [
    _SCALE_DIRS[s]
    for s in os.environ.get("J1B_STAGE_SCALES", "sf160").split(",")
]
ALT_BUCKETS = [
    int(b)
    for b in os.environ.get("J1B_STAGE_BUCKETS", "").split(",")
    if b.strip()
]
DRIFT_MAX = float(os.environ.get("J1B_STAGE_DRIFT_MAX", "3"))

DUCK_J1 = """
SELECT r_name AS region_name, n_name AS nation_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def band(v):
    return round((max(v) - min(v)) / min(v), 3)


def main() -> None:
    from pyspark.sql import functions as F

    # quiet host BEFORE any work (VERDICT r12 item 4: the r12 run of this
    # probe published under loadavg 29-46); emit_gated refuses the
    # artifact if either gate fails at the end
    load_gate = wait_for_quiet()
    build_scaled(SF10, SF40, 4)
    if SF160 in SCALES or SF640 in SCALES:
        build_scaled(SF40, SF160, 4)
    if SF640 in SCALES:
        build_scaled(SF160, SF640, 4)

    spark = get_spark("j1b_stage_probe")
    out: dict[str, dict] = {}

    for sf_dir in SCALES:
        tag = os.path.basename(sf_dir)
        orders_tbl, custmap_tbl = ensure_star_layout(spark, sf_dir)
        o = spark.table(orders_tbl)
        c = spark.table(custmap_tbl)
        n_fact = o.count()
        print(f"# {tag}: fact rows {n_fact}", file=sys.stderr)

        # --- intkey variant build side: (c_custkey, c_nationkey) bucketed
        t = load_testdata(spark, sf_dir)
        ik_tbl = f"star_custik_{_tag(sf_dir)}_b32_v{LAYOUT_VERSION}"
        ensure_bucketed_table(
            spark,
            ik_tbl,
            t["customer"].select("c_custkey", "c_nationkey"),
            "c_custkey",
            32,
        )
        ik = spark.table(ik_tbl)
        names = (
            t["nation"]
            .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
            .select("n_nationkey", "n_name", "r_name")
        )

        # --- alternate bucket-count layouts (orders + custmap rewrite)
        alt = {}
        for nb in ALT_BUCKETS:
            t0 = time.perf_counter()
            ob, cb = ensure_star_layout(spark, sf_dir, n_buckets=nb)
            print(
                f"# {tag}: b{nb} layout ready in "
                f"{time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            alt[nb] = (spark.table(ob), spark.table(cb))

        def full_j1b(oo, cc):
            return (
                oo.join(
                    cc.hint("shuffle_hash"),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
                .groupBy(
                    F.col("r_name").alias("region_name"),
                    F.col("n_name").alias("nation_name"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum("o_cents").alias("__cents"),
                    F.max("o_cents").alias("__mx"),
                    F.min("o_cents").alias("__mn"),
                )
                .select(
                    "region_name",
                    "nation_name",
                    "n_orders",
                    guarded_cents_spend(
                        F.col("n_orders"),
                        F.col("__cents"),
                        F.col("__mx"),
                        F.col("__mn"),
                    ).alias("total_spend"),
                )
            )

        def intkey_j1b():
            per_key = (
                o.select("o_custkey", "o_cents")
                .join(
                    ik.hint("shuffle_hash"),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
                .groupBy("c_nationkey")
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum("o_cents").alias("__cents"),
                    F.max("o_cents").alias("__mx"),
                    F.min("o_cents").alias("__mn"),
                )
            )
            return (
                per_key.join(
                    F.broadcast(names),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
                .select(
                    F.col("r_name").alias("region_name"),
                    F.col("n_name").alias("nation_name"),
                    "n_orders",
                    guarded_cents_spend(
                        F.col("n_orders"),
                        F.col("__cents"),
                        F.col("__mx"),
                        F.col("__mn"),
                    ).alias("total_spend"),
                )
            )

        variants: dict[str, callable] = {
            "floor_orders": lambda: o.agg(
                F.count(F.lit(1)), F.sum("o_cents")
            ).collect(),
            "floor_custmap": lambda: c.agg(
                F.count(F.lit(1)), F.max("n_name")
            ).collect(),
            "join_keys": lambda: o.select("o_custkey")
            .join(
                c.select("c_custkey").hint("shuffle_hash"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .agg(F.count(F.lit(1)))
            .collect(),
            "join_carry": lambda: o.select("o_custkey", "o_cents")
            .join(
                c.select("c_custkey", "n_name", "r_name").hint(
                    "shuffle_hash"
                ),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .agg(
                F.count(F.lit(1)),
                F.sum("o_cents"),
                F.max("n_name"),
                F.max("r_name"),
            )
            .collect(),
            "full": lambda: full_j1b(o, c).collect(),
            "smj": lambda: (
                o.join(
                    c.hint("merge"), F.col("o_custkey") == F.col("c_custkey")
                )
                .groupBy(
                    F.col("r_name").alias("region_name"),
                    F.col("n_name").alias("nation_name"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum("o_cents").alias("__cents"),
                )
                .collect()
            ),
            "intkey": lambda: intkey_j1b().collect(),
        }

        def with_conf(key, val, fn):
            def run():
                old = spark.conf.get(key, None)
                spark.conf.set(key, val)
                try:
                    return fn()
                finally:
                    if old is None:
                        spark.conf.unset(key)
                    else:
                        spark.conf.set(key, old)

            return run

        variants["batch16k"] = with_conf(
            "spark.sql.parquet.columnarReaderBatchSize",
            "16384",
            variants["full"],
        )
        variants["maxpb512"] = with_conf(
            "spark.sql.files.maxPartitionBytes",
            "536870912",
            variants["full"],
        )
        for nb, (oo, cc) in alt.items():
            variants[f"b{nb}"] = (
                lambda oo=oo, cc=cc: full_j1b(oo, cc).collect()
            )

        only = os.environ.get("J1B_STAGE_VARIANTS", "")
        if only:
            keep = {v.strip() for v in only.split(",")}
            variants = {k: v for k, v in variants.items() if k in keep}

        # sanity: intkey reproduces the shipped 25 rows exactly
        a = sorted(map(tuple, full_j1b(o, c).collect()))
        b = sorted(map(tuple, intkey_j1b().collect()))
        assert a == b, "intkey variant diverged from shipped j1b"
        print(f"# {tag}: intkey parity OK ({len(a)} rows)", file=sys.stderr)

        con = duckdb.connect()
        for tname in ("region", "nation", "customer", "orders"):
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{tname}.parquet')"
            )

        # warm every variant + canary once
        for fn in variants.values():
            fn()
        con.execute(DUCK_J1).fetchall()

        def measure_block():
            sp = {k: [] for k in variants}
            dk = []
            for _ in range(REPEATS):
                for k, fn in variants.items():
                    t0 = time.perf_counter()
                    fn()
                    sp[k].append(round(time.perf_counter() - t0, 4))
                t0 = time.perf_counter()
                con.execute(DUCK_J1).fetchall()
                dk.append(round(time.perf_counter() - t0, 4))
            return sp, dk

        sp, dk = measure_block()
        gate = "ok"
        for _attempt in range(2):
            bad = [k for k in sp if band(sp[k]) > DRIFT_MAX]
            if band(dk) > DRIFT_MAX:
                bad.append("duckdb_canary")
            if not bad:
                break
            gate = "ok after block re-run"
            print(f"# {tag}: drift re-run — {bad}", file=sys.stderr)
            nsp, ndk = measure_block()
            for k in sp:
                if band(nsp[k]) < band(sp[k]):
                    sp[k] = nsp[k]
            if band(ndk) < band(dk):
                dk = ndk
        bad = [k for k in sp if band(sp[k]) > DRIFT_MAX]
        if band(dk) > DRIFT_MAX:
            bad.append("duckdb_canary")
        if bad:
            gate = f"FAIL: {sorted(bad)} never settled under {DRIFT_MAX}x"
        con.close()

        duck_min = min(dk)
        out[tag] = {
            "drift_gate": gate,
            "fact_rows": n_fact,
            "duckdb_j1_min": duck_min,
            "duckdb_drift_band": band(dk),
            "spark_min": {k: min(v) for k, v in sp.items()},
            "spark_drift_band": {k: band(v) for k, v in sp.items()},
            "ratio_vs_duck_j1": {
                k: round(min(v) / duck_min, 2) for k, v in sp.items()
            },
            "spark_raw": sp,
            "duckdb_raw": dk,
        }
        for k, v in sp.items():
            print(
                f"# {tag} {k}: {min(v):.3f}s  (duck j1 {duck_min:.3f}s, "
                f"ratio {min(v) / duck_min:.2f})",
                file=sys.stderr,
            )

    merged = {}
    for tag, rec in out.items():
        for k, v in rec["spark_raw"].items():
            merged[f"{tag}/spark/{k}"] = v
        merged[f"{tag}/duckdb_canary"] = rec["duckdb_raw"]
    emit_gated(
        {
            "metric": "j1b_stage_decomposition",
            "protocol": f"min-of-{REPEATS}, variants interleaved with a "
            "DuckDB j1 canary per round, one warm session",
            "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "scales": out,
        },
        load_gate,
        samples=merged,
        drift_max=DRIFT_MAX,
    )
    spark.stop()


if __name__ == "__main__":
    main()
