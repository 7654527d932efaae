#!/usr/bin/env python
"""Z-order data-skipping probe: measured row-group pruning + wall-clock.

Quantifies what the zorder_by layout (operators/zorder.py) buys on a box
predicate over (o_custkey, o_orderdate) at sf10 (15M orders), against
two controls on identical content:

  raw      the testdata parquet as generated (insertion order)
  linear   range-sorted by o_custkey only (the single-column best case)
  zorder   Morton-clustered on both columns

Reported per layout: parquet row groups whose min/max stats overlap the
box on EACH dimension (footer-level truth via pyarrow — what any stats-
pruning reader skips), plus Spark wall-clock for the filtered rollup,
min-of-N interleaved. DuckDB runs the same rollup on the raw file as
the cross-engine canary.

Usage: python scripts/probe_zorder.py [repeats]  (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from dbt_analytics_spark.operators.zorder import zorder_dataframe  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
OUT = "/root/repo/.scratch/zorder_probe"
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

CUST_LO, CUST_HI = 100_000, 140_000
DATE_LO, DATE_HI = "1996-03-01", "1996-09-01"


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return glob.glob(os.path.join(path, "*.parquet"))


def rowgroups_overlapping(path: str, boxes: dict) -> tuple[int, int]:
    """(n_rowgroups overlapping EVERY box, n_rowgroups): a stats-pruning
    reader skips a row group when ANY predicate column's [min,max] is
    disjoint from its box."""
    total = hit = 0
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            total += 1
            keep = True
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema in boxes and c.statistics is not None:
                    lo, hi = boxes[c.path_in_schema]
                    s = c.statistics
                    if s.max < lo or s.min > hi:
                        keep = False
            if keep:
                hit += 1
    return hit, total


def main() -> None:
    import datetime as dt

    from pyspark.sql import functions as F

    from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet

    load_gate = wait_for_quiet()  # quiet host BEFORE any timing starts
    spark = get_spark("zorder_probe")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    layouts = {"raw": f"{SF_DIR}/orders.parquet"}
    lin = f"{OUT}/linear"
    zod = f"{OUT}/zorder"
    if not os.path.isdir(lin):
        (
            orders.repartitionByRange(32, "o_custkey")
            .sortWithinPartitions("o_custkey")
            .write.mode("overwrite")
            .parquet(lin)
        )
    if not os.path.isdir(zod):
        zorder_dataframe(orders, ["o_custkey", "o_orderdate"]).write.mode(
            "overwrite"
        ).parquet(zod)
    layouts["linear"] = lin
    layouts["zorder"] = zod

    d_lo = dt.datetime.fromisoformat(DATE_LO)
    d_hi = dt.datetime.fromisoformat(DATE_HI)
    ck_box = {"o_custkey": (CUST_LO, CUST_HI)}
    od_box = {"o_orderdate": (d_lo, d_hi)}
    both_box = {**ck_box, **od_box}
    # predicate MIX: single-column sort wins queries on ITS column and
    # loses every other; z-order prunes on any subset
    skipping = {}
    for name, path in layouts.items():
        n = rowgroups_overlapping(path, {})[1]
        skipping[name] = {
            "rowgroups": n,
            "overlap_custkey_only": rowgroups_overlapping(path, ck_box)[0],
            "overlap_orderdate_only": rowgroups_overlapping(path, od_box)[0],
            "overlap_both": rowgroups_overlapping(path, both_box)[0],
        }
        print(f"# {name}: {skipping[name]}", file=sys.stderr)

    cust_pred = (F.col("o_custkey") >= CUST_LO) & (F.col("o_custkey") <= CUST_HI)
    date_pred = (
        F.col("o_orderdate") >= F.lit(DATE_LO).cast("timestamp_ntz")
    ) & (F.col("o_orderdate") < F.lit(DATE_HI).cast("timestamp_ntz"))
    preds = {
        "cust": cust_pred,
        "date": date_pred,
        "both": cust_pred & date_pred,
    }

    def rollup(path, pred):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
            .collect()
        )

    con = duckdb.connect()
    duck_where = {
        "cust": f"o_custkey BETWEEN {CUST_LO} AND {CUST_HI}",
        "date": f"o_orderdate >= TIMESTAMP '{DATE_LO}' "
        f"AND o_orderdate < TIMESTAMP '{DATE_HI}'",
    }
    duck_where["both"] = f"{duck_where['cust']} AND {duck_where['date']}"

    def duck(pname):
        return con.execute(
            f"SELECT o_orderstatus, count(*), sum(o_totalprice) "
            f"FROM read_parquet('{SF_DIR}/orders.parquet') "
            f"WHERE {duck_where[pname]} GROUP BY 1"
        ).fetchall()

    for path in layouts.values():
        for pred in preds.values():
            rollup(path, pred)
    for pname in preds:
        duck(pname)

    sp = {f"{k}/{p}": [] for k in layouts for p in preds}
    dk = {p: [] for p in preds}
    for _ in range(REPEATS):
        for k, path in layouts.items():
            for pname, pred in preds.items():
                t0 = time.perf_counter()
                rollup(path, pred)
                sp[f"{k}/{pname}"].append(round(time.perf_counter() - t0, 4))
        for pname in preds:
            t0 = time.perf_counter()
            duck(pname)
            dk[pname].append(round(time.perf_counter() - t0, 4))
    con.close()

    band = lambda v: round((max(v) - min(v)) / min(v), 3)  # noqa: E731
    emit_gated(
        {
            "metric": "zorder_data_skipping",
            "box": {
                "o_custkey": [CUST_LO, CUST_HI],
                "o_orderdate": [DATE_LO, DATE_HI],
            },
            "skipping": skipping,
            "spark_min": {k: min(v) for k, v in sp.items()},
            "spark_drift_band": {k: band(v) for k, v in sp.items()},
            "duckdb_min": {k: min(v) for k, v in dk.items()},
            "sf_dir": SF_DIR,
            "spark_raw": sp,
            "duckdb_raw": dk,
        },
        load_gate,
        samples={**{f"spark/{k}": v for k, v in sp.items()},
                 **{f"duckdb/{k}": v for k, v in dk.items()}},
    )
    spark.stop()


if __name__ == "__main__":
    main()
