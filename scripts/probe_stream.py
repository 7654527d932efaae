#!/usr/bin/env python
"""Streaming/incremental micro-bench (VERDICT r16 item 9 — the only
operator family with no timing artifact since r14).

Times the microbatch path (`streaming.incremental.microbatch_append`:
file-source + checkpoint + Trigger.AvailableNow — the dbt-microbatch
equivalent) end-to-end at TWO input sizes, plus the incremental-append
leg that is the contract's whole point: after the first run, new files
landing in the source are processed WITHOUT re-reading the old ones, so
the second invocation's wall tracks the DELTA size, not the total.

Transform under test: the stateless cleanse shape every microbatch model
here starts from (event-time cast + projection + predicate) — state-free
so rows/s measures the microbatch machinery (file listing, checkpoint
commit, parquet sink) rather than a stateful operator; the stateful
sessionizer has its own correctness suite (tests/test_streaming.py).

Usage: python scripts/probe_stream.py [repeats]
Emits ONE JSON line (BENCH_STREAM_r17.json shape).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402
from dbt_analytics_spark.streaming.incremental import (  # noqa: E402
    microbatch_append,
)

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SMALL = "/root/testdata/sf0.01/events.parquet"
LARGE = "/root/testdata/sf0.1/events.parquet"


def _transform(df):
    return (
        df.withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "ts", "event_type")
    )


def _run_once(spark, source_dir: str, scratch: str, tag: str) -> float:
    out = os.path.join(scratch, f"out_{tag}")
    ckpt = os.path.join(scratch, f"ckpt_{tag}")
    t0 = time.perf_counter()
    microbatch_append(spark, source_dir, out, ckpt, _transform, f"probe_{tag}")
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    load_gate = wait_for_quiet()
    spark = get_spark("stream_probe")
    # nanos-as-long: the shared events table carries TIMESTAMP(NANOS);
    # the batch readers set this inside load_testdata, the raw stream
    # reader needs it on the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # Untimed warmup: the FIRST streaming query of a session pays
    # one-time costs (streaming planner, sink/commit-protocol classes,
    # checkpoint machinery) observed at 2-3x a steady run — the same
    # per-eval-type cold-start bench.py warms away.
    with tempfile.TemporaryDirectory(dir="/tmp") as scratch:
        src_dir = os.path.join(scratch, "src")
        os.makedirs(src_dir)
        shutil.copy(SMALL, os.path.join(src_dir, "part-000.parquet"))
        _run_once(spark, src_dir, scratch, "warmup")

    legs = [("small_sf001", SMALL), ("large_sf01", LARGE)]
    # Data-bound third leg when the 10M-row scratch corpus exists: the
    # two driver-SF legs sit on the ~0.6 s per-microbatch fixed floor
    # (10x the rows costs +18%), so this is where rows/s means anything.
    xl = "/root/repo/.scratch/sf10/events.parquet"
    if os.path.exists(xl):
        legs.append(("xl_10m", xl))

    sizes = {}
    for name, src in legs:
        n_rows = spark.read.parquet(src).count()
        walls = []
        out_rows = None
        for rep in range(REPEATS):
            with tempfile.TemporaryDirectory(dir="/tmp") as scratch:
                # source dir holds the parquet files like a landing zone
                src_dir = os.path.join(scratch, "src")
                os.makedirs(src_dir)
                shutil.copy(src, os.path.join(src_dir, "part-000.parquet"))
                walls.append(_run_once(spark, src_dir, scratch, f"{name}_{rep}"))
                if rep == REPEATS - 1:
                    out_rows = spark.read.parquet(
                        os.path.join(scratch, f"out_{name}_{rep}")
                    ).count()
        sizes[name] = {
            "rows": n_rows,
            "out_rows": out_rows,
            "walls": walls,
            "wall_min": min(walls),
            "rows_per_sec": round(n_rows / min(walls), 1),
        }

    # Incremental-append leg: land the LARGE file, run, then land the
    # SMALL file beside it and re-run against the SAME checkpoint — the
    # second wall must track the delta (small) not the total.
    with tempfile.TemporaryDirectory(dir="/tmp") as scratch:
        src_dir = os.path.join(scratch, "src")
        os.makedirs(src_dir)
        shutil.copy(LARGE, os.path.join(src_dir, "part-000.parquet"))
        out = os.path.join(scratch, "out_inc")
        ckpt = os.path.join(scratch, "ckpt_inc")
        t0 = time.perf_counter()
        microbatch_append(spark, src_dir, out, ckpt, _transform, "probe_inc0")
        first = round(time.perf_counter() - t0, 4)
        rows_first = spark.read.parquet(out).count()
        shutil.copy(SMALL, os.path.join(src_dir, "part-001.parquet"))
        t0 = time.perf_counter()
        microbatch_append(spark, src_dir, out, ckpt, _transform, "probe_inc1")
        second = round(time.perf_counter() - t0, 4)
        rows_total = spark.read.parquet(out).count()
    incremental = {
        "first_run_wall": first,
        "append_run_wall": second,
        "rows_after_first": rows_first,
        "rows_after_append": rows_total,
        "delta_rows": rows_total - rows_first,
        # exactly-once contract: the first run emits exactly the large
        # leg's output, the append run emits exactly the small leg's
        # output on top — nothing re-read, nothing dropped
        "exactly_once": (
            rows_first == sizes["large_sf01"]["out_rows"]
            and rows_total - rows_first == sizes["small_sf001"]["out_rows"]
        ),
    }

    emit_gated(
        {
            "metric": "microbatch_rows_per_sec",
            "value": sizes[legs[-1][0]]["rows_per_sec"],
            "unit": "rows/sec",
            "sizes": sizes,
            "incremental_append": incremental,
            "repeats": REPEATS,
            "transform": "event-time cast + not-null filter + projection",
        },
        load_gate,
        samples={k: v["walls"] for k, v in sizes.items()},
    )
    spark.stop()


if __name__ == "__main__":
    main()
