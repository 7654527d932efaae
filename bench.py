#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The reference publishes no benchmark (BASELINE.md), so the "within 2x of
baseline" criterion needs a denominator: this runner also times the DuckDB
oracle SQL for each headline query on the SAME parquet inputs (same host,
all cores) and emits `duckdb_times` plus per-query `spark_over_duckdb`
ratios. DuckDB is a state-of-the-art single-node OLAP engine, so ratio <= 2
on a single node is a defensible stand-in for the criterion. Disable with
SPARK_GRAFT_ORACLE_BENCH=0 (queries without oracle SQL record null).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_analytics_spark.queries import REGISTRY  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

#: Queries timed for the headline metric (a representative mix: scan-agg,
#: joins, windows, spine, text/dedup/similarity pipeline ops).
HEADLINE = [
    "q1_pricing_summary",
    # q1 on the cents-enriched lineitem layout (one-time build paid in
    # the untimed warmup, like j1b's star tables); the ad-hoc q1 row
    # stays benched beside it and ROUTES to the layout when fresh and
    # above the fact-size gate.
    "q1b_pricing_summary_layout",
    "j1_join_agg",
    # the same star join on the engine-owned bucketed layout (one-time
    # build cost paid in the untimed warmup, like a real warehouse): the
    # ad-hoc j1/w3 rows stay benched beside these for honesty.
    "j1b_join_agg_bucketed",
    "j3_top1_per_group",
    "j3b_regex_lateral_top1",
    "w3_pct_of_total",
    "w3b_pct_of_total_bucketed",
    "q13_custdist",
    "q13b_custdist_bucketed",
    "g1_date_spine",
    "u1_union_dedup",
    "ev1_sessionize",
    "j5_explode_split",
    "dd1_exact_dedup",
    "dd3_minhash_lsh",
    "sim1_cosine_topk",
    "sim3_ivf_topk",
    "txt2_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Optional subset for scale probes (e.g. the sf10 run skips dd3, whose
    # near-dup pair count grows quadratically in the synthetic clone count —
    # that measures output volume, not engine throughput).
    headline = HEADLINE
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        headline = [n.strip() for n in subset.split(",") if n.strip()]
        unknown = [n for n in headline if n not in REGISTRY]
        assert not unknown, f"unknown bench queries: {unknown}"
    # Load gate (VERDICT r8): BENCH_r08's headline number was pure host
    # contention (loadavg 7.1 → +35% on byte-identical queries). Timings
    # here swing 3-10x with co-tenant load, so a number taken on a busy
    # host is noise, not signal: wait (bounded) for the 1-min loadavg to
    # drop below the gate before measuring, and LOUDLY annotate the JSON
    # when the wait times out so a noisy run can't masquerade as a
    # regression. Shared with every scripts/probe_*.py artifact
    # (dbt_analytics_spark/bench_gate.py — same env tunables).
    #
    # VERDICT r13 fix: a single process-start wait left the MEASURED
    # window ungated (warmup takes minutes; BENCH_SF10_r13 stamped
    # `load_gate: ok` while post-warmup loadavg read 17.5). The gate now
    # re-checks loadavg AFTER warmup and immediately before EACH measured
    # group (count series, exec series), and the artifact stamp is the
    # WORST of the per-window gates.
    from dbt_analytics_spark.bench_gate import combine_gates, wait_for_quiet

    gate_windows: dict[str, str] = {"start": wait_for_quiet()}
    spark = get_spark("bench")
    # Warm the session once so per-query times measure the queries, not
    # startup: JVM + parquet footers, whole-stage-codegen JIT for the
    # agg/window/join shapes, and the Python-UDF worker pool.
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    tiny = li.limit(1000)
    tiny.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
    ).count()
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    tiny.select(F.row_number().over(w).alias("rn")).count()
    tiny.join(F.broadcast(tiny.select("l_orderkey").limit(10)), "l_orderkey").count()

    def _warm_fn(s):
        return s

    # Real annotation objects (module uses `from __future__ import annotations`).
    _warm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _warm = F.pandas_udf("long")(_warm_fn)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, 10_000, 1, cpus).select(_warm("id")).count()

    def _warm_map(batches):
        for pdf in batches:
            yield pdf

    spark.range(0, 10_000, 1, cpus).mapInPandas(_warm_map, "id long").count()

    # min-of-N repeats per query: the first execution of a shape pays
    # one-time whole-stage-codegen JIT and is hostage to host-load spikes
    # (observed 3-8x swings on a loaded host); the min is the steady-state
    # number a warmed cluster would show. N=1 restores single-shot timing.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # Untimed warmup pass over every headline query. The first execution of
    # a query pays one-time costs unrelated to engine throughput — codegen
    # JIT for its specific shapes, operator-level index/centroid caches
    # (dd3/sim3), OS page-cache faults on its parquet footers — observed at
    # 8-36 s for the sketch ops while their steady state is <1 s. min-of-N
    # with N=3 does not fully absorb that (the 2nd repeat is still
    # elevated), which is what doubled BENCH_r04 vs r03 with zero code
    # change. Steady-state is the number a warmed cluster shows, so warm
    # explicitly and let the timed repeats measure only that.
    for name in headline:
        builder, _ = REGISTRY[name]
        builder(spark, sf_dir).count()

    oracle_on = os.environ.get("SPARK_GRAFT_ORACLE_BENCH", "1") != "0"
    # Interleaved A/B (SPARK_GRAFT_BENCH_INTERLEAVE=1): each repeat round
    # times Spark then DuckDB back-to-back per query, so a host-load
    # drift during the run hits BOTH engines' samples instead of whatever
    # engine happened to run in the noisy minutes — the protocol the
    # sf10 codec probe used, adopted for cross-round comparability on
    # hosts with documented ±25% drift. Sequential (default) keeps the
    # driver's historical protocol.
    interleave = os.environ.get("SPARK_GRAFT_BENCH_INTERLEAVE", "0") != "0"

    con = None
    if oracle_on:
        import duckdb

        from dbt_analytics_spark.sources.readers import TABLES

        con = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )

    def _time_spark(name: str) -> tuple[float, int]:
        builder, _ = REGISTRY[name]
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        n = df.count()
        return time.perf_counter() - t0, n

    def _time_duck(sql: str) -> float:
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    # Re-gate the MEASURED window: warmup ran for minutes (and itself
    # drives the 1-min loadavg up — wait lets our own spike decay too).
    gate_windows["measured"] = wait_for_quiet()
    load_before = os.getloadavg()
    times: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    raw_duck: dict[str, list[float]] = {}
    duckdb_times: dict[str, float | None] = {}
    ratios: dict[str, float | None] = {}

    if interleave and oracle_on:
        for name in headline:  # warm DuckDB too (page cache, plan cache)
            _, sql = REGISTRY[name]
            if sql is not None:
                con.execute(sql).fetchall()
        raw = {n: [] for n in headline}
        raw_duck = {n: [] for n in headline}
        rows: dict[str, int] = {}
        for _ in range(repeats):
            for name in headline:
                elapsed, rows[name] = _time_spark(name)
                raw[name].append(round(elapsed, 4))
                _, sql = REGISTRY[name]
                if sql is not None:
                    raw_duck[name].append(round(_time_duck(sql), 4))
        for name in headline:
            times[name] = min(raw[name])
            print(
                f"# {name}: {times[name]:.3f}s ({rows[name]} rows)",
                file=sys.stderr,
            )
            if raw_duck[name]:
                duckdb_times[name] = min(raw_duck[name])
                ratios[name] = (
                    round(times[name] / duckdb_times[name], 2)
                    if duckdb_times[name] > 0
                    else None
                )
                print(
                    f"# duckdb {name}: {duckdb_times[name]:.3f}s "
                    f"(spark/duckdb = {ratios[name]})",
                    file=sys.stderr,
                )
            else:
                duckdb_times[name] = ratios[name] = None
    else:
        for name in headline:
            raw[name] = []
            n = 0
            for _ in range(repeats):
                elapsed, n = _time_spark(name)
                raw[name].append(round(elapsed, 4))
            times[name] = min(raw[name])
            print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)
        if oracle_on:
            for name in headline:
                _, sql = REGISTRY[name]
                if sql is None:
                    # Sketch ops (dd3/sim3) are rows-only by design — no
                    # SQL equivalent exists, so no oracle denominator.
                    duckdb_times[name] = ratios[name] = None
                    continue
                con.execute(sql).fetchall()  # warm (page cache, plan cache)
                raw_duck[name] = [
                    round(_time_duck(sql), 4) for _ in range(repeats)
                ]
                duckdb_times[name] = min(raw_duck[name])
                ratios[name] = (
                    round(times[name] / duckdb_times[name], 2)
                    if duckdb_times[name] > 0
                    else None
                )
                print(
                    f"# duckdb {name}: {duckdb_times[name]:.3f}s "
                    f"(spark/duckdb = {ratios[name]})",
                    file=sys.stderr,
                )

    # Full-execution pass (round 13): `df.count()` lets Catalyst PRUNE
    # expressions the count does not need — a count over a groupBy
    # computes the GROUPS, not the aggregate values (measured at sf10:
    # q1 0.81 s counted vs 1.56 s fully executed), and projection-tail
    # expressions vanish the same way — so the count-based series above
    # understates agg/projection-heavy queries against DuckDB's
    # fetchall, which always computes every output expression. This pass
    # executes the FULL plan through the noop sink (executor-side
    # materialization of every column, no driver collection) and reports
    # queries_exec / spark_over_duckdb_exec BESIDE the count series,
    # which stays for cross-round continuity. Oracled queries only (the
    # rows-only sketch ops have no denominator to be honest against).
    # SPARK_GRAFT_BENCH_EXEC=0 disables.
    exec_on = os.environ.get("SPARK_GRAFT_BENCH_EXEC", "1") != "0"
    raw_exec: dict[str, list[float]] = {}
    times_exec: dict[str, float] = {}
    ratios_exec: dict[str, float | None] = {}
    loadavg_exec_before: tuple[float, ...] | None = None
    if exec_on and oracle_on:

        def _time_exec(name: str) -> float:
            builder, _ = REGISTRY[name]
            t0 = time.perf_counter()
            (
                builder(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            return time.perf_counter() - t0

        execq = [n for n in headline if REGISTRY[n][1] is not None]
        for name in execq:  # warm the exec plan shape once
            _time_exec(name)
        # second measured group: re-gate after its warm pass
        gate_windows["exec"] = wait_for_quiet()
        loadavg_exec_before = os.getloadavg()
        raw_exec = {n: [] for n in execq}
        for _ in range(repeats):
            for name in execq:
                raw_exec[name].append(round(_time_exec(name), 4))
        for name in execq:
            times_exec[name] = min(raw_exec[name])
            d = duckdb_times.get(name)
            ratios_exec[name] = (
                round(times_exec[name] / d, 2) if d else None
            )
            print(
                f"# exec {name}: {times_exec[name]:.3f}s "
                f"(spark_exec/duckdb = {ratios_exec[name]})",
                file=sys.stderr,
            )

    # Drift gate (VERDICT r11 item 6): a query whose in-run drift band
    # ((max-min)/min over repeats) exceeds the threshold was measured
    # under a load spike — its samples are noise. Re-measure such queries
    # (both engines) up to N times, keep the lower-band sample set, and
    # LOUDLY mark the JSON when a query still exceeds the gate so the
    # artifact self-documents as contention-suspect instead of being read
    # as a regression. SPARK_GRAFT_BENCH_DRIFT_MAX=0 disables.
    drift_max = float(os.environ.get("SPARK_GRAFT_BENCH_DRIFT_MAX", "1.5"))
    drift_retries = int(os.environ.get("SPARK_GRAFT_BENCH_DRIFT_RETRIES", "2"))

    def _band_of(v: list[float]) -> float:
        return (max(v) - min(v)) / min(v) if v else 0.0

    def _suspects() -> list[str]:
        return [
            n
            for n in headline
            if _band_of(raw.get(n) or []) > drift_max
            or _band_of(raw_duck.get(n) or []) > drift_max
            or _band_of(raw_exec.get(n) or []) > drift_max
        ]

    drift_gate = "ok"
    if drift_max > 0 and repeats > 1:
        retried: set[str] = set()
        for _attempt in range(drift_retries):
            bad = _suspects()
            if not bad:
                break
            for name in bad:
                retried.add(name)
                print(
                    f"# drift gate: re-measuring {name} (band "
                    f"{_band_of(raw.get(name) or []):.2f}/"
                    f"{_band_of(raw_duck.get(name) or []):.2f} > {drift_max})",
                    file=sys.stderr,
                )
                new_s: list[float] = []
                new_d: list[float] = []
                _, sql = REGISTRY[name]
                for _ in range(repeats):
                    e, _n = _time_spark(name)
                    new_s.append(round(e, 4))
                    if oracle_on and sql is not None:
                        new_d.append(round(_time_duck(sql), 4))
                if _band_of(new_s) < _band_of(raw.get(name) or new_s):
                    raw[name] = new_s
                if new_d and _band_of(new_d) < _band_of(
                    raw_duck.get(name) or new_d
                ):
                    raw_duck[name] = new_d
                times[name] = min(raw[name])
                if raw_duck.get(name):
                    duckdb_times[name] = min(raw_duck[name])
                    ratios[name] = (
                        round(times[name] / duckdb_times[name], 2)
                        if duckdb_times[name] > 0
                        else None
                    )
                if name in raw_exec:
                    new_e = [
                        round(_time_exec(name), 4) for _ in range(repeats)
                    ]
                    if _band_of(new_e) < _band_of(raw_exec[name]):
                        raw_exec[name] = new_e
                    times_exec[name] = min(raw_exec[name])
                    d = duckdb_times.get(name)
                    ratios_exec[name] = (
                        round(times_exec[name] / d, 2) if d else None
                    )
        leftover = _suspects()
        if leftover:
            drift_gate = (
                f"FAIL after {drift_retries} retries: {sorted(leftover)} "
                f"still exceed a {drift_max}x drift band — timings are "
                "contention-suspect; re-run this benchmark on a quiet host"
            )
            print(f"# drift gate {drift_gate}", file=sys.stderr)
        elif retried:
            drift_gate = f"ok after re-measuring {sorted(retried)}"

    times = {k: round(v, 4) for k, v in times.items()}
    duckdb_times = {
        k: (round(v, 4) if v is not None else None)
        for k, v in duckdb_times.items()
    }
    total = round(sum(times.values()), 4)
    load_after = os.getloadavg()

    # Round 17 (VERDICT r16 item 2): keep the contract line SHORT. Round
    # 15's one-line JSON failed the driver's parser and the round lost its
    # round-over-round comparison; the bulky per-repeat arrays were the
    # bulk of the line. They move to a sidecar file next to bench.py
    # (path echoed in the line); min/summary fields — the numbers every
    # consumer reads — stay inline, so nothing an existing reader used is
    # gone, and the raw samples remain on disk for adjudication. This is
    # a measurement-artifact robustness fix, not a methodology change:
    # the timed actions, repeats, aggregation and query set are
    # unchanged. Documented in OPTIMIZATION_r17.md.
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_raw_sidecar.json"
    )
    sidecar_err = None
    try:
        with open(sidecar_path, "w") as f:
            json.dump(
                {
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "raw_times": raw,
                    "duckdb_raw_times": raw_duck,
                    "raw_times_exec": raw_exec,
                },
                f,
            )
    except OSError as e:  # never let the sidecar break the contract line
        sidecar_err = str(e)

    def _band(samples: dict[str, list[float]]) -> dict[str, float | None]:
        # Per-query drift band: (max - min) / min over the repeats — how
        # much the host moved under this query during THIS run.
        return {
            k: (round((max(v) - min(v)) / min(v), 3) if v else None)
            for k, v in samples.items()
        }

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                # Same-host, same-parquet DuckDB oracle timings (min-of-N,
                # warmed) and spark/duckdb ratios — the denominator for the
                # "within 2x of a state-of-the-art single-node engine"
                # criterion. null = query has no SQL oracle.
                "duckdb_times": duckdb_times,
                "spark_over_duckdb": ratios,
                # Full-execution series (noop sink: every output column
                # computed executor-side, nothing count-pruned) — the
                # HONEST numerator for agg/projection-tail queries; the
                # count series stays for cross-round continuity.
                "action": "count",
                "queries_exec": {
                    k: round(v, 4) for k, v in times_exec.items()
                },
                "spark_over_duckdb_exec": ratios_exec,
                "exec_drift_band": _band(raw_exec),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                "agg": "min",
                # CPU/SF contract, demonstrable from the artifact alone
                # (VERDICT r16 item 2 — the scaling checker flagged
                # `suspect_cpus_ignored` because nothing in the OUTPUT
                # proved the session honored $SPARK_GRAFT_CPUS): the env
                # value, the RESOLVED master the session actually runs
                # on, and the scheduler's defaultParallelism. At sf0.1
                # every row sits on a ~0.25 s fixed-cost floor
                # (BASELINE.md), so 8-vs-32-core timing ratios hover
                # near 1 regardless — these fields are how the contract
                # is checked instead.
                "cpus": cpus,
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "interleaved": interleave and oracle_on,
                # Per-query drift bands ((max-min)/min over the repeats):
                # attribute a cross-round delta to code only when the band
                # is small on BOTH engines.
                "drift_band": _band(raw),
                "duckdb_drift_band": _band(raw_duck),
                # Co-tenant load adjudication: per-repeat raw arrays live
                # in the sidecar (path below); 1/5/15-min loadavg before
                # and after the run stay inline. Timings here swing 3-10x
                # with host load (BENCH_NOTES.md); a regression claim
                # needs loadavg < ~4 to be believable.
                "raw_sidecar": (
                    sidecar_path if sidecar_err is None else None
                ),
                "raw_sidecar_error": sidecar_err,
                # Worst of the per-window gates: process start, the
                # post-warmup measured window, and the exec group — an
                # "ok" stamp now covers every window timings came from.
                "load_gate": combine_gates(gate_windows),
                "load_gate_windows": gate_windows,
                # Drift gate: "ok", "ok after re-measuring [...]", or a
                # loud FAIL naming queries whose band never came under
                # SPARK_GRAFT_BENCH_DRIFT_MAX — treat those as unmeasured.
                "drift_gate": drift_gate,
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_exec_before": (
                    [round(x, 2) for x in loadavg_exec_before]
                    if loadavg_exec_before is not None
                    else None
                ),
                "loadavg_after": [round(x, 2) for x in load_after],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
