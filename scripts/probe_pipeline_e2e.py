#!/usr/bin/env python
"""Composed-pipeline throughput probe (VERDICT r11 item 8).

The per-operator rates live in BENCH_SF10_r{N}; this probe tracks the
END-TO-END number — the same six-model engine pipeline as
tests/test_llm_pipeline_e2e.py (PII redaction + quality gates → exact
dedup → per-language token-budget sampling → overlapping chunking →
sequence packing → corpus stats) run through the registry with five
table materializations and threads=4 level-parallel writes, over the
sf10 documents table (500k docs). Emits ONE JSON line so end-to-end
regressions are visible round-over-round, not just per-op ones.

The r11 ad-hoc measurement of this exact shape: 500k docs, wall 305.1 s
→ 1,639 docs/s on local[32] (BENCH_NOTES "Composed-pipeline throughput
at 500k documents").

Usage: python scripts/probe_pipeline_e2e.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.operators import dedup, packing, sampling, text  # noqa: E402
from dbt_analytics_spark.plans import Project  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402
from dbt_analytics_spark.sources import load_testdata  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
#: Per-language token budget: large enough that sampling keeps the bulk
#: of a 500k-doc corpus (the op still does its full two-phase prefix-sum
#: work); the point of this probe is composed throughput, not cut size.
BUDGET = 50_000_000
CHUNK, STRIDE, PACK_CAP = 64, 48, 256


def main() -> None:
    from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet

    load_gate = wait_for_quiet()  # quiet host BEFORE the timed run
    spark = get_spark("pipeline_e2e_probe")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    load0 = os.getloadavg()[0]

    p = Project(
        spark, name="llm_pipe_bench", run_date=dt.date(2026, 1, 1), threads=4
    )
    docs = load_testdata(spark, SF_DIR)["documents"]
    n_docs = docs.count()
    p.source_table("raw_docs", docs)

    @p.model(materialized="ephemeral")
    def cleaned(ctx):
        df = ctx.source("raw_docs").withColumn(
            "text", text.redact_pii(F.col("text"))
        )
        q = text.quality_columns(df)
        return q.filter(F.col("keep_quality")).select(
            "doc_id", "text", "lang", "source", "n_tokens"
        )

    @p.model(materialized="table")
    def dedup_keepers(ctx):
        return dedup.exact_dedup_groups(ctx.ref("cleaned"), "doc_id")

    @p.model(materialized="table")
    def corpus(ctx):
        return ctx.ref("cleaned").join(
            ctx.ref("dedup_keepers").select(F.col("keep_id").alias("doc_id")),
            "doc_id",
        )

    @p.model(materialized="table")
    def sampled(ctx):
        return sampling.token_budget_sample(
            ctx.ref("corpus"), ["lang"], budget=BUDGET
        )

    @p.model(materialized="table")
    def chunks(ctx):
        kept = ctx.ref("corpus").join(
            ctx.ref("sampled").select("doc_id"), "doc_id"
        )
        return text.chunk_documents(kept, chunk_size=CHUNK, stride=STRIDE)

    @p.model(materialized="table")
    def packs(ctx):
        return packing.pack_sequences(
            ctx.ref("chunks").select(
                F.concat_ws("_", "doc_id", "chunk_idx").alias("doc_id"),
                F.col("chunk_text").alias("text"),
            ),
            max_tokens=PACK_CAP,
            id_col="doc_id",
            text_col="text",
        )

    @p.model(materialized="view")
    def corpus_stats(ctx):
        return (
            ctx.ref("corpus")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            )
        )

    t0 = time.perf_counter()
    statuses = {r.node: r.status for r in p.run()}
    wall = round(time.perf_counter() - t0, 1)
    assert set(statuses.values()) == {"success"}, statuses

    counts = {
        name: p.compile_node(name).count()
        for name in ("corpus", "sampled", "chunks")
    }
    # pack_sequences emits one row per input chunk with its pack
    # assignment; the pack count is the distinct id count
    packs = p.compile_node("packs")
    counts["pack_rows"] = packs.count()
    counts["packs"] = packs.select("pack_id").distinct().count()
    emit_gated(
        (
            {
                "metric": "pipeline_e2e_docs_per_sec",
                "value": round(n_docs / wall, 1),
                "unit": "docs/sec",
                "wall_sec": wall,
                "docs_in": n_docs,
                "rows": counts,
                "models": 6,
                "table_materializations": 5,
                "params": {
                    "budget": BUDGET,
                    "chunk": CHUNK,
                    "stride": STRIDE,
                    "pack_cap": PACK_CAP,
                    "threads": 4,
                },
                "sf_dir": SF_DIR,
                "loadavg_before": round(load0, 2),
                "loadavg_after": round(os.getloadavg()[0], 2),
            }
        ),
        load_gate,
    )
    # the probe owns its warehouse relations: drop + remove so reruns and
    # other probes in the same warehouse never trip over leftovers
    for name in ("dedup_keepers", "corpus", "sampled", "chunks", "packs"):
        try:
            spark.sql(f"DROP TABLE IF EXISTS {p.qualified(name)}")
        except Exception:
            pass
        d = os.path.join(wh, name.lower())
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
