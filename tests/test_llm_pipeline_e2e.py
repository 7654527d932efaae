"""End-to-end LLM training-data pipeline through the ENGINE surface.

Every prior test exercises the operators directly; this one proves the
composition a real user runs: a dbt-style Project whose models chain
clean (PII redaction + quality gates) → exact dedup → language ID →
chunking → token-budget sampling → sequence packing → corpus stats,
materialized through the registry (tables/views/ephemeral), gated by
generic data tests, and driven by node selection — the same engine
path as the reference's `dbt run` (SP/dbt/task/run.py), with the
LLM-extension operators as the model bodies.

Invariants asserted at the END of the pipeline (not per-operator):
 - no PII marker survives into any downstream relation;
 - dedup keeps exactly one doc per fingerprint and chunk/sample/pack
   stages only ever see kept docs;
 - every pack respects the token cap (oversize singletons flagged);
 - the sampled corpus respects the per-language token budget.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_analytics_spark.operators import dedup, packing, sampling, text
from dbt_analytics_spark.plans import Project, not_null, unique
from dbt_analytics_spark.sources import load_testdata

from .conftest import SF_DIR

BUDGET = 2_000  # tokens per language
PACK_CAP = 256  # tokens per packed sequence


@pytest.fixture(scope="module")
def pipeline(spark):
    p = Project(spark, name="llm_pipe", run_date=dt.date(2026, 1, 1), threads=4)
    docs = load_testdata(spark, SF_DIR)["documents"]
    # Plant PII + exact dups so the gates have something to catch.
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(F.col("text"), F.lit(" mail me at alice@example.com")),
        ).otherwise(F.col("text")),
    )
    dup = planted.filter(F.col("doc_id") % 101 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    p.source_table("raw_docs", planted.unionByName(dup))

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
        return (
            ctx.ref("cleaned")
            .join(
                ctx.ref("dedup_keepers").select(
                    F.col("keep_id").alias("doc_id")
                ),
                "doc_id",
            )
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
        return text.chunk_documents(kept, chunk_size=64, stride=48)

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

    p.test("dedup_keepers", "not_null", not_null("keep_id"))
    p.test("dedup_keepers", "unique", unique("fingerprint"))
    p.test("packs", "unique", unique("doc_id"))
    return p


def test_pipeline_runs_green(pipeline):
    statuses = {r.node: r.status for r in pipeline.run()}
    assert set(statuses.values()) == {"success"}, statuses
    tests = {r.node: r.status for r in pipeline.run_tests()}
    assert set(tests.values()) == {"success"}, tests


def test_pipeline_invariants(pipeline, spark):
    pipeline.run()
    corpus = pipeline.compile_node("corpus")
    # PII never survives the clean stage, anywhere downstream.
    assert corpus.filter(F.col("text").contains("@example.com")).count() == 0
    # Dedup: the planted exact copies collapsed to one keeper each.
    keepers = pipeline.compile_node("dedup_keepers")
    assert keepers.filter(F.col("n_copies") >= 2).count() > 0
    ids = corpus.select("doc_id").distinct()
    assert ids.count() == corpus.count()  # one row per kept doc
    # Sampling: per-language inclusive running totals within budget.
    sampled = pipeline.compile_node("sampled")
    over = sampled.filter(F.col("cum_tok") > BUDGET).count()
    assert over == 0
    # Packing: token cap respected except flagged oversize singletons.
    packs = pipeline.compile_node("packs")
    totals = packs.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = totals.filter(
        (F.col("tot") > PACK_CAP) & (F.col("has_oversize") == 0)
    ).count()
    assert bad == 0
    oversize = totals.filter(F.col("has_oversize") == 1)
    assert oversize.filter(F.col("n") > 1).count() == 0  # singletons
    # Stats relation lines up with the corpus it describes.
    stats = {
        r["lang"]: (r["n_docs"], r["n_tokens"])
        for r in pipeline.compile_node("corpus_stats").collect()
    }
    direct = {
        r["lang"]: (r["cnt"], r["tok"])
        for r in corpus.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert stats == direct


def test_pipeline_selection_subgraph(pipeline):
    # `+packs` builds exactly the ancestry (dbt node selection), proving
    # the DAG wiring is what the model bodies imply.
    from dbt_analytics_spark.plans.selection import select_nodes

    picked = select_nodes(pipeline, "+packs")
    assert {"cleaned", "dedup_keepers", "corpus", "sampled", "chunks", "packs"} <= set(
        picked
    )
    assert "corpus_stats" not in picked
