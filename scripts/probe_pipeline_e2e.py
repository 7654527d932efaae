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


def duckdb_leg(sf_dir: str) -> tuple[float, dict[str, int]]:
    """The denominator (VERDICT r15 item 7): the SAME six-model pipeline
    on the same parquet, DuckDB for everything SQL-expressible plus the
    exact pure-Python packer for the procedural stage, with the same
    materialization pattern (cleaned inlined per consumer exactly like
    the engine's ephemeral model; 5 table materializations + 1 view).
    Stage semantics are copied from the oracled per-op SQL (TXT2/TXT8
    quality+redaction, DD1 fingerprint grouping, SMP6 draw-order budget,
    TXT9 chunking) with this pipeline's parameters; the packer runs
    ``operators.packing._pack_group`` itself (pandas groupby) with
    group ids from the numpy XXH64 that is pinned bit-identical to
    Spark's ``xxhash64`` — so every stage computes the engine's exact
    result and the row counts below are asserted equal by the caller."""
    import duckdb
    import numpy as np
    import pandas as pd

    from dbt_analytics_spark.operators.packing import _pack_group
    from dbt_analytics_spark.operators.shingle_arrow import xxh64_windows
    from dbt_analytics_spark.operators.text import PII_PATTERNS

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute(
        "CREATE VIEW raw_docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    redacted = "text"
    for _, pat, repl in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    norm = "TRIM(regexp_replace(t, '\\s+', ' ', 'g'))"
    # cleaned is EPHEMERAL in the engine pipeline — inline it per
    # consumer (dedup_keepers and corpus both recompute it, exactly like
    # ctx.ref('cleaned') inlines the frame twice).
    cleaned = f"""
      SELECT doc_id, t AS text, lang, source, n_tokens FROM (
        SELECT doc_id, t, lang, source,
               CAST(len(string_split({norm}, ' ')) AS INTEGER) AS n_tokens,
               CASE WHEN len(string_split({norm}, ' ')) > 0
                    THEN CAST(len(list_distinct(string_split({norm}, ' '))) AS DOUBLE)
                         / len(string_split({norm}, ' ')) ELSE 0.0 END AS ttr,
               CASE WHEN len(string_split({norm}, ' ')) > 0
                    THEN CAST(LENGTH(t) - (len(string_split({norm}, ' ')) - 1) AS DOUBLE)
                         / len(string_split({norm}, ' ')) ELSE 0.0 END AS mtl
        FROM (SELECT doc_id, {redacted} AS t, lang, source FROM raw_docs)
      ) WHERE n_tokens >= 10 AND ttr >= 0.1 AND mtl >= 2.0 AND mtl <= 12.0
    """
    t0 = time.perf_counter()
    con.execute(
        f"""CREATE TABLE dedup_keepers AS
        SELECT md5(LOWER(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
               MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM ({cleaned}) GROUP BY 1"""
    )
    con.execute(
        f"""CREATE TABLE corpus AS
        SELECT c.* FROM ({cleaned}) c
        JOIN (SELECT keep_id AS doc_id FROM dedup_keepers) k USING (doc_id)"""
    )
    con.execute(
        f"""CREATE TABLE sampled AS
        WITH t AS (
          SELECT lang, doc_id,
                 CAST(len(string_split(TRIM(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tok,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS draw
          FROM corpus
        ), c AS (
          SELECT lang, doc_id, n_tok,
                 SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY draw, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum_tok
          FROM t
        )
        SELECT lang, doc_id, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
        FROM c WHERE cum_tok <= {BUDGET}"""
    )
    con.execute(
        f"""CREATE TABLE chunks AS
        WITH t AS (
          SELECT c.doc_id,
                 string_split(TRIM(regexp_replace(c.text, '\\s+', ' ', 'g')), ' ') AS toks
          FROM corpus c JOIN (SELECT doc_id FROM sampled) s USING (doc_id)
        ), s AS (
          SELECT doc_id, toks,
                 CASE WHEN len(toks) <= {CHUNK} THEN 1
                      ELSE CAST(ceil((len(toks) - {CHUNK}) / {STRIDE}.0) AS BIGINT) + 1
                 END AS n_chunks
          FROM t
        )
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
               CAST(len(toks[i * {STRIDE} + 1 : i * {STRIDE} + {CHUNK}]) AS INTEGER) AS n_chunk_tokens,
               array_to_string(toks[i * {STRIDE} + 1 : i * {STRIDE} + {CHUNK}], ' ') AS chunk_text
        FROM s, UNNEST(range(0, n_chunks)) AS g(i)"""
    )
    # packs: the procedural greedy stage — pure-Python exact replica.
    # chunk_text is a single-space token join, so its token count IS
    # n_chunk_tokens (corpus docs have >= 10 tokens; no empty chunks).
    sized = con.execute(
        "SELECT doc_id || '_' || CAST(chunk_idx AS VARCHAR) AS doc_id, "
        "CAST(n_chunk_tokens AS BIGINT) AS n_tokens FROM chunks"
    ).fetch_df()
    ids = sized["doc_id"].to_numpy()
    joined = "".join(ids).encode("utf-8")
    lens = np.array([len(i.encode("utf-8")) for i in ids], dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    buf = np.frombuffer(joined, dtype=np.uint8)
    sized["group_id"] = xxh64_windows(buf, starts, lens) % np.int64(64)
    packed = pd.concat(
        [
            _pack_group(g, PACK_CAP)
            for _, g in sized.groupby("group_id", sort=False)
        ],
        ignore_index=True,
    )
    con.register("packed_df", packed)
    con.execute("CREATE TABLE packs AS SELECT * FROM packed_df")
    con.execute(
        """CREATE VIEW corpus_stats AS
        SELECT lang, COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens
        FROM corpus GROUP BY lang"""
    )
    wall = round(time.perf_counter() - t0, 1)
    counts = {
        "corpus": con.execute("SELECT count(*) FROM corpus").fetchone()[0],
        "sampled": con.execute("SELECT count(*) FROM sampled").fetchone()[0],
        "chunks": con.execute("SELECT count(*) FROM chunks").fetchone()[0],
        "pack_rows": con.execute("SELECT count(*) FROM packs").fetchone()[0],
        "packs": con.execute(
            "SELECT count(DISTINCT pack_id) FROM packs"
        ).fetchone()[0],
    }
    con.close()
    return wall, counts


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
    results = p.run()
    wall = round(time.perf_counter() - t0, 1)
    statuses = {r.node: r.status for r in results}
    assert set(statuses.values()) == {"success"}, statuses
    # Per-stage attribution (VERDICT r16 item 8): each node's own
    # materialization wall, straight from the runner's RunResults. The
    # level-parallel runner (threads=4) can overlap nodes, so these sum
    # to >= wall only when levels are wider than one node.
    stage_seconds = {
        r.node: round(r.execution_time, 2) for r in results
    }

    counts = {
        name: p.compile_node(name).count()
        for name in ("corpus", "sampled", "chunks")
    }
    # pack_sequences emits one row per input chunk with its pack
    # assignment; the pack count is the distinct id count
    packs = p.compile_node("packs")
    counts["pack_rows"] = packs.count()
    counts["packs"] = packs.select("pack_id").distinct().count()
    # Denominator leg (VERDICT r15 item 7): same pipeline, DuckDB +
    # exact-Python packer, run AFTER the timed Spark window on the same
    # quiet host. Equal row counts anchor that both engines computed the
    # same pipeline; a count mismatch refuses the artifact.
    duck_wall, duck_counts = duckdb_leg(SF_DIR)
    assert duck_counts == counts, (counts, duck_counts)
    emit_gated(
        (
            {
                "metric": "pipeline_e2e_docs_per_sec",
                "value": round(n_docs / wall, 1),
                "unit": "docs/sec",
                "wall_sec": wall,
                "docs_in": n_docs,
                "duckdb_wall_sec": duck_wall,
                "duckdb_docs_per_sec": round(n_docs / duck_wall, 1),
                "spark_over_duckdb": round(wall / duck_wall, 2),
                "denominator": "DuckDB SQL stages + exact pure-Python "
                "packer (operators.packing._pack_group over xxhash64 "
                "groups), same materialization pattern; row counts "
                "asserted equal to the Spark leg",
                "rows": counts,
                "stage_seconds": stage_seconds,
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
