#!/usr/bin/env python
"""dd3_minhash_lsh stage decomposition (VERDICT r14 item 2: 30.8 s at
sf10 = 64% of the headline suite's wall time, never decomposed — no
DuckDB denominator, so it escapes the ratio table).

Stages (cumulative prefixes of the shipped pipeline, noop sink, shingle
index released between runs so every run pays the real compute):

  scan_floor     documents scan -> noop
  shingle_only   fan_out + non-blank + hashed k-shingles -> noop
  sig_fold       + minhash signature via the F.aggregate fold (shipped)
  sig_agg        + signature via posexplode + 32 codegen min-aggs
  banded         + band hashes + explode (fold path)
  candidates     + bucket self-join + pair dedup (fold path)
  full           the shipped dd3 (fold) incl. exact Jaccard verify
  full_agg       the same with sig_mode='agg'

Stage deltas name the floor per stage; the fold-vs-agg A/B decides the
shipped signature mode at this scale. min-of-N interleaved; shared
load/drift gate (the artifact refuses to emit on failure).

Usage: python scripts/probe_dd3_decomp.py [repeats] (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.operators import dedup  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    load_gate = wait_for_quiet()
    spark = get_spark("dd3_decomp_probe")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_rows = docs.count()
    print(f"# documents rows: {n_rows}", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def front(sig_mode, shingle_mode="expr"):
        # shingle_mode pinned to "expr" for the r15-comparable stages —
        # auto now resolves to the Arrow pass above
        # SHINGLE_ARROW_MIN_BYTES (r16), which would silently change
        # what the historical stage names measure.
        return dedup._shingle_and_band(
            docs, "doc_id", "text", 3, 32, 8,
            sig_mode=sig_mode, shingle_mode=shingle_mode,
        )

    def shingle_only():
        shingled, _ = front("fold")
        noop(shingled)

    def shingle_arrow():
        shingled, _ = front("fold", shingle_mode="arrow")
        noop(shingled)

    def sig_arrow():
        # arrow shingles + whatever sig mode auto resolves (agg at sf10)
        from pyspark.sql import functions as F

        shingled, _ = front("auto", shingle_mode="arrow")
        mode = dedup._resolve_sig_mode(docs, "auto")
        if mode == "agg":
            noop(dedup.minhash_signatures_agg(shingled, 32))
        else:
            noop(
                shingled.withColumn(
                    "sig",
                    dedup.minhash_signature(F.col("sh"), 32, pre_hashed=True),
                ).select("doc", "sig")
            )

    def sig_fold():
        from pyspark.sql import functions as F

        shingled, _ = front("fold")
        noop(
            shingled.withColumn(
                "sig",
                dedup.minhash_signature(F.col("sh"), 32, pre_hashed=True),
            ).select("doc", "sig")
        )

    def sig_agg():
        shingled, _ = front("fold")
        noop(dedup.minhash_signatures_agg(shingled, 32))

    def banded():
        _, bd = front("fold")
        noop(bd)

    def candidates():
        from pyspark.sql import functions as F

        _, bd = front("fold")
        a, b = bd.alias("a"), bd.alias("r")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("r.band"))
                & (F.col("a.bucket") == F.col("r.bucket")),
            )
            .filter(F.col("a.doc") < F.col("r.doc"))
            .select(
                F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2")
            )
            .dropDuplicates(["doc1", "doc2"])
        )
        noop(cand)

    def full():
        # shipped defaults: every mode auto — at sf10 that is arrow
        # shingles + agg signatures (r16)
        noop(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", shingle_k=3, num_hashes=32,
                bands=8, threshold=0.5,
            )
        )

    def full_expr():
        # the r15-shipped pipeline (expression shingles, sig auto) — the
        # cross-round "before" leg; r15's artifact called this "full"
        noop(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", shingle_k=3, num_hashes=32,
                bands=8, threshold=0.5, shingle_mode="expr",
            )
        )

    def full_agg():
        noop(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", shingle_k=3, num_hashes=32,
                bands=8, threshold=0.5, sig_mode="agg",
                shingle_mode="expr",
            )
        )

    vs = {
        "scan_floor": lambda: noop(docs.select("doc_id", "text")),
        "shingle_only": shingle_only,
        "shingle_arrow": shingle_arrow,
        "sig_fold": sig_fold,
        "sig_agg": sig_agg,
        "sig_arrow": sig_arrow,
        "banded": banded,
        "candidates": candidates,
        "full": full,
        "full_expr": full_expr,
        "full_agg": full_agg,
    }

    for fn in vs.values():  # warm
        fn()
        dedup.release_shingle_indexes()

    sp = {k: [] for k in vs}
    for _ in range(REPEATS):
        for k, fn in vs.items():
            t0 = time.perf_counter()
            fn()
            sp[k].append(round(time.perf_counter() - t0, 4))
            dedup.release_shingle_indexes()

    emit_gated(
        {
            "metric": "dd3_stage_decomposition",
            "protocol": f"min-of-{REPEATS}, stages interleaved, one warm "
            "session, noop sink, shingle index released per run",
            "rows": n_rows,
            "sf_dir": SF_DIR,
            "spark_min": {k: min(v) for k, v in sp.items()},
            "stage_delta": {},  # filled by reader; mins are the artifact
            "spark_drift_band": {
                k: round((max(v) - min(v)) / min(v), 3) for k, v in sp.items()
            },
            "spark_raw": sp,
        },
        load_gate,
        samples={f"spark/{k}": v for k, v in sp.items()},
    )
    spark.stop()


if __name__ == "__main__":
    main()
