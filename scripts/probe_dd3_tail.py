#!/usr/bin/env python
"""dd3 tail decomposition on the ARROW front half (round 16, session 3).

BENCH_DD3_DECOMP_r16's `banded`/`candidates` stages were pinned to the
r15 expression path for cross-round comparability, so the tail of the
SHIPPED (arrow+agg) pipeline was never split: sig_arrow 6.1 s ->
full 25.9 s leaves ~19.8 s across banding, the bucket self-join, the
pair dedup and the exact-Jaccard verify. This probe splits that tail
and A/Bs the candidate restructures:

  banded_arrow   arrow shingles + agg sigs + band explode -> noop
  cand_shipped   + bucket self-join + dropDuplicates (shipped shape)
  cand_once      + exactly-once pair emission (first-agreeing-band
                   filter on carried bucket vectors; NO dedup agg)
  full           the shipped dd3 (auto modes)
  full_once      once-emission candidates + shipped verify
  full_once_int  once-emission + integer-rewritten t=0.5 verify
                   condition (3*n_inter >= s1+s2; provably the same
                   pair set — see proof in the A/B notes)
  full_nobc      shipped dd3 with autoBroadcastJoinThreshold=-1
                   (prices the three driver-side broadcast builds)

Untimed diagnostics printed to stderr first: candidate pairs, pairs
surviving the t=0.5 verify, pairs passing the size precondition
(3*min(s1,s2) >= s1+s2) — the data that decides which verify
restructures can matter at all.

Usage: python scripts/probe_dd3_tail.py [repeats] (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.operators import dedup  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NUM_HASHES, BANDS, K = 32, 8, 3
RPB = NUM_HASHES // BANDS


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def front_shingled(docs):
    """Arrow-hashed shingle index, persisted exactly like the shipped op."""
    shingled, _banded = dedup._shingle_and_band(
        docs, "doc_id", "text", K, NUM_HASHES, BANDS,
        sig_mode="agg", shingle_mode="arrow",
    )
    return shingled


def banded_vec(shingled):
    """(doc, vec array<long>[BANDS], band, bucket) — same band buckets as
    the shipped explode (xxhash64 over the band's sig slots), but the
    full bucket vector rides along for the first-agreeing-band filter."""
    sig_df = dedup.minhash_signatures_agg(shingled, NUM_HASHES)
    vec = F.array(
        *[
            F.xxhash64(
                *[F.element_at("sig", b * RPB + r + 1) for r in range(RPB)]
            )
            for b in range(BANDS)
        ]
    )
    return (
        sig_df.select("doc", vec.alias("vec"))
        .select("doc", "vec", F.posexplode("vec").alias("band", "bucket"))
    )


def candidates_once(shingled):
    bd = banded_vec(shingled)
    a, r = bd.alias("a"), bd.alias("r")
    pairs = a.join(
        r,
        (F.col("a.band") == F.col("r.band"))
        & (F.col("a.bucket") == F.col("r.bucket")),
    ).filter(F.col("a.doc") < F.col("r.doc"))
    earlier = reduce(
        lambda x, y: x | y,
        [
            (F.col("a.band") > b)
            & (F.col("a.vec").getItem(b) == F.col("r.vec").getItem(b))
            for b in range(BANDS - 1)
        ],
    )
    return pairs.filter(~earlier).select(
        F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2")
    )


def candidates_shipped(shingled):
    bd = banded_vec(shingled).select("doc", "band", "bucket")
    a, r = bd.alias("a"), bd.alias("r")
    return (
        a.join(
            r,
            (F.col("a.band") == F.col("r.band"))
            & (F.col("a.bucket") == F.col("r.bucket")),
        )
        .filter(F.col("a.doc") < F.col("r.doc"))
        .select(F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2"))
        .dropDuplicates(["doc1", "doc2"])
    )


def verify_shipped(cand, shingled, threshold=0.5):
    return (
        cand.join(
            shingled.select(F.col("doc").alias("doc1"), F.col("sh").alias("sh1")),
            "doc1",
        )
        .join(
            shingled.select(F.col("doc").alias("doc2"), F.col("sh").alias("sh2")),
            "doc2",
        )
        .withColumn("n_inter", F.size(F.array_intersect("sh1", "sh2")).cast("double"))
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.size("sh1") + F.size("sh2") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def verify_int(cand, shingled):
    """t=0.5 condition rewritten to exact integers: J >= 0.5 with
    J = n/(s1+s2-n) and integer n,s is equivalent to 3n >= s1+s2 (the
    double division can only round across the 0.5 boundary when
    |2n-(s1+s2-n)|/(s1+s2-n) < 2^-52, impossible for nonzero integer
    numerator at any feasible array size)."""
    n_inter = F.size(F.array_intersect("sh1", "sh2"))
    s12 = F.size("sh1") + F.size("sh2")
    return (
        cand.join(
            shingled.select(F.col("doc").alias("doc1"), F.col("sh").alias("sh1")),
            "doc1",
        )
        .join(
            shingled.select(F.col("doc").alias("doc2"), F.col("sh").alias("sh2")),
            "doc2",
        )
        .filter((3 * F.least(F.size("sh1"), F.size("sh2")) >= s12) & (3 * n_inter >= s12))
        .select(
            "doc1",
            "doc2",
            (
                n_inter.cast("double")
                / (s12.cast("double") - n_inter.cast("double"))
            ).alias("jaccard"),
        )
    )


def main() -> None:
    load_gate = wait_for_quiet()
    spark = get_spark("dd3_tail_probe")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_rows = docs.count()
    print(f"# documents rows: {n_rows}", file=sys.stderr)

    # ---- untimed diagnostics -------------------------------------------
    sh = front_shingled(docs)
    cand = candidates_shipped(sh)
    n_cand = cand.count()
    sized = cand.join(
        sh.select(F.col("doc").alias("doc1"), F.size("sh").alias("s1")), "doc1"
    ).join(sh.select(F.col("doc").alias("doc2"), F.size("sh").alias("s2")), "doc2")
    n_sizeok = sized.filter(
        3 * F.least("s1", "s2") >= F.col("s1") + F.col("s2")
    ).count()
    n_surv = verify_shipped(cand, sh).count()
    # pre-dedup pair volume (the dedup agg's true input)
    bd = banded_vec(sh).select("doc", "band", "bucket")
    a, r = bd.alias("a"), bd.alias("r")
    n_prededup = (
        a.join(
            r,
            (F.col("a.band") == F.col("r.band"))
            & (F.col("a.bucket") == F.col("r.bucket")),
        )
        .filter(F.col("a.doc") < F.col("r.doc"))
        .count()
    )
    diag = {
        "n_candidates": n_cand,
        "n_prededup_pair_rows": n_prededup,
        "n_size_precondition_pass": n_sizeok,
        "n_survivors": n_surv,
    }
    print(f"# diag: {diag}", file=sys.stderr)
    dedup.release_shingle_indexes()

    # ---- timed variants ------------------------------------------------
    def banded_arrow():
        noop(banded_vec(front_shingled(docs)).select("doc", "band", "bucket"))

    def cand_shipped():
        noop(candidates_shipped(front_shingled(docs)))

    def cand_once():
        noop(candidates_once(front_shingled(docs)))

    def full():
        noop(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", shingle_k=K, num_hashes=NUM_HASHES,
                bands=BANDS, threshold=0.5,
            )
        )

    def full_once():
        sh = front_shingled(docs)
        noop(verify_shipped(candidates_once(sh), sh))

    def full_once_int():
        sh = front_shingled(docs)
        noop(verify_int(candidates_once(sh), sh))

    def full_nobc():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            full()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )

    vs = {
        "banded_arrow": banded_arrow,
        "cand_shipped": cand_shipped,
        "cand_once": cand_once,
        "full": full,
        "full_once": full_once,
        "full_once_int": full_once_int,
        "full_nobc": full_nobc,
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
            "metric": "dd3_tail_decomposition_arrow",
            "protocol": f"min-of-{REPEATS}, stages interleaved, one warm "
            "session, noop sink, shingle index released per run",
            "rows": n_rows,
            "sf_dir": SF_DIR,
            "diag": diag,
            "spark_min": {k: min(v) for k, v in sp.items()},
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
