#!/usr/bin/env python
"""dd3 tail redesign A/B (round 16, session 3) — follows
probe_dd3_tail.py + the SQL-metrics attribution (diag_dd3_sqlmetrics):

  measured whales at 500k docs (cold attribution run):
   - pair-dedup hash aggs: 7.6 CPU-min (~14 s wall) over 176.5M
     pre-dedup rows (6.5x band inflation; diag: n_prededup=176,451,845)
   - three driver-side broadcast builds: banded 416 MiB + index
     260 MiB x2, NONE reused (InMemoryRelation/MapInArrow subtrees
     break exchange canonicalization — verified with minimal repros)
   - the sig pipeline computed TWICE (no ReuseExchange across the
     band self-join)

  variants:
   full       shipped control
   full_A     persist banded (manual reuse) + prefix-2 first-agree
              filter before the dedup + shipped broadcast verify
   full_B     persist banded + SHUFFLE-hash band join (the 100 TB
              shape: a corpus-sized banded relation can never ride a
              broadcast) + prefix-2 + one shared doc1 exchange for
              dedup AND verify join1 (shuffle) + single gated
              broadcast for verify join2 + integer t=0.5 condition
   full_B7    full_B with full once-emission (no dedup agg at all;
              banded carries the whole 8-long bucket vector)
   cand_B     full_B through the dedup only (stage split)

Usage: python scripts/probe_dd3_tail2.py [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.operators import dedup  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NUM_HASHES, BANDS, K = 32, 8, 3
RPB = NUM_HASHES // BANDS

_extra_persists = []


def release_all():
    dedup.release_shingle_indexes()
    while _extra_persists:
        _extra_persists.pop().unpersist()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def front_shingled(docs):
    shingled, _ = dedup._shingle_and_band(
        docs, "doc_id", "text", K, NUM_HASHES, BANDS,
        sig_mode="agg", shingle_mode="arrow",
    )
    return shingled


def banded_vec(shingled, persist=True):
    sig_df = dedup.minhash_signatures_agg(shingled, NUM_HASHES)
    vec = F.array(
        *[
            F.xxhash64(
                *[F.element_at("sig", b * RPB + r + 1) for r in range(RPB)]
            )
            for b in range(BANDS)
        ]
    )
    bd = sig_df.select("doc", vec.alias("vec")).select(
        "doc", "vec", F.posexplode("vec").alias("band", "bucket")
    )
    if persist:
        bd = bd.persist()
        _extra_persists.append(bd)
    return bd


def candidates_prefix2(bd, dedup_agg=True):
    """Band-bucket pairs with the prefix-2 first-agree filter: a pair
    agreeing at band 0 (or 1) is emitted ONLY there; residual multi-band
    duplicates (pairs agreeing only on bands 2-7) are caught by the
    dropDuplicates. Same pair SET as the shipped shape."""
    a, r = bd.alias("a"), bd.alias("r")
    pairs = (
        a.join(
            r,
            (F.col("a.band") == F.col("r.band"))
            & (F.col("a.bucket") == F.col("r.bucket")),
        )
        .filter(F.col("a.doc") < F.col("r.doc"))
        .filter(
            ((F.col("a.band") == 0) | (F.col("a.vec").getItem(0) != F.col("r.vec").getItem(0)))
            & ((F.col("a.band") <= 1) | (F.col("a.vec").getItem(1) != F.col("r.vec").getItem(1)))
        )
        .select(F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2"))
    )
    if dedup_agg:
        pairs = pairs.dropDuplicates(["doc1", "doc2"])
    return pairs


def candidates_once(bd):
    """Full once-emission: no dedup aggregate at all."""
    a, r = bd.alias("a"), bd.alias("r")
    earlier = None
    for b in range(BANDS - 1):
        t = (F.col("a.band") > b) & (
            F.col("a.vec").getItem(b) == F.col("r.vec").getItem(b)
        )
        earlier = t if earlier is None else (earlier | t)
    return (
        a.join(
            r,
            (F.col("a.band") == F.col("r.band"))
            & (F.col("a.bucket") == F.col("r.bucket")),
        )
        .filter(F.col("a.doc") < F.col("r.doc"))
        .filter(~earlier)
        .select(F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2"))
    )


def verify_broadcast(cand, shingled, threshold=0.5):
    """Shipped verify shape (two auto-broadcast joins, double-eval
    jaccard)."""
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


def verify_b(cand, shingled):
    """Design-B verify: join1 SHUFFLE-hash (shares the doc1 exchange with
    the dedup upstream), join2 a single explicit broadcast; t=0.5
    condition rewritten to exact integers (3n >= s1+s2)."""
    cand = cand.repartition(F.col("doc1"))
    j1 = cand.join(
        shingled.select(F.col("doc").alias("doc1"), F.col("sh").alias("sh1"))
        .hint("shuffle_hash"),
        "doc1",
    )
    j2 = j1.join(
        F.broadcast(
            shingled.select(F.col("doc").alias("doc2"), F.col("sh").alias("sh2"))
        ),
        "doc2",
    )
    n_inter = F.size(F.array_intersect("sh1", "sh2"))
    s12 = F.size("sh1") + F.size("sh2")
    return j2.filter(3 * n_inter >= s12).select(
        "doc1",
        "doc2",
        (
            n_inter.cast("double") / (s12.cast("double") - n_inter.cast("double"))
        ).alias("jaccard"),
    )


def main() -> None:
    load_gate = wait_for_quiet()
    spark = get_spark("dd3_tail2_probe")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    print(f"# documents rows: {docs.count()}", file=sys.stderr)

    def full():
        noop(
            dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", shingle_k=K, num_hashes=NUM_HASHES,
                bands=BANDS, threshold=0.5,
            )
        )

    def full_a():
        sh = front_shingled(docs)
        bd = banded_vec(sh)
        noop(verify_broadcast(candidates_prefix2(bd), sh))

    def full_b():
        sh = front_shingled(docs)
        bd = banded_vec(sh)
        a, r = bd.alias("a"), bd.hint("shuffle_hash").alias("r")
        pairs = (
            a.join(
                r,
                (F.col("a.band") == F.col("r.band"))
                & (F.col("a.bucket") == F.col("r.bucket")),
            )
            .filter(F.col("a.doc") < F.col("r.doc"))
            .filter(
                ((F.col("a.band") == 0) | (F.col("a.vec").getItem(0) != F.col("r.vec").getItem(0)))
                & ((F.col("a.band") <= 1) | (F.col("a.vec").getItem(1) != F.col("r.vec").getItem(1)))
            )
            .select(F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2"))
            .repartition(F.col("doc1"))
            .dropDuplicates(["doc1", "doc2"])
        )
        j1 = pairs.join(
            front_idx1(sh).hint("shuffle_hash"), "doc1"
        )
        j2 = j1.join(
            F.broadcast(
                sh.select(F.col("doc").alias("doc2"), F.col("sh").alias("sh2"))
            ),
            "doc2",
        )
        n_inter = F.size(F.array_intersect("sh1", "sh2"))
        s12 = F.size("sh1") + F.size("sh2")
        noop(
            j2.filter(3 * n_inter >= s12).select(
                "doc1",
                "doc2",
                (
                    n_inter.cast("double")
                    / (s12.cast("double") - n_inter.cast("double"))
                ).alias("jaccard"),
            )
        )

    def front_idx1(sh):
        return sh.select(F.col("doc").alias("doc1"), F.col("sh").alias("sh1"))

    def full_b7():
        sh = front_shingled(docs)
        bd = banded_vec(sh)
        a, r = bd.alias("a"), bd.hint("shuffle_hash").alias("r")
        earlier = None
        for b in range(BANDS - 1):
            t = (F.col("a.band") > b) & (
                F.col("a.vec").getItem(b) == F.col("r.vec").getItem(b)
            )
            earlier = t if earlier is None else (earlier | t)
        cand = (
            a.join(
                r,
                (F.col("a.band") == F.col("r.band"))
                & (F.col("a.bucket") == F.col("r.bucket")),
            )
            .filter(F.col("a.doc") < F.col("r.doc"))
            .filter(~earlier)
            .select(F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2"))
        )
        noop(verify_b(cand, sh))

    def cand_b():
        sh = front_shingled(docs)
        bd = banded_vec(sh)
        a, r = bd.alias("a"), bd.hint("shuffle_hash").alias("r")
        pairs = (
            a.join(
                r,
                (F.col("a.band") == F.col("r.band"))
                & (F.col("a.bucket") == F.col("r.bucket")),
            )
            .filter(F.col("a.doc") < F.col("r.doc"))
            .filter(
                ((F.col("a.band") == 0) | (F.col("a.vec").getItem(0) != F.col("r.vec").getItem(0)))
                & ((F.col("a.band") <= 1) | (F.col("a.vec").getItem(1) != F.col("r.vec").getItem(1)))
            )
            .select(F.col("a.doc").alias("doc1"), F.col("r.doc").alias("doc2"))
            .repartition(F.col("doc1"))
            .dropDuplicates(["doc1", "doc2"])
        )
        noop(pairs)

    vs = {
        "full": full,
        "full_A": full_a,
        "full_B": full_b,
        "full_B7": full_b7,
        "cand_B": cand_b,
    }

    for fn in vs.values():  # warm
        fn()
        release_all()

    sp = {k: [] for k in vs}
    for _ in range(REPEATS):
        for k, fn in vs.items():
            t0 = time.perf_counter()
            fn()
            sp[k].append(round(time.perf_counter() - t0, 4))
            release_all()

    emit_gated(
        {
            "metric": "dd3_tail_redesign_ab",
            "protocol": f"min-of-{REPEATS}, variants interleaved, one warm "
            "session, noop sink, all persists released per run",
            "sf_dir": SF_DIR,
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
