#!/usr/bin/env python
"""Final A/B for the round-16 dd3 verify-tail rewrite (session 4).

Interleaves the SHIPPED-AT-HEAD dd3 (broadcast-friendly candidates +
dropDuplicates dedup + auto-broadcast verify; module snapshot
`operators/_dedup_r16head.py`) against the WORKING-TREE dd3
(exactly-once pair emission on carried bucket vectors, SHUFFLE_HASH
candidate join above the 16 MB gate, shuffle-hash verify join1 + gated
broadcast join2, exact-integer threshold condition) in ONE warm session,
min-of-N, noop sink, all persisted state released between runs.

Untimed first: pair-set identity — count and an order-insensitive
checksum over (doc1, doc2, jaccard) must match between the two shapes.

The baseline module is materialized from git on first run (the r16-close
dedup.py, commit 5f8a446) into `operators/_dedup_r16head.py` — an
untracked scratch file, so the old code is never committed twice.

Usage: python scripts/probe_dd3_tail_ab.py [repeats]  (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASELINE_REF = "5f8a446"
_snap = os.path.join(REPO, "dbt_analytics_spark", "operators", "_dedup_r16head.py")
if not os.path.exists(_snap):
    src = subprocess.check_output(
        ["git", "-C", REPO, "show",
         f"{BASELINE_REF}:dbt_analytics_spark/operators/dedup.py"]
    )
    with open(_snap, "wb") as fh:
        fh.write(src)

from pyspark.sql import functions as F  # noqa: E402

from dbt_analytics_spark.bench_gate import emit_gated, wait_for_quiet  # noqa: E402
from dbt_analytics_spark.operators import _dedup_r16head as dedup_old  # noqa: E402
from dbt_analytics_spark.operators import dedup as dedup_new  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NUM_HASHES, BANDS, K = 32, 8, 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def release_all():
    dedup_old.release_shingle_indexes()
    dedup_new.release_shingle_indexes()


def checksum(df):
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("doc1", "doc2", F.col("jaccard").cast("string")).cast(
                "decimal(38,0)"
            )
        ).alias("ck"),
    ).collect()[0]
    return row["n"], str(row["ck"])


def main() -> None:
    load_gate = wait_for_quiet()
    spark = get_spark("dd3_tail_ab")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    print(f"# documents rows: {docs.count()}", file=sys.stderr)

    def pairs_old():
        return dedup_old.minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_k=K, num_hashes=NUM_HASHES,
            bands=BANDS, threshold=0.5,
        )

    def pairs_new():
        return dedup_new.minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_k=K, num_hashes=NUM_HASHES,
            bands=BANDS, threshold=0.5,
        )

    # --- untimed identity check -----------------------------------------
    spark.sparkContext.setJobDescription("dd3 A/B: pair-set identity")
    n_old, ck_old = checksum(pairs_old())
    release_all()
    n_new, ck_new = checksum(pairs_new())
    release_all()
    print(f"# identity: old n={n_old} ck={ck_old}  new n={n_new} ck={ck_new}",
          file=sys.stderr)
    assert (n_old, ck_old) == (n_new, ck_new), "PAIR SETS DIFFER — do not ship"

    # --- timed interleaved A/B ------------------------------------------
    variants = {"full_head": pairs_old, "full_tree": pairs_new}
    raw: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPEATS):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"dd3 A/B {name} rep{rep}")
            t0 = time.monotonic()
            noop(fn())
            raw[name].append(round(time.monotonic() - t0, 4))
            release_all()
    spark.sparkContext.setJobDescription(None)

    emit_gated(
        {
            "metric": "dd3_tail_ab",
            "protocol": (
                f"min-of-{REPEATS}, interleaved, one warm session, noop sink, "
                "all persists released per run; identity-checked first"
            ),
            "rows": docs.count(),
            "sf_dir": SF_DIR,
            "pair_identity": {"n": n_old, "checksum": ck_old, "equal": True},
            "spark_min": {k: min(v) for k, v in raw.items()},
            "spark_raw": raw,
        },
        load_gate,
        samples=raw,
    )


if __name__ == "__main__":
    main()
