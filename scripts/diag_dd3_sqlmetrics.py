#!/usr/bin/env python
"""One-off diagnostic: run the shipped dd3 once (noop sink) with the UI
enabled and dump the SQL-tab operator metrics (per-node time, rows,
broadcast build time) so the verify tail's cost is attributed to real
operators instead of guessed. Not an artifact — a debugging aid
(guide §7.1: the SQL tab is where stages map back to operators)."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_analytics_spark.operators import dedup  # noqa: E402
from dbt_analytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scratch/sf10")


def main() -> None:
    spark = get_spark(
        "dd3_sqlmetrics", extra_conf={"spark.ui.enabled": "true"}
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()

    t0 = time.perf_counter()
    out = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_k=3, num_hashes=32, bands=8,
        threshold=0.5,
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"# dd3 wall: {wall:.2f}s", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    base = "http://localhost:4040/api/v1/applications/" + app_id
    execs = json.load(
        urllib.request.urlopen(base + "/sql?details=true&length=50")
    )
    # the dd3 noop write is the LAST (largest) execution
    ex = max(execs, key=lambda e: e.get("duration", 0))
    print(f"# exec id={ex['id']} status={ex['status']} duration={ex['duration']}ms")
    detail = json.load(
        urllib.request.urlopen(
            base + f"/sql/{ex['id']}?details=true&planDescription=false"
        )
    )
    for node in detail.get("nodes", []):
        metrics = {
            m["name"]: m["value"]
            for m in node.get("metrics", [])
            if any(
                k in m["name"]
                for k in (
                    "time", "rows", "size", "build", "spill", "batches",
                )
            )
        }
        if metrics:
            print(f"node {node['nodeId']:3d} {node['nodeName']}: "
                  + json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
