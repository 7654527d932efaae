#!/usr/bin/env python
"""Build a one-off ~sf1 dataset under .scratch/sf1/ for data-bound benching.

10 key-offset copies of the sf0.1 tables (6M-row lineitem, 1.5M orders,
1M events, 50k documents, 20k embeddings), written as parquet
DuckDB-side. Foreign keys are offset consistently so every join in the
headline queries still matches copy-locally:

  copy i: custkey += i*MAXC, orderkey += i*MAXO, partkey += i*MAXP,
          suppkey += i*MAXS, doc_id += i*MAXD, vec_id += i*MAXV,
          event_id += i*MAXE, user_id += i*MAXU

nation/region are fixed dims and stay as-is (nationkey/regionkey NOT
offset, so the 10 copies share them — exactly how a real scale-up keeps
small dims fixed). Document text gets a per-copy ' v{i}' suffix (and
n_chars recomputed) so cross-copy rows are NOT byte-identical clones —
the round-5 probe's identical copies made dd3's candidate pairs grow
quadratically in clone count, which measures pair volume, not scan
throughput. Embedding vectors keep their values (timing is matmul-bound;
ties don't affect wall-clock).

Usage: python scripts/build_sf1.py [src_dir] [dst_dir] [n_copies]
Then:  SPARK_GRAFT_SF_DIR=/root/repo/.scratch/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
NCOPY = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    mx = {}
    for t, k in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        # keys are 0-based, so the stride must be max+1 or copy i's key 0
        # collides with copy i-1's max key
        mx[k] = con.execute(f"SELECT max({k}) FROM {src(t)}").fetchone()[0] + 1
    mx["user_id"] = con.execute(
        f"SELECT max(user_id) FROM {src('events')}"
    ).fetchone()[0] + 1
    print("key maxima:", mx)

    copies = f"(SELECT unnest(range({NCOPY})) AS i)"

    jobs = {
        # fixed dims — byte-for-byte
        "region": f"SELECT * FROM {src('region')}",
        "nation": f"SELECT * FROM {src('nation')}",
        "customer": f"""
            SELECT c_custkey + i*{mx['c_custkey']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, {copies}""",
        "supplier": f"""
            SELECT s_suppkey + i*{mx['s_suppkey']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src('supplier')}, {copies}""",
        "part": f"""
            SELECT p_partkey + i*{mx['p_partkey']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}, {copies}""",
        "orders": f"""
            SELECT o_orderkey + i*{mx['o_orderkey']} AS o_orderkey,
                   o_custkey + i*{mx['c_custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + i*{mx['o_orderkey']} AS l_orderkey,
                   l_partkey + i*{mx['p_partkey']} AS l_partkey,
                   l_suppkey + i*{mx['s_suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {copies}""",
        "events": f"""
            SELECT event_id + i*{mx['event_id']} AS event_id, ts,
                   user_id + i*{mx['user_id']} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {copies}""",
        "documents": f"""
            SELECT doc_id + i*{mx['doc_id']} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' v' || i END AS text,
                   lang, source,
                   CAST(length(CASE WHEN i = 0 THEN text
                                    ELSE text || ' v' || i END) AS BIGINT)
                       AS n_chars
            FROM {src('documents')}, {copies}""",
        "embeddings": f"""
            SELECT vec_id + i*{mx['vec_id']} AS vec_id, embedding, label
            FROM {src('embeddings')}, {copies}""",
    }
    for t, q in jobs.items():
        out = f"{DST}/{t}.parquet"
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
