"""Engine-owned bucketed star-schema layout.

The measured residual on the fact⋈dim-then-tiny-agg shape (j1/w3;
reference: models/metrics_monthly.sql:57-59 customer⋈nation⋈region spend
rollup) is the per-query join setup itself: ~1.0 s of driver-side
broadcast build, or an orders-side shuffle, at sf10 — while DuckDB
pipelines a shared-memory build+probe (BENCH_NOTES round-7 session-2
decomposition). The layout answer, measured at 0.73 s with ZERO
exchanges, is to pay one bucketed write up front and join co-located
forever: Hive-style ``bucketBy(n, key).sortBy(key)`` on BOTH sides of
the join key, the same write path the E2 materializer exposes via
``bucket_by=``/``n_buckets=`` (plans/materialize.py) and pins green in
tests/test_engine.py::test_bucketed_tables_join_without_shuffle.

That is the 100 TB design for a star schema queried repeatedly on the
same keys: the one-time layout cost (9.4 s at sf10) amortizes across
every subsequent join, no broadcast build per query, no fact shuffle,
and — unlike a broadcast dim — no driver memory ceiling, so the same
plan shape survives a cluster-scale dim. AQE/bucketed scan handles the
per-bucket parallelism; ``n_buckets`` should track cluster cores at
real scale (32 here to match local[32]).

Cross-session reuse: managed-table METADATA lives in the session's
in-memory catalog, but the bucketed FILES persist in the warehouse dir.
``ensure_star_layout`` therefore re-registers existing files as an
external bucketed table (``CREATE TABLE … CLUSTERED BY … LOCATION``)
when the catalog entry is gone but the data is not — a fresh benchmark
process pays zero rebuild. Spark derives bucket ids from the file names,
so the re-registered table joins exchange-free exactly like the
original.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_testdata

#: Bucket count for the local[32] bench layout; at cluster scale this
#: tracks total cores (and, like any layout choice, is part of the
#: table's physical contract — both join sides must agree).
N_BUCKETS = 32

#: Physical-layout version: bump when the stored schema/derivation
#: changes so stale warehouse files are never re-registered under the
#: new contract. v2 added the o_cents column; v3 switched the codec to
#: zstd (measured at sf10, fresh rewrites same session: scan+agg 0.43 s
#: zstd vs 0.52 s snappy vs 0.46 s uncompressed, j1b 0.60/0.73/0.67 s,
#: and the smallest files — 196M vs 274M/409M — so zstd wins BOTH the
#: decode path and the IO/storage bill; at 100 TB fewer bytes is the
#: dominant term). v4 added n_nationkey to the custmap dim: the r12
#: stage decomposition (BENCH_J1B_STAGES_r12) measured the fact-join
#: residual as STRING PAYLOAD carried through the hash-join probe —
#: keys-only join 2.0 s at 240M rows vs 8.9 s carrying n_name/r_name —
#: so join-heavy rollups prune to the int key, aggregate on it, and
#: attach names to the tiny post-agg frame instead.
#:
#: Versions are PER TABLE: v4 touched only the dim derivation, and at
#: the 100 TB north star a dim schema change must never force a rewrite
#: of the fact — the orders table keeps its v3 contract (unchanged since
#: v3's codec switch) while custmap moves to v4.
#:
#: r14 (engine-level layout routing, plans/layout_catalog.py): both
#: tables become SUBSTITUTABLE for their covered source relation — the
#: sidecar now records covers/source_columns/covers_paths — and custmap
#: therefore carries ALL customer columns (v5 adds c_nationkey and
#: c_acctbal), so `SELECT <customer columns> FROM custmap` is
#: schema-identical AND row-identical (count parity machine-checked at
#: build) to the raw customer scan. Orders bumps to v4 for the new
#: sidecar fields.
LAYOUT_VERSION = 5
ORDERS_VERSION = 4
CUSTMAP_VERSION = 5

#: Layout-time parquet codec (see LAYOUT_VERSION v3 note).
LAYOUT_CODEC = "zstd"


def _tag(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return re.sub(r"[^A-Za-z0-9]", "_", base).lower()


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )


def _warehouse_path(spark: SparkSession, table: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir")
    return os.path.join(re.sub(r"^file:", "", wh), table.lower())


#: Sidecar file name for layout specs (see plans/fingerprint.py): the
#: DURABLE copy of a layout table's contract (version, bucketing, source
#: fingerprint), written beside the data files so a later session can
#: VERIFY before re-registering or routing — underscore-prefixed, so
#: every parquet reader treats it as hidden.
LAYOUT_SIDECAR = "_dbt_layout_spec.json"

#: Name of the layout the last maybe_star_layout() hit resolved to, or
#: None (observability + tests; the join-side twin of
#: SemanticLayer.last_rollup_used).
last_route_used: str | None = None

#: Fact-size floor for AD-HOC routing: below this on-disk orders size
#: the raw broadcast-probe plan is already scheduler-floor-bound and the
#: bucketed path's fixed costs LOSE (measured: sf0.1 = 2.7 MB, raw j1
#: 0.215 s vs routed 0.336 s; sf10 = 176 MB, raw 1.24 s vs routed
#: 0.98 s and 1.6-1.8x vs 6.4x data-bound at 240M+). Same cost-model
#: discipline as the DIM_BROADCAST_BUDGET gate: route only where the
#: exchange-free plan wins. Tests pin it to 0 to exercise routing at
#: toy scale.
ROUTE_MIN_FACT_BYTES = 32 << 20


def _star_frames(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The BUILD DataFrames of the star layout (only constructed on the
    ensure/build path — routing never needs a plan).

    Both tables are IDENTITY-PLUS-ENRICHMENT over their covered source
    relation (the layout-routing substitution contract,
    plans/layout_catalog.py): every source column rides along unchanged,
    extras are appended, row count is preserved (machine-checked for
    custmap at build — its snowflake hops are inner joins, so a dangling
    FK would drop rows and the build refuses). That makes
    ``SELECT <source columns> FROM layout`` interchangeable with the raw
    scan in ANY plan."""
    t = load_testdata(spark, sf_dir)
    return {
        "orders": _derive_orders(t["orders"]),
        "custmap": _derive_custmap(t["customer"], t["nation"], t["region"]),
    }


def _derive_custmap(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """The custmap derivation, shared by full build and incremental
    refresh (a refresh runs it over the DELTA customer files only)."""
    return (
        customer.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        # ALL customer columns first (the substitution contract), then
        # the flattened snowflake enrichment.
        .select(
            *customer.columns,
            "n_nationkey",
            "n_name",
            "r_name",
        )
    )


def _derive_orders(orders: DataFrame) -> DataFrame:
    """The orders derivation (shared by build and refresh).

    o_cents: the money column pre-cast to EXACT integer cents at layout
    time. o_totalprice is a 2-decimal value, so decimal(18,2)*100 is
    exact, long sums are exact, and sum(o_cents)/100 reproduces the
    decimal-cast sum bit-for-bit — while the per-row decimal cast and
    128-bit decimal accumulation leave the scan hot path (measured at
    sf10: 0.62 s cents-long join+agg vs 0.87 s decimal, and the decimal
    cast alone costs ~0.2 s of the 15M-row scan)."""
    return orders.withColumn(
        "o_cents",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
    )


#: Source tables each star layout table derives from (static knowledge
#: of the star's shape; the fingerprints over them are computed fresh
#: per call).
_STAR_SOURCES: list[list[str]] = [
    ["orders"],
    ["customer", "nation", "region"],
]

#: static spec parts per (appId, sf_dir, n_buckets): table names, bucket
#: cols, schema DDL. Cached because the ad-hoc router runs per QUERY —
#: only the source fingerprint (pure os.stat) must stay fresh per call;
#: plan analysis for the schema DDL must not. The cached entry carries
#: the source fingerprints observed when the schema was derived: if the
#: fresh per-call fingerprints differ, the sources were rewritten and
#: the cached schema DDL may be stale, so the entry is dropped and the
#: schema re-derived from the CURRENT files (otherwise a rebuild via
#: ensure_star_layout could write a sidecar carrying a stale schema
#: string for a table built from fresh frames).
_SPEC_STATIC: dict[
    tuple, tuple[tuple[str, ...], list[tuple[str, str, dict]]]
] = {}


def _star_specs(
    spark: SparkSession, sf_dir: str, n_buckets: int
) -> list[tuple[str, str, dict]]:
    """The layout contract for each star table of ``sf_dir``:
    ``(table, bucket_col, spec)``. The spec embeds a source fingerprint
    (file listing of the tables the layout derives from —
    plans/fingerprint.py, recomputed FRESH on every call so staleness is
    caught per query) so reuse and routing always verify the layout still
    matches the CURRENT source files."""
    import hashlib

    from .fingerprint import files_listing

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        n_buckets,
    )
    listings = [
        files_listing(
            [os.path.join(sf_dir, f"{s}.parquet") for s in srcs]
        )
        for srcs in _STAR_SOURCES
    ]
    fps = tuple(
        hashlib.md5("\n".join(ls).encode()).hexdigest() for ls in listings
    )
    tag = f"{_tag(sf_dir)}_b{n_buckets}"
    cached = _SPEC_STATIC.get(key)
    if cached is None or cached[0] != fps:
        frames = _star_frames(spark, sf_dir)
        t = load_testdata(spark, sf_dir)
        static = [
            (
                f"star_orders_{tag}_v{ORDERS_VERSION}",
                "o_custkey",
                {
                    "version": ORDERS_VERSION,
                    "schema": _schema_ddl(frames["orders"]),
                    "covers": "orders",
                    "source_columns": list(t["orders"].columns),
                },
            ),
            (
                f"star_custmap_{tag}_v{CUSTMAP_VERSION}",
                "c_custkey",
                {
                    "version": CUSTMAP_VERSION,
                    "schema": _schema_ddl(frames["custmap"]),
                    "covers": "customer",
                    "source_columns": list(t["customer"].columns),
                },
            ),
        ]
        _SPEC_STATIC[key] = (fps, static)
    static = _SPEC_STATIC[key][1]
    out = []
    fact_path = os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
    for (tbl, col, meta), fp, listing, srcs in zip(
        static, fps, listings, _STAR_SOURCES
    ):
        out.append(
            (
                tbl,
                col,
                {
                    "table": tbl,
                    "version": meta["version"],
                    "bucket_col": col,
                    "n_buckets": n_buckets,
                    "codec": LAYOUT_CODEC,
                    "schema": meta["schema"],
                    "source_fp": fp,
                    # Engine-level routing contract (layout_catalog.py):
                    # this layout is row- and schema-identical to
                    # `SELECT source_columns FROM <covers relation>`; it
                    # may substitute that relation's scan in ANY plan
                    # while source_paths still fingerprint to source_fp.
                    "covers": meta["covers"],
                    "covers_paths": [
                        os.path.abspath(
                            os.path.join(sf_dir, f"{srcs[0]}.parquet")
                        )
                    ],
                    "source_paths": [
                        os.path.abspath(
                            os.path.join(sf_dir, f"{s}.parquet")
                        )
                        for s in srcs
                    ],
                    "source_columns": meta["source_columns"],
                    # the full path|size|mtime listing behind source_fp:
                    # refresh diffs old vs new to find the appended delta
                    "source_listing": listing,
                    # route only when the GROUP's fact is big enough for
                    # the bucketed plan to win (ROUTE_MIN_FACT_BYTES)
                    "route_gate_paths": [fact_path],
                    "group": f"star_{tag}",
                },
            )
        )
    return out


def _register_bucketed(
    spark: SparkSession, table: str, spec: dict, path: str
) -> None:
    """Re-register persisted bucketed files as an external table. Bucket
    ids ride in the file names, so the exchange-free join is preserved."""
    spark.sql(
        f"CREATE TABLE {table} ({spec['schema']}) USING parquet "
        f"CLUSTERED BY ({spec['bucket_col']}) "
        f"SORTED BY ({spec['bucket_col']}) "
        f"INTO {spec['n_buckets']} BUCKETS LOCATION '{path}'"
    )


def _ensure_bucketed(
    spark: SparkSession,
    table: str,
    build_df: DataFrame,
    bucket_col: str,
    n_buckets: int,
    spec: dict,
) -> bool:
    """Returns True when the table was BUILT this call (callers use this
    to run build-time proofs exactly once), False on verified reuse."""
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    path = _warehouse_path(spark, table)
    if spark.catalog.tableExists(table):
        if read_sidecar(path, LAYOUT_SIDECAR) == spec:
            return False
        # Registered but no longer matching this call's contract (source
        # files changed, or pre-sidecar files): rebuild below.
        spark.sql(f"DROP TABLE {table}")
    elif dir_is_complete(path) and read_sidecar(path, LAYOUT_SIDECAR) == spec:
        # Files survive from a previous session whose in-memory catalog
        # is gone; the sidecar proves they are a COMPLETE write of THIS
        # exact contract (a crashed partial write has no _SUCCESS, a
        # stale or different layout fails the spec compare).
        _register_bucketed(spark, table, spec, path)
        return False
    if callable(build_df):
        # build frames are passed lazily: constructing the derivation
        # plans costs a measurable driver-side slice (~50 ms at sf10,
        # BENCH_J1B_STAGES_r16) that the verified-reuse fast path above
        # must never pay — j1b/w3b/q13b re-verify per query.
        build_df = build_df()
    from .materialize import _save_as_table

    # through the engine's heal+retry CTAS path: a stale or partial
    # leftover dir blocks saveAsTable with LOCATION_ALREADY_EXISTS and is
    # removed by the age-gated orphan heal instead of failing forever
    _save_as_table(
        spark,
        build_df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        table,
    )
    try:
        write_sidecar(path, spec, LAYOUT_SIDECAR)
    except OSError:
        pass  # non-local warehouse: same-session reuse still works
    return True


def ensure_bucketed_table(
    spark: SparkSession,
    table: str,
    build_df: DataFrame,
    bucket_col: str,
    n_buckets: int,
    version: int = LAYOUT_VERSION,
) -> str:
    """Public one-off bucketed layout (probe scripts, ad-hoc layouts):
    same sidecar-verified, _SUCCESS-gated reuse contract as the star
    tables, with the spec derived from the build frame itself."""
    from .fingerprint import data_fingerprint

    spec = {
        "table": table,
        "version": version,
        "bucket_col": bucket_col,
        "n_buckets": n_buckets,
        "codec": LAYOUT_CODEC,
        "schema": _schema_ddl(build_df),
        "source_fp": data_fingerprint(build_df),
    }
    _ensure_bucketed(spark, table, build_df, bucket_col, n_buckets, spec)
    return table


def ensure_star_layout(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> tuple[str, str]:
    """Materialize (once) the bucketed star layout for ``sf_dir`` and
    return the table names ``(orders_bucketed, custmap_bucketed)``.

    ``orders`` keeps its full column set — the layout is a general
    physical organization of the fact table, not a per-query extract —
    bucketed+sorted on ``o_custkey``. The customer dim is stored
    FLATTENED through its nation/region snowflake (broadcast joins at
    build time; dims are tiny relative to the fact) and bucketed on
    ``c_custkey``: snowflake hops are paid once at layout time, never
    per query. Idempotent per (sf_dir, n_buckets); reuse of existing
    tables/files is gated on the sidecar spec (incl. the source-file
    fingerprint) so a layout can never silently serve a rewritten
    source or a crashed partial write.
    """
    frames: dict[str, DataFrame] = {}

    def _frame(key: str) -> DataFrame:
        if not frames:
            frames.update(_star_frames(spark, sf_dir))
        return frames[key]

    names = []
    for (tbl, col, spec), key in zip(
        _star_specs(spark, sf_dir, n_buckets), ("orders", "custmap")
    ):
        built = _ensure_bucketed(
            spark, tbl, lambda k=key: _frame(k), col, n_buckets, spec
        )
        if built and spec["covers"] == "customer":
            _prove_custmap_parity(spark, tbl, sf_dir)
        names.append(tbl)
    # one provisioning pass covers the whole star family: the 25-row
    # nation-grain rollup (j1/w3's routed target) and q13's two-level
    # custdist rollup build beside the bucketed tables — the
    # ensure_lineitem_layout/ensure_q1_rollup precedent. Routing itself
    # still NEVER builds.
    ensure_nation_rollup(spark, sf_dir)
    ensure_custdist_rollup(spark, sf_dir)
    ensure_monthly_rollup(spark, sf_dir)
    return tuple(names)


def _prove_custmap_parity(
    spark: SparkSession, tbl: str, sf_dir: str
) -> None:
    """Row-parity proof for the substitution contract
    (layout_catalog.py): custmap's snowflake hops are INNER joins, so a
    dangling c_nationkey/n_regionkey would drop customer rows and a
    routed ``SELECT ... FROM custmap`` would silently lose them.
    Machine-check count parity (one metadata-cheap count each; builds
    are one-time) and refuse the layout — drop the table and raise —
    rather than ship a lossy substitute. Shared by EVERY path that
    builds custmap from scratch: ensure_star_layout AND
    refresh_star_layout's rebuild fallback (a refresh-triggered rebuild
    sees exactly the same dangling-FK hazard as a first build)."""
    built_n = spark.table(tbl).count()
    src_n = load_testdata(spark, sf_dir)["customer"].count()
    if built_n != src_n:
        spark.sql(f"DROP TABLE {tbl}")
        raise ValueError(
            f"star layout {tbl}: row-parity proof failed "
            f"({built_n} layout rows vs {src_n} customer rows — "
            "dangling FK in the snowflake); layout refused"
        )


def _append_only_delta(
    old: dict | None, new: dict, covered_paths: list[str]
) -> list[str] | None:
    """The appended delta files when ``new``'s sources GREW from
    ``old``'s by files under the COVERED relation only — else None
    (caller falls back to a full rebuild). Append-only means: every old
    listing entry present and unchanged in the new listing (same path,
    size, mtime), and every NEW entry a well-formed file entry under the
    covered relation's path (a grown nation/region in custmap's snowflake
    changes derived rows everywhere — only a grown covered source is
    delta-foldable)."""
    if old is None or old.get("pending"):
        return None
    static_keys = set(new) - {"source_fp", "source_listing"}
    if {k: old.get(k) for k in static_keys} != {
        k: new[k] for k in static_keys
    }:
        return None
    old_listing = old.get("source_listing")
    if not old_listing:
        return None  # pre-listing sidecar: no diff basis
    old_set, new_set = set(old_listing), set(new["source_listing"])
    if not old_set <= new_set:
        return None  # something changed or vanished: rebuild
    covered = [os.path.abspath(p) for p in covered_paths]
    delta: list[str] = []
    for entry in sorted(new_set - old_set):
        path = entry.split("|", 1)[0]
        if "|" not in entry or entry.startswith("missing:"):
            return None  # un-stat-able entry: no safe diff
        if not any(
            path == c or path.startswith(c + os.sep) for c in covered
        ):
            return None  # a non-covered source grew: derived rows shift
        delta.append(path)
    return delta if delta else None


def _read_like_engine(spark: SparkSession, files: list[str]) -> DataFrame:
    """Read specific parquet files with the SAME normalization the
    engine's source reader applies (sources/readers.py): TIMESTAMP_NTZ
    columns cast to TIMESTAMP under the pinned-UTC session, so a delta
    frame appends cleanly to a table built from load_testdata frames."""
    from pyspark.sql import types as T

    df = spark.read.parquet(*files)
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def refresh_star_layout(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> dict[str, str]:
    """Incremental refresh of the bucketed star layout — the layout twin
    of the semantic layer's ``refresh_rollup`` (plans/semantics.py): an
    APPEND-ONLY source change folds only the delta files into the
    existing buckets instead of paying the full rebuild (155.8 s at 240M
    rows, BENCH_SCANFLOOR_r13; the delta append scales with the delta).

    Per table: if the sidecar already matches the current sources the
    table is ``fresh``; if the covered source grew append-only, the
    delta files run through the SAME derivation as a full build and are
    appended as additional per-bucket files (bucket ids are hash-stable
    across jobs, so bucket joins stay exchange-free — verified in
    tests), status ``refreshed``; anything else (rewritten files, grown
    snowflake dims, schema/contract drift, a pending marker from a
    crashed refresh) pays the full ``rebuilt`` path.

    Crash safety: the sidecar is flipped to a PENDING marker before the
    append and finalized after, so routing (which requires exact spec
    match / non-pending) never serves a half-appended table, and a crash
    at any point degrades to a rebuild, never to silent duplicates.

    Operational note: each refresh adds one small file per touched
    bucket; compact periodically (operators/compaction.py) or rebuild on
    a schedule, the same discipline lakehouse OPTIMIZE applies."""
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    statuses: dict[str, str] = {}
    # the reader cache pins the file listing seen at first load; a
    # refresh exists precisely because that listing changed
    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    specs = _star_specs(spark, sf_dir, n_buckets)
    rebuild_frames: dict[str, DataFrame] | None = None
    for (tbl, col, spec), srcs in zip(specs, _STAR_SOURCES):
        path = _warehouse_path(spark, tbl)
        old = read_sidecar(path, LAYOUT_SIDECAR)
        if old == spec:
            # current: just make sure a catalog entry exists (files may
            # survive a previous session whose catalog died)
            if not spark.catalog.tableExists(tbl) and dir_is_complete(path):
                _register_bucketed(spark, tbl, spec, path)
            statuses[tbl] = "fresh"
            continue
        delta = (
            _append_only_delta(old, spec, spec["covers_paths"])
            if dir_is_complete(path)
            else None
        )
        if delta is not None:
            if not spark.catalog.tableExists(tbl):
                _register_bucketed(spark, tbl, old, path)
            src = _read_like_engine(spark, delta)
            if spec["covers"] == "orders":
                delta_df = _derive_orders(src)
            else:
                t = load_testdata(spark, sf_dir)
                delta_df = _derive_custmap(src, t["nation"], t["region"])
                # delta row-parity proof (same contract as the build):
                # a dangling FK in the delta would silently drop rows
                if delta_df.count() != src.count():
                    delta = None
        if delta is not None:
            try:
                write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
                (
                    delta_df.write.bucketBy(n_buckets, col)
                    .sortBy(col)
                    .option("compression", LAYOUT_CODEC)
                    .mode("append")
                    .saveAsTable(tbl)
                )
                write_sidecar(path, spec, LAYOUT_SIDECAR)
            except OSError:
                delta = None  # sidecar unwritable: fall through to rebuild
            else:
                statuses[tbl] = f"refreshed (+{len(delta)} files)"
                continue
        if rebuild_frames is None:
            rebuild_frames = _star_frames(spark, sf_dir)
        build_df = rebuild_frames[
            "orders" if spec["covers"] == "orders" else "custmap"
        ]
        built = _ensure_bucketed(spark, tbl, build_df, col, n_buckets, spec)
        if built and spec["covers"] == "customer":
            # same contract as the first build: a rebuilt custmap with a
            # dangling FK must refuse, not ship a row-lossy substitute
            # with an intact (fully routable) sidecar
            _prove_custmap_parity(spark, tbl, sf_dir)
        statuses[tbl] = "rebuilt"
    # the family's rollups refresh with the same pass (delta-foldable on
    # orders-only growth, else rebuilt)
    rollup_tbl, _ = _nation_rollup_spec(spark, sf_dir)
    statuses[rollup_tbl] = refresh_nation_rollup(spark, sf_dir)
    _, hist_tbl, _ = _custdist_rollup_spec(spark, sf_dir)
    statuses[hist_tbl] = refresh_custdist_rollup(spark, sf_dir)
    monthly_tbl, _ = _monthly_rollup_spec(spark, sf_dir)
    statuses[monthly_tbl] = refresh_monthly_rollup(spark, sf_dir)
    return statuses


def maybe_star_layout(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> tuple[str, str] | None:
    """Layout awareness for AD-HOC star joins — the join-side analogue
    of the semantic layer's aggregate-awareness rollup routing: return
    ``(orders_tbl, custmap_tbl)`` when the engine-owned bucketed layout
    for ``sf_dir`` already exists and verifiably derives from the
    CURRENT source files (re-registering persisted files when only the
    in-memory catalog entry died with a previous session), else None.

    NEVER builds: an ad-hoc query must not pay the one-time layout cost;
    it falls back to its raw-parquet plan silently — the same
    silent-fallback contract as rollup routing's fact fallback. Every
    check is metadata-only (one file listing per source table). Facts
    below ROUTE_MIN_FACT_BYTES stay on the raw plan — at toy scale the
    bucketed path's fixed costs lose to the broadcast probe."""
    global last_route_used
    last_route_used = None
    from ..sources.readers import table_disk_bytes
    from .fingerprint import dir_is_complete, read_sidecar

    try:
        if table_disk_bytes(sf_dir, "orders") < ROUTE_MIN_FACT_BYTES:
            return None
    except OSError:
        return None
    try:
        specs = _star_specs(spark, sf_dir, n_buckets)
    except Exception:
        return None  # source tables unreadable: nothing to route to
    names = []
    for tbl, _col, spec in specs:
        path = _warehouse_path(spark, tbl)
        if read_sidecar(path, LAYOUT_SIDECAR) != spec:
            return None  # absent, stale, or different contract
        if not spark.catalog.tableExists(tbl):
            if not dir_is_complete(path):
                return None
            _register_bucketed(spark, tbl, spec, path)
        names.append(tbl)
    last_route_used = f"star_{_tag(sf_dir)}_b{n_buckets}"
    return tuple(names)


def nation_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 25-row ``(n_nationkey, n_name, r_name)`` frame, for attaching
    names AFTER an int-key aggregation (see LAYOUT_VERSION v4 note: name
    strings never ride the 100 TB fact-join probe — they broadcast-join
    the post-agg frame, which is output-grain-sized by construction)."""
    t = load_testdata(spark, sf_dir)
    return (
        t["nation"]
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "r_name")
    )


#: Lineitem layout version (independent of the star tables).
LINEITEM_VERSION = 1


def _derive_lineitem(li: DataFrame) -> DataFrame:
    """Identity-plus-enrichment over lineitem: the three exact integer
    money columns q1's rollup needs, computed ONCE at layout time via
    decimal casts (exact for 2-decimal inputs by construction — no
    floor-cast recovery, no 2^45 exactness bound on the routed path).
    The r13 decomposition (BENCH_Q1_DECOMP_r13) measured the per-row
    cents recovery + guard as q1's residual above the scan floor
    (shipped 2.3-2.9x vs DuckDB at 60M); storing the cents moves that
    cost to the one-time layout build, the same trade o_cents makes for
    the star fact. A wrapped per-row product at absurd magnitudes would
    go negative and trip the query-time min>=0 proof."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    disc_h = (
        (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)") * 100
    ).cast("long")
    tax_h = ((F.lit(1) + F.col("l_tax")).cast("decimal(8,2)") * 100).cast(
        "long"
    )
    return (
        li.withColumn("l_cents", cents)
        .withColumn("l_disc_i4", F.col("l_cents") * disc_h)
        .withColumn("l_charge_i6", F.col("l_disc_i4") * tax_h)
    )


def _lineitem_spec(spark: SparkSession, sf_dir: str) -> tuple[str, dict]:
    import hashlib

    from .fingerprint import files_listing

    tbl = f"li_cents_{_tag(sf_dir)}_v{LINEITEM_VERSION}"
    t = load_testdata(spark, sf_dir)
    src = os.path.abspath(os.path.join(sf_dir, "lineitem.parquet"))
    listing = files_listing([src])
    return tbl, {
        "table": tbl,
        "version": LINEITEM_VERSION,
        "codec": LAYOUT_CODEC,
        "schema": _schema_ddl(_derive_lineitem(t["lineitem"])),
        "source_fp": hashlib.md5("\n".join(listing).encode()).hexdigest(),
        "source_listing": listing,
        "covers": "lineitem",
        "covers_paths": [src],
        "source_paths": [src],
        "source_columns": list(t["lineitem"].columns),
        "route_gate_paths": [src],
        "group": f"li_{_tag(sf_dir)}",
    }


def ensure_lineitem_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the cents-enriched lineitem layout — same
    engine-owned, sidecar-verified, cross-session-reusable contract as
    the star tables. No bucketing: q1's rollup is a pure scan + 6-group
    aggregate, so the layout's value is the stored exact money columns,
    not co-location; the write preserves input partitioning (no
    shuffle)."""
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    tbl, spec = _lineitem_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    if spark.catalog.tableExists(tbl):
        if read_sidecar(path, LAYOUT_SIDECAR) == spec:
            return tbl
        spark.sql(f"DROP TABLE {tbl}")
    elif dir_is_complete(path) and read_sidecar(path, LAYOUT_SIDECAR) == spec:
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
        return tbl
    from .materialize import _save_as_table

    t = load_testdata(spark, sf_dir)
    _save_as_table(
        spark,
        _derive_lineitem(t["lineitem"])
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        tbl,
    )
    try:
        write_sidecar(path, spec, LAYOUT_SIDECAR)
    except OSError:
        pass
    return tbl


def maybe_lineitem_layout(spark: SparkSession, sf_dir: str) -> str | None:
    """Routing twin of :func:`maybe_star_layout` for the lineitem
    layout: the table name when it exists, is complete, and verifiably
    derives from the CURRENT source files — else None. Never builds;
    facts below ROUTE_MIN_FACT_BYTES stay on the raw plan."""
    from ..sources.readers import table_disk_bytes
    from .fingerprint import dir_is_complete, read_sidecar

    try:
        if table_disk_bytes(sf_dir, "lineitem") < ROUTE_MIN_FACT_BYTES:
            return None
        tbl, spec = _lineitem_spec(spark, sf_dir)
    except Exception:
        return None
    path = _warehouse_path(spark, tbl)
    if read_sidecar(path, LAYOUT_SIDECAR) != spec:
        return None
    if not spark.catalog.tableExists(tbl):
        if not dir_is_complete(path):
            return None
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
    return tbl


def refresh_lineitem_layout(spark: SparkSession, sf_dir: str) -> str:
    """Incremental refresh (append-only delta folded through the same
    derivation, plain parquet append; pending marker on the sidecar
    makes a crash degrade to rebuild). Mirrors refresh_zorder_layout."""
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    tbl, spec = _lineitem_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    old = read_sidecar(path, LAYOUT_SIDECAR)
    if old == spec:
        ensure_lineitem_layout(spark, sf_dir)
        return "fresh"
    delta = (
        _append_only_delta(old, spec, spec["covers_paths"])
        if dir_is_complete(path)
        else None
    )
    if delta is not None:
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                f"CREATE TABLE {tbl} ({old['schema']}) USING parquet "
                f"LOCATION '{path}'"
            )
        try:
            write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
            (
                _derive_lineitem(_read_like_engine(spark, delta))
                .write.option("compression", LAYOUT_CODEC)
                .mode("append")
                .saveAsTable(tbl)
            )
            write_sidecar(path, spec, LAYOUT_SIDECAR)
            return f"refreshed (+{len(delta)} files)"
        except OSError:
            pass
    ensure_lineitem_layout(spark, sf_dir)
    return "rebuilt"


#: q1 grain-rollup version (rides the lineitem layout family).
Q1_ROLLUP_VERSION = 1


def _q1_rollup_frame(li: DataFrame) -> DataFrame:
    """The 6-row partial-aggregate frame at q1's output grain
    (l_returnflag, l_linestatus), from a cents-enriched lineitem frame
    (_derive_lineitem). Every stored column is a RE-FOLDABLE partial —
    sums, count, max-of-greatest, min-of-least — so an append-only
    refresh aggregates only the delta files and merges partials, and
    the read-time overflow proof still holds on folded values (count
    and max fold exactly; count*max <= 2^63 bounds the true sum, so a
    wrapped stored sum is impossible whenever the proof passes)."""
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_cents").alias("s2"),
        F.sum("l_disc_i4").alias("s4"),
        F.sum("l_charge_i6").alias("s6"),
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.greatest("l_cents", "l_disc_i4", "l_charge_i6")
        ).alias("mx"),
        F.min(F.least("l_cents", "l_disc_i4", "l_charge_i6")).alias("mn"),
    )


def _q1_rollup_spec(spark: SparkSession, sf_dir: str) -> tuple[str, dict]:
    import hashlib

    from .fingerprint import files_listing

    tbl = f"q1_rollup_{_tag(sf_dir)}_v{Q1_ROLLUP_VERSION}"
    t = load_testdata(spark, sf_dir)
    src = os.path.abspath(os.path.join(sf_dir, "lineitem.parquet"))
    listing = files_listing([src])
    return tbl, {
        "table": tbl,
        "version": Q1_ROLLUP_VERSION,
        "codec": LAYOUT_CODEC,
        "schema": _schema_ddl(
            _q1_rollup_frame(_derive_lineitem(t["lineitem"].limit(0)))
        ),
        "source_fp": hashlib.md5("\n".join(listing).encode()).hexdigest(),
        "source_listing": listing,
        "covers_paths": [src],
        "source_paths": [src],
        "route_gate_paths": [src],
        "group": f"li_{_tag(sf_dir)}",
    }


def ensure_q1_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the 6-row q1 grain rollup — the ad-hoc twin of
    the semantic layer's aggregate-awareness rollups (plans/semantics.py
    discover_rollups): q1's whole aggregation precomputed as re-foldable
    partials, fingerprint-guarded like every layout, so the routed q1 is
    a 6-row read + guards instead of a 60M-row scan. This is the 'cover
    q1's grain' end state the r13 verdict named; the per-row lineitem
    layout remains for every OTHER query shape over lineitem."""
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    tbl, spec = _q1_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    if spark.catalog.tableExists(tbl):
        if read_sidecar(path, LAYOUT_SIDECAR) == spec:
            return tbl
        spark.sql(f"DROP TABLE {tbl}")
    elif dir_is_complete(path) and read_sidecar(path, LAYOUT_SIDECAR) == spec:
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
        return tbl
    from .materialize import _save_as_table

    t = load_testdata(spark, sf_dir)
    _save_as_table(
        spark,
        _q1_rollup_frame(_derive_lineitem(t["lineitem"]))
        .coalesce(1)
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        tbl,
    )
    try:
        write_sidecar(path, spec, LAYOUT_SIDECAR)
    except OSError:
        pass
    return tbl


def maybe_q1_rollup(spark: SparkSession, sf_dir: str) -> str | None:
    """Routing check for the q1 grain rollup (never builds; silent
    fallback; fact-size gated like every route so the driver's small-SF
    correctness gate always exercises the raw arithmetic)."""
    from ..sources.readers import table_disk_bytes
    from .fingerprint import dir_is_complete, read_sidecar

    try:
        if table_disk_bytes(sf_dir, "lineitem") < ROUTE_MIN_FACT_BYTES:
            return None
        tbl, spec = _q1_rollup_spec(spark, sf_dir)
    except Exception:
        return None
    path = _warehouse_path(spark, tbl)
    if read_sidecar(path, LAYOUT_SIDECAR) != spec:
        return None
    if not spark.catalog.tableExists(tbl):
        if not dir_is_complete(path):
            return None
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
    return tbl


def refresh_q1_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Delta-proportional refresh: aggregate ONLY the appended files and
    merge partials with the stored 6 rows (sum+sum, max/max, min/min,
    count+count — all re-foldable by construction). The merged frame is
    rewritten atomically through the engine's CTAS path (it is 6 rows);
    a crash mid-refresh leaves either the old table + old sidecar or
    triggers the rebuild path — never a half-merged read."""
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    tbl, spec = _q1_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    old = read_sidecar(path, LAYOUT_SIDECAR)
    if old == spec:
        ensure_q1_rollup(spark, sf_dir)
        return "fresh"
    delta = (
        _append_only_delta(old, spec, spec["covers_paths"])
        if dir_is_complete(path)
        else None
    )
    if delta is not None:
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                f"CREATE TABLE {tbl} ({old['schema']}) USING parquet "
                f"LOCATION '{path}'"
            )
        delta_partials = _q1_rollup_frame(
            _derive_lineitem(_read_like_engine(spark, delta))
        )
        merged = (
            spark.table(tbl)
            .unionByName(delta_partials)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("sum_qty").alias("sum_qty"),
                F.sum("s2").alias("s2"),
                F.sum("s4").alias("s4"),
                F.sum("s6").alias("s6"),
                F.sum("n").alias("n"),
                F.max("mx").alias("mx"),
                F.min("mn").alias("mn"),
            )
            .collect()  # 6 rows: sever the plan from the table we rewrite
        )
        from .materialize import _save_as_table

        try:
            schema = spark.table(tbl).schema
            write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
            spark.sql(f"DROP TABLE {tbl}")
            _save_as_table(
                spark,
                spark.createDataFrame(merged, schema)
                .coalesce(1)
                .write.option("compression", LAYOUT_CODEC)
                .mode("overwrite"),
                tbl,
            )
            write_sidecar(path, spec, LAYOUT_SIDECAR)
            return f"refreshed (+{len(delta)} files)"
        except OSError:
            pass
    ensure_q1_rollup(spark, sf_dir)
    return "rebuilt"


#: Nation-grain star rollup version (rides the star layout family).
NATION_ROLLUP_VERSION = 1


def _nation_rollup_frame(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The 25-row partial-aggregate frame at the j1/w3 output grain
    (c_nationkey) over orders⋈customer — the star-join twin of
    ``_q1_rollup_frame`` (round 15: the fact-join family j1 6.9x / w3
    4.8x at sf10 was the last >2x count-series class; its queries
    aggregate 15M+ fact rows to 25 nations every run). Every stored
    column is a RE-FOLDABLE partial — count, exact-cents long sum,
    max, min — so an orders-append refresh aggregates only the delta
    files and merges partials, and ``guarded_cents_spend``'s count*max
    overflow proof still holds on folded values (count and max fold
    exactly). Nation/region NAMES are never stored: they attach live at
    read time (25-row broadcast), so a dim edit can't stale the rollup."""
    cust_nk = customer.select("c_custkey", "c_nationkey")
    return (
        _derive_orders(orders)
        .join(F.broadcast(cust_nk), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_cents").alias("cents"),
            F.max("o_cents").alias("mx"),
            F.min("o_cents").alias("mn"),
        )
    )


#: schema DDL per (appId, sf_dir), guarded by the source-listing
#: fingerprint it was derived under — the _SPEC_STATIC pattern: deriving
#: the rollup schema analyzes a join+agg plan (a ~100 ms driver RPC,
#: BENCH_J1B_STAGES_r16) and j1b/w3b/q13b re-verify the family per
#: query, so the analysis must not be paid on the verified-reuse path.
#: A changed listing (source rewrite) drops the entry and re-derives
#: from the CURRENT files.
_NATION_SCHEMA_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


def _nation_rollup_spec(spark: SparkSession, sf_dir: str) -> tuple[str, dict]:
    import hashlib

    from .fingerprint import files_listing

    tbl = f"star_rollup_{_tag(sf_dir)}_v{NATION_ROLLUP_VERSION}"
    srcs = [
        os.path.abspath(os.path.join(sf_dir, f"{s}.parquet"))
        for s in ("orders", "customer")
    ]
    listing = files_listing(srcs)
    fp = hashlib.md5("\n".join(listing).encode()).hexdigest()
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _NATION_SCHEMA_CACHE.get(key)
    if cached is None or cached[0] != fp:
        t = load_testdata(spark, sf_dir)
        cached = (
            fp,
            _schema_ddl(
                _nation_rollup_frame(
                    t["orders"].limit(0), t["customer"].limit(0)
                )
            ),
        )
        _NATION_SCHEMA_CACHE[key] = cached
    return tbl, {
        "table": tbl,
        "version": NATION_ROLLUP_VERSION,
        "codec": LAYOUT_CODEC,
        "schema": cached[1],
        "source_fp": hashlib.md5("\n".join(listing).encode()).hexdigest(),
        "source_listing": listing,
        # only ORDERS growth is delta-foldable (a customer change moves
        # rows between nations: rebuild)
        "covers_paths": [srcs[0]],
        "source_paths": srcs,
        "route_gate_paths": [srcs[0]],
        "group": f"star_{_tag(sf_dir)}",
    }


def ensure_nation_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the 25-row nation-grain star rollup — built by
    the same warmup that provisions the star layout (ensure_star_layout
    calls this), so one provisioning pass covers the whole family. The
    routed j1/w3 become a 25-row read + live name attach instead of a
    15M-row fact join; the bucketed layout remains for every OTHER
    query shape over the star."""
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    tbl, spec = _nation_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    if spark.catalog.tableExists(tbl):
        if read_sidecar(path, LAYOUT_SIDECAR) == spec:
            return tbl
        spark.sql(f"DROP TABLE {tbl}")
    elif dir_is_complete(path) and read_sidecar(path, LAYOUT_SIDECAR) == spec:
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
        return tbl
    from .materialize import _save_as_table

    t = load_testdata(spark, sf_dir)
    _save_as_table(
        spark,
        _nation_rollup_frame(t["orders"], t["customer"])
        .coalesce(1)
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        tbl,
    )
    try:
        write_sidecar(path, spec, LAYOUT_SIDECAR)
    except OSError:
        pass
    return tbl


def maybe_nation_rollup(spark: SparkSession, sf_dir: str) -> str | None:
    """Routing check for the nation-grain rollup (never builds; silent
    fallback; fact-size gated so the driver's small-SF correctness gate
    always exercises the raw join arithmetic)."""
    global last_route_used
    from ..sources.readers import table_disk_bytes
    from .fingerprint import dir_is_complete, read_sidecar

    try:
        if table_disk_bytes(sf_dir, "orders") < ROUTE_MIN_FACT_BYTES:
            return None
        tbl, spec = _nation_rollup_spec(spark, sf_dir)
    except Exception:
        return None
    path = _warehouse_path(spark, tbl)
    if read_sidecar(path, LAYOUT_SIDECAR) != spec:
        return None
    if not spark.catalog.tableExists(tbl):
        if not dir_is_complete(path):
            return None
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
    last_route_used = tbl
    return tbl


def refresh_nation_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Delta-proportional refresh: aggregate ONLY appended orders files
    (joined to the UNCHANGED customer map — _append_only_delta refuses
    when any non-covered source moved) and merge partials with the
    stored 25 rows. Crash-safe via the pending marker + atomic CTAS,
    same as refresh_q1_rollup."""
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    tbl, spec = _nation_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    old = read_sidecar(path, LAYOUT_SIDECAR)
    if old == spec:
        ensure_nation_rollup(spark, sf_dir)
        return "fresh"
    delta = (
        _append_only_delta(old, spec, spec["covers_paths"])
        if dir_is_complete(path)
        else None
    )
    if delta is not None:
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                f"CREATE TABLE {tbl} ({old['schema']}) USING parquet "
                f"LOCATION '{path}'"
            )
        t = load_testdata(spark, sf_dir)
        delta_partials = _nation_rollup_frame(
            _read_like_engine(spark, delta), t["customer"]
        )
        merged = (
            spark.table(tbl)
            .unionByName(delta_partials)
            .groupBy("c_nationkey")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("cents").alias("cents"),
                F.max("mx").alias("mx"),
                F.min("mn").alias("mn"),
            )
            .collect()  # 25 rows: sever the plan from the table we rewrite
        )
        from .materialize import _save_as_table

        try:
            schema = spark.table(tbl).schema
            write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
            spark.sql(f"DROP TABLE {tbl}")
            _save_as_table(
                spark,
                spark.createDataFrame(merged, schema)
                .coalesce(1)
                .write.option("compression", LAYOUT_CODEC)
                .mode("overwrite"),
                tbl,
            )
            write_sidecar(path, spec, LAYOUT_SIDECAR)
            return f"refreshed (+{len(delta)} files)"
        except OSError:
            pass
    ensure_nation_rollup(spark, sf_dir)
    return "rebuilt"


#: Customer-distribution rollup version (rides the star family).
CUSTDIST_ROLLUP_VERSION = 1


class RollupParityRefused(ValueError):
    """A rollup build/refresh found source rows that violate the parity
    assumptions of the routed shape (e.g. orders custkeys dangling
    outside customer). Unlike custmap's dangling-FK case — where the
    SOURCE data is broken and every inner-join consumer is lossy — this
    data is legal for the raw query, so the build drops the pair and
    reports refusal instead of crashing provisioning; routing falls
    back to the (correct) raw plan."""


def _percust_frame(orders: DataFrame) -> DataFrame:
    """q13's foldable BASE: one row per ordering customer with their
    order count (sum-foldable across appends)."""
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def _custdist_from_base(base: DataFrame, n_customers: int) -> DataFrame:
    """The ~40-row q13 histogram from the per-customer base: counts >0
    from the base, the zero bucket from ``n_customers`` minus base rows.
    NOT partial-foldable itself (an append moves customers between
    buckets) — always derived from the base, which IS foldable."""
    hist = base.groupBy(F.col("n_orders").alias("c_count")).agg(
        F.count(F.lit(1)).alias("custdist")
    )
    zero = base.sparkSession.createDataFrame(
        [(0, n_customers)], "c_count long, custdist long"
    ).join(
        base.agg(F.count(F.lit(1)).alias("__nz")), how="cross"
    ).select(
        "c_count", (F.col("custdist") - F.col("__nz")).alias("custdist")
    )
    # drop an empty zero bucket: the oracle's GROUP BY never emits a
    # c_count with no customers
    return hist.unionByName(zero).filter(F.col("custdist") > 0)


def _custdist_rollup_spec(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, dict]:
    """(base_table, hist_table, spec). One spec governs both tables —
    they are built and refreshed together from the same source state."""
    import hashlib

    from .fingerprint import files_listing

    tag = _tag(sf_dir)
    base_tbl = f"percust_rollup_{tag}_v{CUSTDIST_ROLLUP_VERSION}"
    hist_tbl = f"custdist_rollup_{tag}_v{CUSTDIST_ROLLUP_VERSION}"
    srcs = [
        os.path.abspath(os.path.join(sf_dir, f"{s}.parquet"))
        for s in ("orders", "customer")
    ]
    listing = files_listing(srcs)
    return base_tbl, hist_tbl, {
        "table": hist_tbl,
        "base_table": base_tbl,
        "version": CUSTDIST_ROLLUP_VERSION,
        "codec": LAYOUT_CODEC,
        "schema": "c_count BIGINT, custdist BIGINT",
        "base_schema": "custkey BIGINT, n_orders BIGINT",
        "source_fp": hashlib.md5("\n".join(listing).encode()).hexdigest(),
        "source_listing": listing,
        # only ORDERS growth folds (the zero bucket's customer total is
        # invariant while the customer fingerprint holds)
        "covers_paths": [srcs[0]],
        "source_paths": srcs,
        "route_gate_paths": [srcs[0]],
        "group": f"star_{tag}",
    }


def _write_custdist_pair(
    spark: SparkSession,
    base_tbl: str,
    hist_tbl: str,
    spec: dict,
    base_df: DataFrame,
    n_customers: int | None,
    customer: DataFrame,
) -> None:
    """Write base + derived histogram atomically enough for the routing
    contract: the sidecar (on the HIST table, the routed one) is written
    LAST, so a crash mid-pair leaves no matching sidecar and the router
    refuses. ``n_customers`` None → recovered from the old histogram's
    invariant total (refresh path, customer fingerprint unchanged).

    Parity proof (the _prove_custmap_parity precedent): the base counts
    ALL orders per o_custkey, but raw q13 and the oracle attach counts
    via a customer LEFT JOIN — an orders row whose o_custkey is absent
    from customer (dangling FK; the append guard only proves customer
    UNCHANGED, not that delta orders reference it) would make the
    routed histogram count phantom custkeys and corrupt the zero
    bucket. Machine-check base-keys ⊆ customer-keys with one anti-join
    (customer-cardinality; builds/refreshes are one-time) and refuse
    the pair rather than ship a silently-divergent substitute."""
    from .fingerprint import write_sidecar
    from .materialize import _save_as_table

    if n_customers is None:
        n_customers = (
            spark.table(hist_tbl).agg(F.sum("custdist")).collect()[0][0]
        )
    # stage the base first: the refresh merge plan READS the old base
    # table, so severing goes through a staging table (customer-
    # cardinality stays executor-side — never a driver collect)
    stg = f"{base_tbl}_stg"
    if spark.catalog.tableExists(stg):
        spark.sql(f"DROP TABLE {stg}")
    _save_as_table(
        spark,
        base_df.write.option("compression", LAYOUT_CODEC).mode("overwrite"),
        stg,
    )
    for t in (base_tbl, hist_tbl):
        if spark.catalog.tableExists(t):
            spark.sql(f"DROP TABLE {t}")
    _save_as_table(
        spark,
        spark.table(stg)
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        base_tbl,
    )
    spark.sql(f"DROP TABLE {stg}")
    dangling = (
        spark.table(base_tbl)
        .join(
            customer.select(F.col("c_custkey").alias("custkey")),
            "custkey",
            "left_anti",
        )
        .count()
    )
    if dangling:
        for t in (base_tbl, hist_tbl):
            if spark.catalog.tableExists(t):
                spark.sql(f"DROP TABLE {t}")
        raise RollupParityRefused(
            f"custdist rollup {hist_tbl}: parity proof failed "
            f"({dangling} base custkeys dangle outside customer — "
            "orders references unknown customers); rollup refused"
        )
    _save_as_table(
        spark,
        _custdist_from_base(spark.table(base_tbl), int(n_customers))
        .coalesce(1)
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        hist_tbl,
    )
    try:
        write_sidecar(
            _warehouse_path(spark, hist_tbl), spec, LAYOUT_SIDECAR
        )
    except OSError:
        pass


def ensure_custdist_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) q13's two-level rollup: the foldable
    per-customer count base + the ~40-row derived histogram (zero bucket
    included). Routed q13 is a 40-row read + sort instead of a 15M-row
    fact join. Built by ensure_star_layout's provisioning pass."""
    from .fingerprint import dir_is_complete, read_sidecar

    base_tbl, hist_tbl, spec = _custdist_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, hist_tbl)
    if (
        spark.catalog.tableExists(hist_tbl)
        and spark.catalog.tableExists(base_tbl)
        and read_sidecar(path, LAYOUT_SIDECAR) == spec
    ):
        return hist_tbl
    if (
        not spark.catalog.tableExists(hist_tbl)
        and dir_is_complete(path)
        and read_sidecar(path, LAYOUT_SIDECAR) == spec
        and dir_is_complete(_warehouse_path(spark, base_tbl))
    ):
        spark.sql(
            f"CREATE TABLE {hist_tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
        spark.sql(
            f"CREATE TABLE {base_tbl} ({spec['base_schema']}) USING "
            f"parquet LOCATION '{_warehouse_path(spark, base_tbl)}'"
        )
        return hist_tbl
    t = load_testdata(spark, sf_dir)
    try:
        _write_custdist_pair(
            spark,
            base_tbl,
            hist_tbl,
            spec,
            _percust_frame(t["orders"]),
            t["customer"].count(),
            t["customer"],
        )
    except RollupParityRefused as e:
        return f"refused ({e})"
    return hist_tbl


def maybe_custdist_rollup(spark: SparkSession, sf_dir: str) -> str | None:
    """Routing check for q13's histogram rollup (never builds; silent
    fallback; fact-size gated)."""
    global last_route_used
    from ..sources.readers import table_disk_bytes
    from .fingerprint import dir_is_complete, read_sidecar

    try:
        if table_disk_bytes(sf_dir, "orders") < ROUTE_MIN_FACT_BYTES:
            return None
        base_tbl, hist_tbl, spec = _custdist_rollup_spec(spark, sf_dir)
    except Exception:
        return None
    path = _warehouse_path(spark, hist_tbl)
    if read_sidecar(path, LAYOUT_SIDECAR) != spec:
        return None
    if not spark.catalog.tableExists(hist_tbl):
        if not dir_is_complete(path):
            return None
        spark.sql(
            f"CREATE TABLE {hist_tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
    last_route_used = hist_tbl
    return hist_tbl


def refresh_custdist_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Orders-append refresh: fold the delta's per-customer counts into
    the base (sum merge, customer-cardinality work), re-derive the
    histogram — zero bucket from the stored invariant total (customer
    fingerprint unchanged by the delta guard). Anything else rebuilds."""
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    base_tbl, hist_tbl, spec = _custdist_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, hist_tbl)
    old = read_sidecar(path, LAYOUT_SIDECAR)
    if old == spec:
        ensure_custdist_rollup(spark, sf_dir)
        return "fresh"
    delta = (
        _append_only_delta(old, spec, spec["covers_paths"])
        if dir_is_complete(path)
        and dir_is_complete(_warehouse_path(spark, base_tbl))
        else None
    )
    if delta is not None and spark.catalog.tableExists(base_tbl):
        merged_base = (
            spark.table(base_tbl)
            .unionByName(_percust_frame(_read_like_engine(spark, delta)))
            .groupBy("custkey")
            .agg(F.sum("n_orders").alias("n_orders"))
        )
        try:
            write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
            _write_custdist_pair(
                spark,
                base_tbl,
                hist_tbl,
                spec,
                merged_base,
                None,
                load_testdata(spark, sf_dir)["customer"],
            )
            return f"refreshed (+{len(delta)} files)"
        except RollupParityRefused as e:
            return f"refused ({e})"
        except OSError:
            pass
    status = ensure_custdist_rollup(spark, sf_dir)
    return status if status.startswith("refused") else "rebuilt"


#: Monthly-grain orders rollup version (rides the star layout family).
MONTHLY_ROLLUP_VERSION = 1

#: Literal schema (the custdist precedent: no per-call plan analysis —
#: the r15 j1b regression's root cause). Pinned equal to
#: _schema_ddl(_monthly_rollup_frame(...)) by test_layout_routing.
_MONTHLY_SCHEMA = (
    "month_start date, cnt bigint, cents bigint, mx bigint, mn bigint"
)


def _monthly_rollup_frame(orders: DataFrame) -> DataFrame:
    """The ~80-row partial-aggregate frame at g1's monthly grain
    (date_trunc('month', o_orderdate)) — the single-source twin of
    ``_q1_rollup_frame`` (round 16: g1's remaining exec cost is the 15M-
    row monthly aggregate, 0.79 s at sf10 vs a sub-0.1 s ~80-row read).
    Every stored column is a RE-FOLDABLE partial — count, exact-cents
    long sum, max, min — so an orders-append refresh aggregates only the
    delta files and merges partials, and ``guarded_cents_spend``'s
    count*max overflow proof holds on folded values (count and max fold
    exactly). A NULL o_orderdate forms a NULL month row: it folds like
    any group and the routed g1 drops it exactly as the raw plan does
    (sequence(NULL, ..) explodes to zero rows)."""
    from ..functions.pg import date_trunc_pg

    return (
        _derive_orders(orders)
        .groupBy(date_trunc_pg("month", "o_orderdate").alias("month_start"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_cents").alias("cents"),
            F.max("o_cents").alias("mx"),
            F.min("o_cents").alias("mn"),
        )
    )


def _monthly_rollup_spec(spark: SparkSession, sf_dir: str) -> tuple[str, dict]:
    import hashlib

    from .fingerprint import files_listing

    tag = _tag(sf_dir)
    tbl = f"monthly_rollup_{tag}_v{MONTHLY_ROLLUP_VERSION}"
    src = os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
    listing = files_listing([src])
    return tbl, {
        "table": tbl,
        "version": MONTHLY_ROLLUP_VERSION,
        "codec": LAYOUT_CODEC,
        "schema": _MONTHLY_SCHEMA,
        "source_fp": hashlib.md5("\n".join(listing).encode()).hexdigest(),
        "source_listing": listing,
        "covers_paths": [src],
        "source_paths": [src],
        "route_gate_paths": [src],
        "group": f"star_{tag}",
    }


def ensure_monthly_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the monthly-grain orders rollup — built by the
    same provisioning pass as the rest of the star family
    (ensure_star_layout calls this). The routed g1 becomes an ~80-row
    read + spine gap-fill instead of a 15M-row scan+aggregate; single
    source (orders only), so it is the simplest instance of the
    q1/nation/custdist pattern."""
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    tbl, spec = _monthly_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    if spark.catalog.tableExists(tbl):
        if read_sidecar(path, LAYOUT_SIDECAR) == spec:
            return tbl
        spark.sql(f"DROP TABLE {tbl}")
    elif dir_is_complete(path) and read_sidecar(path, LAYOUT_SIDECAR) == spec:
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
        return tbl
    from .materialize import _save_as_table

    t = load_testdata(spark, sf_dir)
    _save_as_table(
        spark,
        _monthly_rollup_frame(t["orders"])
        .coalesce(1)
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        tbl,
    )
    try:
        write_sidecar(path, spec, LAYOUT_SIDECAR)
    except OSError:
        pass
    return tbl


def maybe_monthly_rollup(spark: SparkSession, sf_dir: str) -> str | None:
    """Routing check for the monthly rollup (never builds; silent
    fallback; fact-size gated so the driver's small-SF correctness gate
    always exercises the raw scan+aggregate arithmetic)."""
    global last_route_used
    from ..sources.readers import table_disk_bytes
    from .fingerprint import dir_is_complete, read_sidecar

    try:
        if table_disk_bytes(sf_dir, "orders") < ROUTE_MIN_FACT_BYTES:
            return None
        tbl, spec = _monthly_rollup_spec(spark, sf_dir)
    except Exception:
        return None
    path = _warehouse_path(spark, tbl)
    if read_sidecar(path, LAYOUT_SIDECAR) != spec:
        return None
    if not spark.catalog.tableExists(tbl):
        if not dir_is_complete(path):
            return None
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
    last_route_used = tbl
    return tbl


def refresh_monthly_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Delta-proportional refresh: aggregate ONLY appended orders files
    and merge partials with the stored ~80 rows (sum+sum, count+count,
    max/max, min/min — all re-foldable by construction). Crash-safe via
    the pending marker + atomic CTAS, same as refresh_q1_rollup."""
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    tbl, spec = _monthly_rollup_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    old = read_sidecar(path, LAYOUT_SIDECAR)
    if old == spec:
        ensure_monthly_rollup(spark, sf_dir)
        return "fresh"
    delta = (
        _append_only_delta(old, spec, spec["covers_paths"])
        if dir_is_complete(path)
        else None
    )
    if delta is not None:
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                f"CREATE TABLE {tbl} ({old['schema']}) USING parquet "
                f"LOCATION '{path}'"
            )
        delta_partials = _monthly_rollup_frame(
            _read_like_engine(spark, delta)
        )
        merged = (
            spark.table(tbl)
            .unionByName(delta_partials)
            .groupBy("month_start")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("cents").alias("cents"),
                F.max("mx").alias("mx"),
                F.min("mn").alias("mn"),
            )
            .collect()  # ~80 rows: sever the plan from the table we rewrite
        )
        from .materialize import _save_as_table

        try:
            schema = spark.table(tbl).schema
            write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
            spark.sql(f"DROP TABLE {tbl}")
            _save_as_table(
                spark,
                spark.createDataFrame(merged, schema)
                .coalesce(1)
                .write.option("compression", LAYOUT_CODEC)
                .mode("overwrite"),
                tbl,
            )
            write_sidecar(path, spec, LAYOUT_SIDECAR)
            return f"refreshed (+{len(delta)} files)"
        except OSError:
            pass
    ensure_monthly_rollup(spark, sf_dir)
    return "rebuilt"


#: Z-order layout version (independent of the star tables). v2 added
#: the source_listing field (incremental refresh's diff basis).
ZORDER_VERSION = 2


def _zorder_spec(spark: SparkSession, sf_dir: str) -> tuple[str, dict]:
    import hashlib

    from .fingerprint import files_listing

    tbl = f"zord_orders_{_tag(sf_dir)}_v{ZORDER_VERSION}"
    t = load_testdata(spark, sf_dir)
    listing = files_listing([os.path.join(sf_dir, "orders.parquet")])
    return tbl, {
        "table": tbl,
        "version": ZORDER_VERSION,
        "zorder_cols": ["o_custkey", "o_orderdate"],
        "codec": LAYOUT_CODEC,
        "schema": _schema_ddl(t["orders"]),
        "source_fp": hashlib.md5("\n".join(listing).encode()).hexdigest(),
        "source_listing": listing,
        "covers_paths": [
            os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
        ],
        "source_paths": [
            os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
        ],
    }


def refresh_zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    """Incremental refresh of the Z-ordered orders table: an append-only
    source change Z-orders ONLY the delta files and appends them (plain
    parquet append — no bucketing contract to respect). Each delta batch
    is Morton-clustered within itself, so its row groups still carry
    tight min/max stats and box predicates prune them; GLOBAL clustering
    degrades gracefully as deltas accumulate — compact or rebuild on a
    schedule, the lakehouse OPTIMIZE discipline. Any non-append change
    (or a pending marker from a crashed refresh) pays the full rebuild
    via ensure_zorder_layout. Returns the status string
    (fresh/refreshed/rebuilt)."""
    from ..operators.zorder import zorder_dataframe
    from ..sources import readers
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    readers._CACHE.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_dir)), None
    )
    tbl, spec = _zorder_spec(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    old = read_sidecar(path, LAYOUT_SIDECAR)
    if old == spec:
        ensure_zorder_layout(spark, sf_dir)  # re-register if needed
        return "fresh"
    delta = (
        _append_only_delta(old, spec, spec["covers_paths"])
        if dir_is_complete(path)
        else None
    )
    if delta is not None:
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                f"CREATE TABLE {tbl} ({old['schema']}) USING parquet "
                f"LOCATION '{path}'"
            )
        try:
            write_sidecar(path, {**old, "pending": True}, LAYOUT_SIDECAR)
            (
                zorder_dataframe(
                    _read_like_engine(spark, delta),
                    spec["zorder_cols"],
                )
                .write.option("compression", LAYOUT_CODEC)
                .mode("append")
                .saveAsTable(tbl)
            )
            write_sidecar(path, spec, LAYOUT_SIDECAR)
            return f"refreshed (+{len(delta)} files)"
        except OSError:
            pass  # sidecar unwritable: fall through to rebuild
    ensure_zorder_layout(spark, sf_dir)
    return "rebuilt"


def ensure_zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the Z-ordered orders table for ``sf_dir`` and
    return its name: orders clustered along the Morton curve of
    ``(o_custkey, o_orderdate)`` (operators/zorder.py) so box predicates
    on either or both columns prune at row-group granularity. Same
    engine-owned, cross-session-reusable contract as the bucketed star
    layout above: reuse is gated on the _SUCCESS marker plus a sidecar
    spec carrying the source-file fingerprint, so a rewritten source or
    a crashed partial write forces a rebuild instead of silently serving
    stale/incomplete rows."""
    from ..operators.zorder import zorder_dataframe
    from .fingerprint import dir_is_complete, read_sidecar, write_sidecar

    tbl, spec = _zorder_spec(spark, sf_dir)
    t = load_testdata(spark, sf_dir)
    path = _warehouse_path(spark, tbl)
    if spark.catalog.tableExists(tbl):
        if read_sidecar(path, LAYOUT_SIDECAR) == spec:
            return tbl
        spark.sql(f"DROP TABLE {tbl}")
    elif dir_is_complete(path) and read_sidecar(path, LAYOUT_SIDECAR) == spec:
        spark.sql(
            f"CREATE TABLE {tbl} ({spec['schema']}) USING parquet "
            f"LOCATION '{path}'"
        )
        return tbl
    from .materialize import _save_as_table

    _save_as_table(
        spark,
        zorder_dataframe(t["orders"], ["o_custkey", "o_orderdate"])
        .write.option("compression", LAYOUT_CODEC)
        .mode("overwrite"),
        tbl,
    )
    try:
        write_sidecar(path, spec, LAYOUT_SIDECAR)
    except OSError:
        pass
    return tbl


#: Largest value a LongType sum can hold before wrapping (non-ANSI Spark
#: wraps silently past 2^63 - 1).
LONG_MAX = (1 << 63) - 1


def guarded_cents_spend(n, cents, mx, mn):
    """Exact dollar spend from a LONG cents sum, provably overflow-safe.

    The layout path sums ``o_cents`` as LongType because 128-bit decimal
    accumulation is the measured scan-floor term (sf10, min-of-5
    interleaved: long sum 0.818 s, decimal-before-sum 0.965 s = +18%,
    this guard 0.842 s = +3%). Non-ANSI Spark wraps a long sum silently
    past 2^63; at the 100 TB north star a hot group sits within ~10x of
    that. The guard is a conservative proof, not a heuristic: a group's
    sum of NON-NEGATIVE cents is <= count * max, both of which the
    aggregate already (nearly) computes, so ``count * max <= LONG_MAX``
    (checked in decimal — that product cannot itself wrap) implies the
    long sum did not overflow. The non-negativity precondition is
    machine-checked, not assumed: ``mn`` (the group's MIN(cents)) must be
    >= 0, because with negative values (refunds/credits) the long sum can
    wrap negatively while count*max stays under the bound. Past either
    bound it raises loudly instead of returning a wrapped number; the
    remedy at that scale is decimal accumulation or a two-level (salted)
    rollup.

    ``n``/``cents``/``mx``/``mn`` are the group's COUNT(*), SUM(cents),
    MAX(cents) and MIN(cents) columns.
    """
    return (
        F.when(
            mn < 0,
            F.raise_error(
                F.lit(
                    "guarded_cents_spend requires non-negative cents "
                    "(min < 0 observed): the count*max overflow proof is "
                    "unsound for signed values; re-aggregate with decimal "
                    "accumulation"
                )
            ).cast("double"),
        )
        .when(
            n.cast("decimal(38,0)") * mx
            > F.lit(LONG_MAX).cast("decimal(38,0)"),
            F.raise_error(
                F.lit(
                    "o_cents long sum may have overflowed (count*max exceeds "
                    "2^63); re-aggregate with decimal accumulation"
                )
            ).cast("double"),
        )
        .otherwise((cents.cast("decimal(38,0)") / F.lit(100)).cast("double"))
    )
